"""Checkpointing: full + incremental saves with reshard-on-restore.

TPU-native equivalent of the reference's EV checkpoint stack (SURVEY.md §3.4):

  * Full save (SaveV3, save_restore_v2_ops.cc:274): per physical table the
    live keys/values/freqs/versions (+ per-optimizer-slot values) are dumped
    sorted by a 1000-way logical partition of the key hash, with a
    partition-offset index — exactly the reference's ``kSavedPartitionNum``
    trick (kv_interface.h:26, embedding_var_ckpt_data.cc:103) that makes
    restoring onto a *different* shard count a cheap file-slice operation:
    new shard ``s`` of ``S`` loads every saved sub-partition ``p`` with
    ``p % S == s`` (embedding_var_restore.cc:337-339).
  * Shrink-on-save: TTL / L2 eviction policies applied at save time
    (DumpEv, save_restore_v2_ops.cc:296-310).
  * Incremental save (IncrSave, incr_save_restore_ops.cc): tables created
    with ``record_touched`` accumulate a touched-key mask per interval; the
    delta dump carries only touched rows; restore = full + deltas in order
    (KvResourceIncrImport).  Serving consumes the same deltas for sub-minute
    online updates.

Storage is plain ``.npz`` + JSON in a checkpoint directory — no external
services; artifacts are host-memory-bounded per table shard.
"""

from __future__ import annotations

import concurrent.futures as cf
import functools
import glob as _glob
import json
import os
import re
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deeprec_tpu.embedding import table as ev
from deeprec_tpu.ops import hashing

SAVED_PARTITIONS = 1000


# ---------------------------------------------------------------------------
# pytree <-> npz


def _flatten_params(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten_params(template, flat: Dict[str, np.ndarray]):
    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in leaves_with_path:
        key = "/".join(str(p) for p in path)
        arr = flat[key]
        leaves.append(jnp.asarray(arr, getattr(leaf, "dtype", None)))
    return jax.tree_util.tree_unflatten(treedef, leaves)


# ---------------------------------------------------------------------------
# table export / import


def _cbf_sum(sketches) -> np.ndarray:
    """Merge per-shard counting-Bloom sketches: keys route to one owner
    shard, so the element-wise sum is the global count sketch; accumulate
    in int64 and SATURATE at the counter dtype's ceiling instead of
    wrapping (the reference's filtered-feature persistence,
    kv_interface.h:26 -keys_filtered/-freqs_filtered)."""

    sketches = list(sketches)
    dt = sketches[0].dtype
    acc = np.zeros(sketches[0].shape, np.int64)
    for c in sketches:
        acc += np.asarray(c, np.int64)
    return np.minimum(acc, np.iinfo(dt).max).astype(dt)


def _partition_of(keys: np.ndarray) -> np.ndarray:
    # Must match parallel.sharded.shard_of (runtime routing is partition % S).
    return np.asarray(jax.device_get(
        hashing.logical_partition(jnp.asarray(keys)))).astype(np.int32)


def _export_table_host(table: ev.EmbeddingTable, *, shrink_step=None) -> Dict:
    """One table (or one shard) -> host dict of live rows sorted by logical
    partition, with partition offsets."""

    if shrink_step is not None:
        table = ev.shrink(table, shrink_step)
    keys, values, freqs, versions, live = (
        np.asarray(jax.device_get(x)) if x is not None else None
        for x in ev.export_live(table)
    )
    live = live.astype(bool)
    keys = keys[live]
    out = {"keys": keys, "values": values[live]}
    if freqs is not None:
        out["freqs"] = freqs[live]
    if versions is not None:
        out["versions"] = versions[live]
    for sname, sval in table.slots.items():
        out[f"slot_{sname}"] = np.asarray(jax.device_get(sval))[live]
    return out


def _partition_order(keys: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(order, offsets) of the stable 1000-way partition sort — the ONE
    place the export layout math lives (round-5 review: previously
    duplicated between _merge_and_partition and save_table, where a
    divergence would silently break restore-onto-different-shard-count
    for one path only)."""

    part = _partition_of(keys)
    order = np.argsort(part, kind="stable")
    offsets = np.searchsorted(
        part[order], np.arange(SAVED_PARTITIONS + 1)).astype(np.int64)
    return order, offsets


def _merge_and_partition(parts: List[Dict]) -> Tuple[Dict, np.ndarray]:
    merged = {}
    for k in parts[0]:
        merged[k] = np.concatenate([p[k] for p in parts], axis=0)
    order, offsets = _partition_order(merged["keys"])
    for k in merged:
        merged[k] = merged[k][order]
    return merged, offsets


def _one_shard(table: ev.EmbeddingTable, s: int) -> ev.EmbeddingTable:
    """One shard of a stacked table as a flat local table (device-side
    slice; no host materialization)."""

    if table.keys.ndim == 1:
        return table
    from deeprec_tpu.parallel.trainer import _map_stacked, local_view

    # Slice ONLY the per-shard state planes (STACKED_FIELDS): a blanket
    # tree.map would also slice replicated leaves like default_rows
    # [pool, D] down to [1, D] / [0, D] — harmless for the current
    # shrink+stream consumers, but a trap if the shard view is ever used
    # for lookups/inserts (round-5 advice).
    return local_view(_map_stacked(table, lambda x: x[s:s + 1]))


def _table_shards(table: ev.EmbeddingTable) -> List[ev.EmbeddingTable]:
    """A stacked (sharded) table [S, ...] -> list of per-shard tables."""

    if table.keys.ndim == 1:
        return [table]
    from deeprec_tpu.parallel.trainer import _map_stacked, local_view

    s = table.keys.shape[0]
    out = []
    for i in range(s):
        # STACKED_FIELDS-only slice, same as _one_shard above: a blanket
        # tree.map would also slice replicated leaves like the
        # default_rows pool (round-5 review)
        shard = _map_stacked(table, lambda x: x[i:i + 1])
        out.append(local_view(shard))
    return out


def _bundle_name(path: str, b: int, nb: int) -> str:
    base = path[:-4] if path.endswith(".npz") else path
    return f"{base}-{b:05d}-of-{nb:05d}.npz"


def _mshard_name(path: str, s: int, ns: int) -> str:
    base = path[:-4] if path.endswith(".npz") else path
    return f"{base}.mshard-{s:05d}-of-{ns:05d}.npz"


# ---------------------------------------------------------------------------
# multi-process (multi-controller) table export
#
# On a multi-host mesh each process can device_get only its ADDRESSABLE
# shards; the reference solves the same problem by having every task write
# its own sharded bundle (python/training/saver.py:905).  Here each process
# writes one ``.mshard-SSSSS-of-NNNNN.npz`` file per table shard it owns;
# the file carries ``partition_ids`` (the logical 1000-way partitions the
# shard holds — p % S_saved == s by the runtime routing invariant) so a
# restore onto ANY shard/process count selects exactly the partitions it
# owns from every file (embedding_var_restore.cc:337-339 semantics).


def _local_template(stacked: ev.EmbeddingTable) -> ev.EmbeddingTable:
    """A fresh per-shard table matching a stacked table's schema, built from
    metadata only (no global-array slicing — safe on any process)."""

    import dataclasses as _dc

    cap = int(stacked.keys.shape[-1])
    opt = _dc.replace(stacked.option, initial_capacity=cap)
    t = ev.create(stacked.name, stacked.dim,
                  key_dtype=stacked.key_dtype,
                  value_dtype=stacked.value_dtype,
                  option=opt, capacity=cap)
    inits = dict(stacked.slot_inits)
    for sname, sval in stacked.slots.items():
        t = ev.with_slot(t, sname, width=int(sval.shape[-1]),
                         init=inits.get(sname, 0.0))
    return t


def _addressable_table_shards(table: ev.EmbeddingTable
                              ) -> Dict[int, ev.EmbeddingTable]:
    """{global shard index: local (unstacked) table} for the shards of a
    stacked [S, ...] table whose buffers live on this process's devices."""

    def per_field(x):
        if x is None or not isinstance(x, jax.Array):
            return None
        out = {}
        for sh in x.addressable_shards:
            sl = sh.index[0]
            start = 0 if sl.start is None else sl.start
            stop = x.shape[0] if sl.stop is None else sl.stop
            for k in range(start, stop):
                out[k] = sh.data[k - start]
        return out

    fields = {}
    for fname in ("keys", "values", "freqs", "versions", "touched", "cbf",
                  "size", "growth_hint"):
        fields[fname] = per_field(getattr(table, fname))
    slot_fields = {k: per_field(v) for k, v in table.slots.items()}

    out = {}
    for i in sorted(fields["keys"]):
        out[i] = table.replace(
            keys=fields["keys"][i],
            values=fields["values"][i],
            slots={k: v[i] for k, v in slot_fields.items()},
            freqs=None if fields["freqs"] is None else fields["freqs"][i],
            versions=(None if fields["versions"] is None
                      else fields["versions"][i]),
            touched=(None if fields["touched"] is None
                     else fields["touched"][i]),
            cbf=None if fields["cbf"] is None else fields["cbf"][i],
            size=fields["size"][i],
            growth_hint=fields["growth_hint"][i],
        )
    return out


def _save_table_mshard(path: str, local: ev.EmbeddingTable, shard_idx: int,
                       num_saved: int, *, shrink_step=None,
                       streaming_chunk_rows: Optional[int] = None) -> str:
    """Dump one owned shard to its mshard file, rows sorted by logical
    partition with an explicit owned-partition index.  With
    ``streaming_chunk_rows`` the shard is written as bounded routed stream
    chunks instead (host RSS ~one chunk; the routing-invariant check runs
    per chunk)."""

    if streaming_chunk_rows:
        t = local if shrink_step is None else ev.shrink(local, shrink_step)
        nc, fetch = _chunk_walker(t, streaming_chunk_rows)
        mbase = _mshard_name(path, shard_idx, num_saved)[:-4]
        for c in range(nc):
            host = fetch(c)
            stray = host["part"][host["part"] % num_saved != shard_idx]
            if len(stray):
                raise AssertionError(
                    f"shard {shard_idx}/{num_saved} of {local.name!r} holds "
                    f"keys of partitions it does not own: {stray[:8]} — "
                    "routing invariant violated")
            extra = {}
            if c == 0 and t.cbf is not None:
                extra["cbf"] = np.asarray(jax.device_get(t.cbf))
            np.savez(_stream_name(mbase, c, nc), **host, **extra)
            del host
        return mbase

    part = _export_table_host(local, shrink_step=shrink_step)
    pids = np.asarray(
        [p for p in range(SAVED_PARTITIONS) if p % num_saved == shard_idx],
        np.int64)
    kpart = _partition_of(part["keys"])
    order = np.argsort(kpart, kind="stable")
    psorted = kpart[order]
    lo = np.searchsorted(psorted, pids, side="left")
    hi = np.searchsorted(psorted, pids, side="right")
    if int((hi - lo).sum()) != len(psorted):
        stray = np.setdiff1d(np.unique(psorted), pids)
        raise AssertionError(
            f"shard {shard_idx}/{num_saved} of {local.name!r} holds keys of "
            f"partitions it does not own: {stray[:8]} — routing invariant "
            "violated")
    offsets = np.concatenate([lo, [len(psorted)]]).astype(np.int64)
    out = {k: v[order] for k, v in part.items()}
    extra = {}
    if local.cbf is not None:
        extra["cbf"] = np.asarray(jax.device_get(local.cbf))
    fname = _mshard_name(path, shard_idx, num_saved)
    np.savez(fname, partition_ids=pids, partition_offsets=offsets,
             **out, **extra)
    return fname


def save_table(path: str, table: ev.EmbeddingTable, *, shrink_step=None,
               num_bundles: int = 1, executor=None) -> List[str]:
    """Dump a table to ``path`` (one npz) or, with ``num_bundles`` > 1, to a
    sharded bundle set ``path-BBBBB-of-NNNNN.npz`` — the reference's SaveV3
    sharded-bundle layout (save_restore_v2_ops.cc:274).  Each bundle owns a
    contiguous range of the 1000 logical partitions; the row permutation and
    the file write for each bundle run on ``executor`` (or an internal pool),
    so a multi-GB table is gathered + written in parallel instead of one
    monolithic host stall.  Returns the list of files written."""

    shards = _table_shards(table)
    parts = [_export_table_host(t, shrink_step=shrink_step) for t in shards]
    merged = {}
    for k in parts[0]:
        merged[k] = ([p[k] for p in parts] if len(parts) > 1
                     else [parts[0][k]])
    extra = {}
    if shards[0].cbf is not None:
        extra["cbf"] = _cbf_sum(jax.device_get(t.cbf) for t in shards)

    keys_cat = (np.concatenate(merged["keys"]) if len(parts) > 1
                else merged["keys"][0])
    order, offsets = _partition_order(keys_cat)

    def cat(k):
        return (np.concatenate(merged[k]) if len(merged[k]) > 1
                else merged[k][0])

    if num_bundles <= 1:
        out = {k: cat(k)[order] for k in merged}
        np.savez(path, partition_offsets=offsets, **out, **extra)
        return [path]

    # Bundle b owns partitions [lo, hi); rows are order[offsets[lo]:offsets[hi]].
    bounds = np.linspace(0, SAVED_PARTITIONS, num_bundles + 1).astype(int)
    cats = {k: cat(k) for k in merged}

    def write_bundle(b):
        lo, hi = int(bounds[b]), int(bounds[b + 1])
        sel = order[offsets[lo]:offsets[hi]]
        data = {k: cats[k][sel] for k in cats}
        local = (offsets[lo:hi + 1] - offsets[lo]).astype(np.int64)
        hdr = dict(extra) if b == 0 else {}
        fname = _bundle_name(path, b, num_bundles)
        np.savez(fname, partition_offsets=local,
                 bundle_range=np.asarray([lo, hi], np.int64), **data, **hdr)
        return fname

    own = executor is None
    ex = executor or cf.ThreadPoolExecutor(max_workers=min(num_bundles, 8))
    try:
        files = list(ex.map(write_bundle, range(num_bundles)))
    finally:
        if own:
            ex.shutdown()
    return files


def _stream_name(path: str, c: int, nc: int) -> str:
    base = path[:-4] if path.endswith(".npz") else path
    return f"{base}.stream-{c:05d}-of-{nc:05d}.npz"


def _chunk_walker(table: ev.EmbeddingTable, chunk_rows: int,
                  *, shard: Optional[int] = None,
                  touched_only: bool = False):
    """(nc, fn) where fn(c) -> bounded host dict for capacity chunk ``c``:
    the chunk's selected live rows compacted to the front on device (dead
    rows never cross the host boundary) plus a per-row logical 'part'
    column.  ``shard`` walks one shard of a stacked [S, cap] table without
    ever materializing the shard (the slice happens inside the jit, so only
    chunk-sized buffers exist).  ``touched_only`` restricts to the
    incremental recorder's touched∧live rows (IncrSave semantics)."""

    cap = int(table.keys.shape[-1])
    # power-of-two chunk always divides the pow2 capacity: no ragged tail
    chunk_rows = min(1 << (max(chunk_rows, 1).bit_length() - 1), cap)
    nc = cap // chunk_rows

    # planes as ARGUMENTS to one module-level jitted function: a per-call
    # @jax.jit closure (old shape of this code) keyed the jit cache on the
    # fresh function object, so EVERY streaming/incremental save — per
    # shard — paid a full retrace+recompile (seconds on the tunnel) even
    # at a 30 s incremental cadence (round-5 review).  The cache now keys
    # on shapes/dtypes + the static flags and hits across saves.
    planes = {"keys": table.keys, "values": table.values,
              "slots": dict(table.slots)}
    if table.freqs is not None:
        planes["freqs"] = table.freqs
    if table.versions is not None:
        planes["versions"] = table.versions
    if touched_only:
        planes["touched"] = table.touched
    sliced = shard is not None
    shard_arg = jnp.int32(shard if sliced else 0)
    empty = int(table.empty)

    def fetch(c):
        rows, part, n = _chunk_live_jit(
            planes, shard_arg, jnp.int32(c * chunk_rows),
            chunk_rows=chunk_rows, touched_only=touched_only,
            empty=empty, sliced=sliced)
        n = int(jax.device_get(n))
        host = {k: np.asarray(jax.device_get(v))[:n]
                for k, v in rows.items()}
        host["part"] = np.asarray(jax.device_get(part))[:n].astype(np.int16)
        return host

    return nc, fetch


@functools.partial(jax.jit, static_argnames=("chunk_rows", "touched_only",
                                             "empty", "sliced"))
def _chunk_live_jit(planes, shard, lo, *, chunk_rows, touched_only,
                    empty, sliced):
    """Compacted live rows of one capacity chunk (see _chunk_walker)."""

    def plane(x):
        return (jax.lax.dynamic_index_in_dim(x, shard, 0, keepdims=False)
                if sliced else x)

    cap = planes["keys"].shape[-1]
    k = jax.lax.dynamic_slice_in_dim(plane(planes["keys"]), lo, chunk_rows)
    lv = k != empty
    if touched_only:
        t = jax.lax.dynamic_slice_in_dim(plane(planes["touched"]), lo,
                                         chunk_rows)
        lv = lv & t.astype(bool)
    order = jnp.argsort(~lv, stable=True)
    n = jnp.sum(lv.astype(jnp.int32))
    rows = {"keys": jnp.where(lv[order], k[order], empty)}
    idx = (jax.lax.dynamic_slice_in_dim(
        jnp.arange(cap, dtype=jnp.int32), lo, chunk_rows))[order]
    rows["values"] = plane(planes["values"])[idx]
    if "freqs" in planes:
        rows["freqs"] = plane(planes["freqs"])[idx]
    if "versions" in planes:
        rows["versions"] = plane(planes["versions"])[idx]
    for sname, sval in planes["slots"].items():
        rows[f"slot_{sname}"] = plane(sval)[idx]
    part = hashing.logical_partition(rows["keys"])
    return rows, part, n


def save_table_streaming(path: str, table: ev.EmbeddingTable, *,
                         shrink_step=None,
                         chunk_rows: int = 262_144) -> List[str]:
    """Dump a table (flat or stacked/sharded) as a sequence of bounded chunk
    files — host RSS never exceeds ~one chunk, so TB-scale tables stream
    through a small buffer (the role of the reference's iterative
    BundleWriter dumps, embedding_var_dump_iterator.h).  Each chunk carries
    its rows' logical partition ids, so restore-onto-any-shard-count selects
    per chunk with no global sort; the loader is format-transparent with the
    monolithic and bundle layouts.  A stacked [S, ...] table streams shard by
    shard (no shard is ever materialized whole on the host); per-shard CBF
    sketches ride each shard's first chunk and the loader sums them
    saturating (keys route to one owner shard, so the sum is the global
    count sketch)."""

    stacked = table.keys.ndim == 2
    S = int(table.keys.shape[0]) if stacked else 1
    cap = int(table.keys.shape[-1])
    cr = min(1 << (max(chunk_rows, 1).bit_length() - 1), cap)
    nc = cap // cr
    files, g = [], 0
    for s in range(S):
        if shrink_step is not None:
            # shrink needs the per-shard eviction pass; the slice is a
            # device-side copy (host RSS still bounded by one chunk)
            t = ev.shrink(_one_shard(table, s), shrink_step)
            _, fetch = _chunk_walker(t, cr)
            cbf = t.cbf
        else:
            _, fetch = _chunk_walker(table, cr,
                                     shard=s if stacked else None)
            cbf = (table.cbf[s] if stacked and table.cbf is not None
                   else table.cbf)
        for c in range(nc):
            host = fetch(c)
            extra = {}
            if c == 0 and cbf is not None:
                extra["cbf"] = np.asarray(jax.device_get(cbf))
            fname = _stream_name(path, g, S * nc)
            np.savez(fname, **host, **extra)
            files.append(fname)
            del host
            g += 1
    return files


def _load_selected_stream(files: List[str], shard_index: int,
                          num_shards: int) -> Dict[str, np.ndarray]:
    """Owned rows from a streaming chunk set (unsorted; per-row partition
    column routes them — restore never needs the global sort)."""

    skip = ("part", "cbf")
    parts, cbfs = [], []
    for f in files:
        data = np.load(f)
        sel = (data["part"].astype(np.int64) % num_shards) == shard_index
        parts.append({k: data[k][sel] for k in data.files if k not in skip})
        if "cbf" in data.files:
            cbfs.append(data["cbf"])
    out = {k: np.concatenate([p[k] for p in parts]) for k in parts[0]}
    if cbfs:
        # one sketch per source shard (each rides its shard's first chunk)
        out["cbf"] = _cbf_sum(cbfs)
    return out


def _select_from_npz(data, lo: int, hi: int, shard_index: int,
                     num_shards: int) -> Dict[str, np.ndarray]:
    """Rows of partitions p in [lo, hi) with p % num_shards == shard_index
    from one loaded npz whose partition_offsets cover [lo, hi]."""

    offsets = data["partition_offsets"]
    sel = [np.arange(offsets[p - lo], offsets[p - lo + 1])
           for p in range(lo, hi) if p % num_shards == shard_index]
    idx = (np.concatenate(sel) if sel else np.arange(0)).astype(np.int64)
    skip = ("partition_offsets", "bundle_range", "cbf")
    return {k: data[k][idx] for k in data.files if k not in skip}


def _load_selected(path: str, shard_index: int,
                   num_shards: int) -> Dict[str, np.ndarray]:
    """Load the rows this shard owns (partition % num_shards == shard_index)
    from a single-file table dump or a SaveV3-style bundle set; bundles are
    read and sliced in parallel.  Adds 'cbf' if the dump carries one."""

    if os.path.exists(path):
        data = np.load(path)
        out = _select_from_npz(data, 0, SAVED_PARTITIONS,
                               shard_index, num_shards)
        if "cbf" in data.files:
            out["cbf"] = data["cbf"]
        return out
    base = path[:-4] if path.endswith(".npz") else path
    files = sorted(_glob.glob(f"{base}-?????-of-?????.npz"))
    if not files:
        mfiles = sorted(_glob.glob(f"{base}.mshard-?????-of-?????.npz"))
        if mfiles:
            return _load_selected_mshards(mfiles, shard_index, num_shards)
        # stream chunks: flat/stacked single-process sets and per-shard
        # multi-process (mshard) sets share the routed-chunk format
        sfiles = sorted(
            _glob.glob(f"{base}.stream-?????-of-?????.npz")
            + _glob.glob(f"{base}.mshard-?????-of-?????"
                         f".stream-?????-of-?????.npz"))
        if sfiles:
            return _load_selected_stream(sfiles, shard_index, num_shards)
        raise FileNotFoundError(f"no table dump at {path} (or bundles)")

    def load_one(f):
        data = np.load(f)
        lo, hi = (int(x) for x in data["bundle_range"])
        part = _select_from_npz(data, lo, hi, shard_index, num_shards)
        cbf = data["cbf"] if "cbf" in data.files else None
        return part, cbf

    with cf.ThreadPoolExecutor(max_workers=min(len(files), 8)) as ex:
        loaded = list(ex.map(load_one, files))
    parts = [p for p, _ in loaded]
    out = {k: np.concatenate([p[k] for p in parts]) for k in parts[0]}
    for _, cbf in loaded:
        if cbf is not None:
            out["cbf"] = cbf
    return out


def _load_selected_mshards(files: List[str], shard_index: int,
                           num_shards: int) -> Dict[str, np.ndarray]:
    """Select owned rows (partition % num_shards == shard_index) from a
    multi-process mshard set.  Per-shard CBF sketches sum saturating into
    one global sketch (keys route to one owner, so the sum is the global
    count sketch — same math as the single-process stacked save)."""

    skip = ("partition_ids", "partition_offsets", "cbf")

    def load_one(f):
        data = np.load(f)
        pids = data["partition_ids"]
        offs = data["partition_offsets"]
        sel = [np.arange(offs[j], offs[j + 1])
               for j, p in enumerate(pids)
               if int(p) % num_shards == shard_index]
        idx = (np.concatenate(sel) if sel else np.arange(0)).astype(np.int64)
        part = {k: data[k][idx] for k in data.files if k not in skip}
        cbf = data["cbf"] if "cbf" in data.files else None
        return part, cbf

    with cf.ThreadPoolExecutor(max_workers=min(len(files), 8)) as ex:
        loaded = list(ex.map(load_one, files))
    parts = [p for p, _ in loaded]
    out = {k: np.concatenate([p[k] for p in parts]) for k in parts[0]}
    cbfs = [c for _, c in loaded if c is not None]
    if cbfs:
        out["cbf"] = _cbf_sum(cbfs)
    return out


def restore_table(
    path: str,
    template: ev.EmbeddingTable,
    *,
    shard_index: int = 0,
    num_shards: int = 1,
) -> ev.EmbeddingTable:
    """Load this shard's sub-partitions (p % num_shards == shard_index) and
    bulk-insert into a fresh table built from ``template``."""

    return _build_shard_from_data(_load_selected(path, shard_index,
                                                 num_shards), template)


def _build_shard_from_data(data: Dict[str, np.ndarray],
                           template: ev.EmbeddingTable) -> ev.EmbeddingTable:
    """Fresh table from ``template`` populated with pre-selected host rows
    (and optional 'cbf' sketch) — shared by the disk restore path and the
    in-memory elastic reshard."""

    keys = data["keys"]
    n = len(keys)
    cap = template.capacity
    while n > template.option.max_load_factor * cap:
        cap *= 2
    fresh = ev.create(template.name, template.dim,
                      key_dtype=template.key_dtype,
                      value_dtype=template.value_dtype,
                      option=template.option, capacity=cap)
    inits = dict(template.slot_inits)
    for sname in template.slots:
        fresh = ev.with_slot(fresh, sname,
                             width=template.slots[sname].shape[-1],
                             init=inits.get(sname, 0.0))
    if "cbf" in data and fresh.cbf is not None:
        saved = data["cbf"]
        if saved.shape == fresh.cbf.shape:
            # Restore pre-admission progress.  On a reshard every shard gets
            # the full global sketch: per-key estimates stay >= the true count
            # for the keys that shard owns, so no key admits *later* than it
            # would have without the restart (conservative in the admit-sooner
            # direction only for hash collisions — same FP story as any CBF).
            fresh = fresh.replace(cbf=jnp.asarray(saved, fresh.cbf.dtype))
    if n == 0:
        return fresh
    return _bulk_import(fresh, data)


def _bulk_import(fresh: ev.EmbeddingTable, data) -> ev.EmbeddingTable:
    """Insert pre-selected host rows (``data`` maps column -> array).

    Thin alias of ``upsert_table_rows`` (round-4 dedup): on a fresh table
    the found/inserted masks coincide, and for HashTable.insert the
    found-mask is the FIX — re-importing an existing key now updates its
    row (upsert semantics) instead of being silently skipped."""

    return upsert_table_rows(fresh, data)


def _stack_shards(shards: List[ev.EmbeddingTable]) -> ev.EmbeddingTable:
    """Per-shard tables -> one stacked [S, ...] table, capacities aligned
    (shards may differ after load-based growth). default_rows stays
    replicated (one copy)."""

    cap = max(sh.capacity for sh in shards)
    shards = [ev.grow(sh, cap) if sh.capacity < cap else sh for sh in shards]

    def stk(get):
        vals = [get(sh) for sh in shards]
        if vals[0] is None:
            return None
        return jnp.stack(vals)

    first = shards[0]
    return first.replace(
        keys=stk(lambda x: x.keys),
        values=stk(lambda x: x.values),
        slots={k: stk(lambda x, k=k: x.slots[k]) for k in first.slots},
        freqs=stk(lambda x: x.freqs),
        versions=stk(lambda x: x.versions),
        touched=stk(lambda x: x.touched),
        cbf=stk(lambda x: x.cbf),
        size=stk(lambda x: x.size),
        growth_hint=stk(lambda x: x.growth_hint),
    )


# ---------------------------------------------------------------------------
# in-memory reshard (the elastic fast path)


def _select_partitions(merged: Dict[str, np.ndarray], offsets: np.ndarray,
                       shard_index: int, num_shards: int) -> Dict:
    """Rows of partitions p with p % num_shards == shard_index from a
    partition-sorted in-memory dump (the RAM analogue of _select_from_npz)."""

    sel = [np.arange(offsets[p], offsets[p + 1])
           for p in range(SAVED_PARTITIONS) if p % num_shards == shard_index]
    idx = (np.concatenate(sel) if sel else np.arange(0)).astype(np.int64)
    return {k: v[idx] for k, v in merged.items()}


def reshard_table_in_memory(table: ev.EmbeddingTable,
                            template: ev.EmbeddingTable) -> ev.EmbeddingTable:
    """Re-partition a (possibly stacked) table to ``template``'s shard
    layout through host RAM only — no serialization, no disk round trip.

    The reference repartitions EVs via the 1000-partition bundle without a
    full dump cycle (elastic_training re-shard, embedding_var_restore.cc:
    337-339); this is the same partition math as restore_table, fed from
    device export instead of files.  Minutes-scale elastic rescales become
    seconds-scale (bounded by one device_get + one bulk insert)."""

    shards_in = _table_shards(table)
    parts = [_export_table_host(sh) for sh in shards_in]
    merged, offsets = _merge_and_partition(parts)
    cbf = None
    if shards_in[0].cbf is not None:
        dt = shards_in[0].cbf.dtype
        acc = np.zeros(shards_in[0].cbf.shape, np.int64)
        for sh in shards_in:
            acc += np.asarray(jax.device_get(sh.cbf), np.int64)
        cbf = np.minimum(acc, np.iinfo(dt).max).astype(dt)

    stacked_out = template.keys.ndim > 1
    if stacked_out:
        import jax as _jax

        from deeprec_tpu.parallel.trainer import local_view
        s = template.keys.shape[0]
        tmpl = local_view(_jax.tree.map(
            lambda x: x[0:1] if hasattr(x, "ndim") and x.ndim else x,
            template))
    else:
        s, tmpl = 1, template
    shards = []
    for i in range(s):
        data = _select_partitions(merged, offsets, i, s)
        if cbf is not None:
            data["cbf"] = cbf
        shards.append(_build_shard_from_data(data, tmpl))
    return _stack_shards(shards) if stacked_out else shards[0]


def reshard_state(state, state_template):
    """Old TrainState -> the template's (different) shard layout, in memory.
    Dense params/opt state/auc/step are copied over; tables re-partition via
    reshard_table_in_memory."""

    tables = {name: reshard_table_in_memory(t, state_template.tables[name])
              for name, t in state.tables.items()}
    host = jax.tree.map(
        lambda x: np.asarray(jax.device_get(x)),
        {"params": state.params, "opt_state": state.opt_state,
         "auc": state.auc})
    return state_template.replace(
        params=jax.tree.map(lambda t, h: jnp.asarray(h, t.dtype),
                            state_template.params, host["params"]),
        opt_state=jax.tree.map(lambda t, h: jnp.asarray(h, t.dtype),
                               state_template.opt_state, host["opt_state"]),
        auc=jax.tree.map(lambda t, h: jnp.asarray(h, t.dtype),
                         state_template.auc, host["auc"]),
        tables=tables,
        step=jnp.asarray(int(state.step), jnp.int32),
    )


# ---------------------------------------------------------------------------
# incremental


def save_table_delta(path: str, table: ev.EmbeddingTable, *,
                     streaming_chunk_rows: Optional[int] = None
                     ) -> ev.EmbeddingTable:
    """Dump rows touched since the last (full or delta) save; clears the
    recorder.  Returns the table with the recorder cleared.  With
    ``streaming_chunk_rows`` the touched-row walk is chunked (bounded host
    RSS — the full key/value planes never cross the host boundary); the
    delta loader reads both layouts transparently."""

    if table.touched is None:
        raise ValueError(
            f"table {table.name}: incremental save requires record_touched")
    if streaming_chunk_rows:
        stacked = table.keys.ndim == 2
        S = int(table.keys.shape[0]) if stacked else 1
        cap = int(table.keys.shape[-1])
        cr = min(1 << (max(streaming_chunk_rows, 1).bit_length() - 1), cap)
        nc = cap // cr
        g = 0
        for s in range(S):
            _, fetch = _chunk_walker(table, cr,
                                     shard=s if stacked else None,
                                     touched_only=True)
            for c in range(nc):
                host = fetch(c)
                np.savez(_stream_name(path, g, S * nc), **host)
                del host
                g += 1
        return table.replace(touched=jnp.zeros_like(table.touched))
    shards = _table_shards(table)
    parts = []
    for t in shards:
        touched = np.asarray(jax.device_get(t.touched)).astype(bool)
        live = np.asarray(jax.device_get(t.keys != t.empty))
        m = touched & live
        part = {"keys": np.asarray(jax.device_get(t.keys))[m],
                "values": np.asarray(jax.device_get(t.values))[m]}
        if t.freqs is not None:
            part["freqs"] = np.asarray(jax.device_get(t.freqs))[m]
        if t.versions is not None:
            part["versions"] = np.asarray(jax.device_get(t.versions))[m]
        for sname, sval in t.slots.items():
            part[f"slot_{sname}"] = np.asarray(jax.device_get(sval))[m]
        parts.append(part)
    merged, offsets = _merge_and_partition(parts)
    np.savez(path, partition_offsets=offsets, **merged)
    cleared = table.replace(touched=jnp.zeros_like(table.touched))
    return cleared


def apply_table_delta(
    table: ev.EmbeddingTable,
    path: str,
    *,
    shard_index: int = 0,
    num_shards: int = 1,
) -> ev.EmbeddingTable:
    """Upsert delta rows into an existing table (KvResourceIncrImport)."""

    return upsert_table_rows(table,
                             _load_selected(path, shard_index, num_shards))


def upsert_table_rows(table: ev.EmbeddingTable,
                      data: Dict[str, np.ndarray]) -> ev.EmbeddingTable:
    """Upsert host rows ({'keys', 'values', optional 'freqs'/'versions'/
    'slot_*'}) into an existing table — the in-memory core of
    apply_table_delta, also used for serving-side remote-row injection
    (cross-instance sharded serving, graph_optimizer.h:132-147)."""

    if len(data["keys"]) == 0:
        return table
    keys = jnp.asarray(data["keys"], table.key_dtype)
    valid = jnp.ones(keys.shape, jnp.bool_)
    while True:
        new_keys, slots, inserted, n_failed = ev._find_or_insert(
            table.keys, keys, valid, valid)
        if int(jax.device_get(n_failed)) == 0:
            break
        # Near-capacity upsert: grow, then re-derive the whole insert from the
        # grown table (idempotent) — online delta application must not
        # silently drop rows.
        table = ev.grow(table)
    found = slots < table.capacity
    dst = jnp.where(found, slots, jnp.int32(table.capacity))

    def put(arr, host):
        return arr.at[dst].set(jnp.asarray(host, arr.dtype), mode="drop")

    values = put(table.values, data["values"])
    freqs = (put(table.freqs, data["freqs"])
             if table.freqs is not None and "freqs" in data else table.freqs)
    versions = (put(table.versions, data["versions"])
                if table.versions is not None and "versions" in data
                else table.versions)
    slots_d = dict(table.slots)
    for sname in table.slots:
        k = f"slot_{sname}"
        if k in data:
            slots_d[sname] = put(table.slots[sname], data[k])
    return table.replace(
        keys=new_keys, values=values, freqs=freqs, versions=versions,
        slots=slots_d, size=table.size + jnp.sum(inserted).astype(jnp.int32),
    )


# ---------------------------------------------------------------------------
# self-describing model metadata (model_meta.json) — the role of the
# reference's SavedModel+config bundle the Processor restores from
# (serving/processor model_config.cc; the training-time option tree ships
# with the artifact, so serving needs no out-of-band schema knowledge).


def describe_tables(state) -> Dict[str, Dict]:
    from deeprec_tpu import config as cfg

    out = {}
    for name, t in state.tables.items():
        # metadata only — no shard materialization (under multi-process
        # meshes most shards are not addressable from this process)
        out[name] = {
            "dim": int(t.dim),
            "key_dtype": np.dtype(t.keys.dtype.name).name,
            "value_dtype": np.dtype(t.values.dtype.name).name,
            "capacity": int(t.keys.shape[-1]),
            "slots": {s: int(v.shape[-1]) for s, v in t.slots.items()},
            "slot_inits": {k: float(v) for k, v in dict(t.slot_inits).items()},
            "option": cfg.option_to_dict(t.option),
        }
    return out


def build_template_table(name: str, tmeta: Dict,
                         with_slots: bool = False) -> ev.EmbeddingTable:
    """An empty table matching a model_meta.json table schema."""

    from deeprec_tpu import config as cfg

    option = cfg.option_from_dict(tmeta["option"])
    t = ev.create(name, tmeta["dim"],
                  key_dtype=jnp.dtype(tmeta["key_dtype"]),
                  value_dtype=jnp.dtype(tmeta["value_dtype"]),
                  option=option, capacity=tmeta["capacity"])
    if with_slots:
        inits = tmeta.get("slot_inits", {})
        for sname, width in tmeta.get("slots", {}).items():
            t = ev.with_slot(t, sname, width=width,
                             init=inits.get(sname, 0.0))
    return t


def load_model_meta(ckpt_path: str) -> Optional[Dict]:
    p = os.path.join(ckpt_path, "model_meta.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


# ---------------------------------------------------------------------------
# full TrainState checkpoints


def save_checkpoint(ckpt_dir: str, state, *, step: Optional[int] = None,
                    shrink: bool = False, tiers=None,
                    num_bundles: int = 1, model_name: Optional[str] = None,
                    streaming_chunk_rows: Optional[int] = None,
                    _cold_data=None) -> str:
    """Full checkpoint of a TrainState (local or distributed).

    ``tiers`` ({table name: TieredTable} or ShardedTiers) makes the save
    tier-complete: demoted (cold) rows are walked and dumped alongside the
    hot table, matching the reference's multi-tier Save which iterates ALL
    storage levels (multi_tier_storage.h:47, embedding_var.h Save ->
    Storage::Save).  Without it a tiered job would lose every demoted row
    on restart.

    ``num_bundles`` > 1 writes each table as a sharded bundle set with the
    permute+write work parallelized across a thread pool (SaveV3 sharded
    bundles, save_restore_v2_ops.cc:274) — restore is format-transparent.
    ``_cold_data`` is an internal pre-exported {name: (keys, rows, freqs)}
    snapshot used by AsyncCheckpointer so the live host KV isn't walked from
    the background thread.
    """

    step = int(state.step) if step is None else step
    if jax.process_count() > 1:
        return _save_checkpoint_multiprocess(
            ckpt_dir, state, step=step, shrink=shrink, tiers=tiers,
            model_name=model_name,
            streaming_chunk_rows=streaming_chunk_rows)
    d = os.path.join(ckpt_dir, f"step_{step}")
    os.makedirs(d, exist_ok=True)
    np.savez(os.path.join(d, "dense.npz"),
             **_flatten_params({"params": state.params,
                                "opt_state": state.opt_state,
                                "auc": state.auc}))
    meta = {"step": step, "tables": {}, "cold": {}}
    ex = (cf.ThreadPoolExecutor(max_workers=8) if num_bundles > 1 else None)
    try:
        for name, t in state.tables.items():
            fname = f"table_{name}.npz"
            if streaming_chunk_rows:
                # bounded-RSS streaming writer (TB-scale tables, flat or
                # stacked): host memory never holds more than ~one chunk
                save_table_streaming(
                    os.path.join(d, fname), t,
                    shrink_step=state.step if shrink else None,
                    chunk_rows=streaming_chunk_rows)
            else:
                save_table(os.path.join(d, fname), t,
                           shrink_step=state.step if shrink else None,
                           num_bundles=num_bundles, executor=ex)
            meta["tables"][name] = fname
    finally:
        if ex is not None:
            ex.shutdown()
    if _cold_data is None:
        _cold_data = {name: tier.export_cold()
                      for name, tier in (tiers or {}).items()}
    for name, (keys, rows, freqs) in _cold_data.items():
        if len(keys) == 0:
            continue
        fname = f"cold_{name}.npz"
        np.savez(os.path.join(d, fname), keys=keys, rows=rows, freqs=freqs)
        layout = {"file": fname, "row_floats": int(rows.shape[1])}
        tier = (tiers or {}).get(name)
        if tier is not None:
            # row layout [values | slot_0..k | version] — recorded so a
            # consumer with a different slot schema (e.g. serving, which
            # carries no optimizer slots) can remap columns on restore.
            layout["dim"] = int(tier.dim)
            layout["slot_names"] = list(tier.slot_names)
            layout["slot_widths"] = list(tier.slot_widths)
        meta["cold"][name] = layout
    with open(os.path.join(d, "meta.json"), "w") as f:
        json.dump(meta, f)
    # self-describing schema: table options + slot layout (+ model registry
    # name when the caller provides one) so the Processor can reconstruct
    # the restore template from the artifact alone.
    with open(os.path.join(d, "model_meta.json"), "w") as f:
        json.dump({"model_name": model_name,
                   "tables": describe_tables(state)}, f)
    # The pointer flip is the commit point: written to a temp file and
    # renamed so a crash anywhere during the save leaves the previous
    # pointer intact (a partial step_N dir is unreachable garbage, never a
    # restore candidate).
    marker = os.path.join(ckpt_dir, "checkpoint")
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"latest": f"step_{step}"}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, marker)
    return d


def _save_checkpoint_multiprocess(ckpt_dir: str, state, *, step: int,
                                  shrink: bool = False, tiers=None,
                                  model_name: Optional[str] = None,
                                  streaming_chunk_rows: Optional[int] = None
                                  ) -> str:
    """Multi-controller full save: every process writes mshard files for the
    table shards whose buffers it owns (the reference's per-task sharded
    bundles, python/training/saver.py:905); process 0 writes the replicated
    dense state + metadata and flips the commit marker after a cluster
    barrier.  Requires ``ckpt_dir`` on a filesystem all processes share
    (NFS/GCS — the same assumption the reference's sharded saver makes)."""

    from deeprec_tpu.parallel import multihost

    d = os.path.join(ckpt_dir, f"step_{step}")
    os.makedirs(d, exist_ok=True)
    meta = {"step": step, "tables": {}, "cold": {}}
    for name, t in state.tables.items():
        if t.keys.ndim == 1:
            raise ValueError(
                f"table {name!r} is unsharded under a multi-process mesh")
        num_saved = int(t.keys.shape[0])
        fname = f"table_{name}.npz"
        local_shards = _addressable_table_shards(t)
        for s, local in local_shards.items():
            _save_table_mshard(os.path.join(d, fname), local, s, num_saved,
                               shrink_step=state.step if shrink else None,
                               streaming_chunk_rows=streaming_chunk_rows)
        meta["tables"][name] = fname
    # Tier-complete: every process dumps the cold stores of the shards it
    # owns (ShardedTiers holds local shards only) as one pshard file —
    # the per-task sharded-bundle pattern again.  An empty dump is still
    # written so the manifest is layout-independent; restore merges all
    # pshards key-wise (import_cold re-routes, so a different process
    # count or shard count on restore is fine).
    nproc = jax.process_count()
    for name, tier in (tiers or {}).items():
        keys, rows, freqs = tier.export_cold()
        fname = f"cold_{name}.pshard{jax.process_index()}.npz"
        np.savez(os.path.join(d, fname), keys=keys, rows=rows, freqs=freqs)
        layout = {
            "files": [f"cold_{name}.pshard{p}.npz" for p in range(nproc)],
            "row_floats": int(tier.row_floats),
            "dim": int(tier.dim),
            "slot_names": list(tier.slot_names),
            "slot_widths": list(tier.slot_widths),
        }
        meta["cold"][name] = layout
    # All shards on disk before the commit point; all processes return only
    # after the marker exists (a restore on ANY process right after save()
    # must see the new checkpoint).
    multihost.barrier(f"ckpt_written_{step}")
    if jax.process_index() == 0:
        np.savez(os.path.join(d, "dense.npz"),
                 **_flatten_params({"params": state.params,
                                    "opt_state": state.opt_state,
                                    "auc": state.auc}))
        with open(os.path.join(d, "meta.json"), "w") as f:
            json.dump(meta, f)
        with open(os.path.join(d, "model_meta.json"), "w") as f:
            json.dump({"model_name": model_name,
                       "tables": describe_tables(state)}, f)
        marker = os.path.join(ckpt_dir, "checkpoint")
        tmp = marker + f".tmp{jax.process_index()}"
        with open(tmp, "w") as f:
            json.dump({"latest": f"step_{step}"}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, marker)
    multihost.barrier(f"ckpt_committed_{step}")
    return d


def _assemble_global_table(template: ev.EmbeddingTable,
                           shards: Dict[int, ev.EmbeddingTable]
                           ) -> ev.EmbeddingTable:
    """Local per-shard tables -> one globally-sharded stacked table laid out
    like ``template`` (same shardings, possibly larger capacity)."""

    num_shards = int(template.keys.shape[0])
    # device of each owned global shard index, from the template's layout
    dev_of = {}
    for sh in template.keys.addressable_shards:
        sl = sh.index[0]
        start = 0 if sl.start is None else sl.start
        stop = template.keys.shape[0] if sl.stop is None else sl.stop
        for k in range(start, stop):
            dev_of[k] = sh.device
    idxs = sorted(dev_of)
    assert sorted(shards) == idxs, (sorted(shards), idxs)

    def asm(field, tmpl_leaf):
        vals = {i: field(shards[i]) for i in idxs}
        if any(v is None for v in vals.values()):
            return None
        arrs = [jax.device_put(np.asarray(jax.device_get(vals[i]))[None],
                               dev_of[i]) for i in idxs]
        shape = (num_shards,) + arrs[0].shape[1:]
        return jax.make_array_from_single_device_arrays(
            shape, tmpl_leaf.sharding, arrs)

    first = shards[idxs[0]]
    return template.replace(
        keys=asm(lambda t: t.keys, template.keys),
        values=asm(lambda t: t.values, template.values),
        slots={k: asm(lambda t, k=k: t.slots[k], template.slots[k])
               for k in first.slots},
        freqs=asm(lambda t: t.freqs, template.freqs),
        versions=asm(lambda t: t.versions, template.versions),
        touched=asm(lambda t: t.touched, template.touched),
        cbf=asm(lambda t: t.cbf, template.cbf),
        size=asm(lambda t: t.size, template.size),
        growth_hint=asm(lambda t: t.growth_hint, template.growth_hint),
    )


def _restore_table_multiprocess(fname: str, template: ev.EmbeddingTable
                                ) -> ev.EmbeddingTable:
    """Restore one stacked table on a multi-process mesh: each process loads
    and rebuilds only the shards it owns, capacities are aligned cluster-wide
    (max), and the global array is assembled from the local pieces."""

    from jax.experimental import multihost_utils

    num_shards = int(template.keys.shape[0])
    tmpl = _local_template(template)
    owned = sorted({
        k for sh in template.keys.addressable_shards
        for k in range(
            0 if sh.index[0].start is None else sh.index[0].start,
            template.keys.shape[0] if sh.index[0].stop is None
            else sh.index[0].stop)})
    shards = {s: restore_table(fname, tmpl, shard_index=s,
                               num_shards=num_shards)
              for s in owned}
    local_max = max(sh.capacity for sh in shards.values())
    cap = int(np.max(multihost_utils.process_allgather(
        np.asarray([local_max], np.int64))))
    shards = {s: (ev.grow(sh, cap) if sh.capacity < cap else sh)
              for s, sh in shards.items()}
    return _assemble_global_table(template, shards)


class AsyncCheckpointer:
    """Background full saves (the reference's async/incremental saver thread,
    incremental_saver.py:78 cadence machinery + a snapshot save).

    ``save`` snapshots the state's device buffers with an on-device copy
    before returning (the training step donates its input buffers, so the
    live state's arrays are deleted as soon as the next step runs), then
    device_gets + writes from the background thread.  The host-side cold
    tier is likewise snapshotted synchronously (it mutates under demotion).
    Returns a Future; at most one save is in flight — a new save waits for
    the previous one.
    """

    def __init__(self):
        self._ex = cf.ThreadPoolExecutor(max_workers=1)
        self._pending: Optional[cf.Future] = None

    def save(self, ckpt_dir: str, state, *, step=None, shrink=False,
             tiers=None, num_bundles: int = 1,
             model_name=None, _cold_data=None) -> cf.Future:
        self.wait()
        if jax.process_count() > 1:
            # A multi-controller save is a COLLECTIVE (mshard barrier +
            # commit barrier); running it on a background thread could
            # interleave its barriers with the main thread's training-step
            # collectives and deadlock the cluster.  Run it synchronously
            # and hand back a completed future (same surface).
            f: cf.Future = cf.Future()
            try:
                f.set_result(save_checkpoint(
                    ckpt_dir, state, step=step, shrink=shrink, tiers=tiers,
                    num_bundles=num_bundles, model_name=model_name))
            except BaseException as e:  # surface via the future, like submit
                f.set_exception(e)
            return f
        state = jax.tree.map(
            lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x, state)
        # _cold_data: caller-supplied snapshot (CheckpointSaverHook folds
        # in-flight stager payloads into it — round-5 review)
        cold = (_cold_data if _cold_data is not None
                else {name: tier.export_cold()
                      for name, tier in (tiers or {}).items()})
        # tiers rides along for the cold-layout META (dim/slot widths);
        # the snapshotted _cold_data supplies the rows, so the background
        # thread never touches the live (mutating) cold stores.
        self._pending = self._ex.submit(
            save_checkpoint, ckpt_dir, state, step=step, shrink=shrink,
            tiers=tiers, num_bundles=num_bundles, model_name=model_name,
            _cold_data=cold)
        return self._pending

    def wait(self) -> Optional[str]:
        if self._pending is not None:
            path = self._pending.result()
            self._pending = None
            return path
        return None

    def close(self):
        self.wait()
        self._ex.shutdown()


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    marker = os.path.join(ckpt_dir, "checkpoint")
    if not os.path.exists(marker):
        return None
    with open(marker) as f:
        return os.path.join(ckpt_dir, json.load(f)["latest"])


def _remap_cold_rows(name: str, info: Dict, rows: np.ndarray, tier):
    """Convert a cold dump's [values|slots|version] layout into the target
    tier's (slots the target lacks are dropped; slots the dump lacks are
    zero-filled) — lets serving (no optimizer slots) consume a training
    cold tier."""

    if "slot_names" not in info:
        raise ValueError(
            f"cold-tier row layout mismatch for {name!r}: checkpoint has "
            f"{rows.shape[1]} floats/row, tier expects {tier.row_floats}, "
            "and the checkpoint predates layout metadata — re-save it")
    dim = int(info["dim"])
    if dim != tier.dim:
        raise ValueError(
            f"cold-tier dim mismatch for {name!r}: {dim} vs {tier.dim}")
    src_off = {}
    off = dim
    for sname, w in zip(info["slot_names"], info["slot_widths"]):
        src_off[sname] = (off, int(w))
        off += int(w)
    out = np.zeros((rows.shape[0], tier.row_floats), rows.dtype)
    out[:, :dim] = rows[:, :dim]
    doff = dim
    for sname, w in zip(tier.slot_names, tier.slot_widths):
        if sname in src_off:
            so, sw = src_off[sname]
            if sw != w:
                raise ValueError(
                    f"slot {sname!r} width mismatch for {name!r}: {sw} vs {w}")
            out[:, doff:doff + w] = rows[:, so:so + sw]
        doff += w
    out[:, -1] = rows[:, -1]  # version (bitcast f32)
    return out


def restore_checkpoint(ckpt_path: str, state_template, *,
                       num_shards: int = 1, tiers=None, table_shards=None):
    """Restore into a (possibly differently-sharded) state template.

    ``num_shards`` > 1 rebuilds each table's stacked [S, ...] layout by
    loading each shard's sub-partitions — elastic re-shard on restore.
    ``tiers`` rebuilds each table's cold store from the checkpoint's cold
    dump (tier-complete restore; pass the same mapping given to
    ``save_checkpoint``).
    ``table_shards`` ({table name: (shard_index, num_shards)}) restores only
    that slice of a table into a FLAT template — serving-side cross-instance
    embedding sharding (graph_optimizer.h:132-147: each serving instance
    holds 1/N of the big EVs and peers serve the rest).
    """

    with open(os.path.join(ckpt_path, "meta.json")) as f:
        meta = json.load(f)
    for name, info in meta.get("cold", {}).items():
        if tiers is None or name not in tiers:
            raise ValueError(
                f"checkpoint has a cold tier for table {name!r} but no "
                "TieredTable was passed to restore it into — demoted rows "
                "would be silently lost")
        tier = tiers[name]
        # single-process saves record one "file"; multi-process saves record
        # per-process pshard "files" — import each (keys are disjoint across
        # dumps; import_cold re-routes onto THIS mesh's local shards)
        for fname in info.get("files", [info.get("file")] if "file" in info
                              else []):
            cold = np.load(os.path.join(ckpt_path, fname))
            if not len(cold["keys"]):
                continue
            rows = cold["rows"]
            if rows.shape[1] != tier.row_floats:
                rows = _remap_cold_rows(name, info, rows, tier)
            tier.import_cold(cold["keys"], rows, cold["freqs"])
    multiproc = jax.process_count() > 1
    dense = dict(np.load(os.path.join(ckpt_path, "dense.npz")))
    restored_dense = _unflatten_params(
        {"params": state_template.params,
         "opt_state": state_template.opt_state,
         "auc": state_template.auc}, dense)
    if multiproc:
        # replicate across the cluster with the template's layout (every
        # process loaded the identical host values from the shared dir)
        restored_dense = jax.tree.map(
            lambda tmpl, h: (jax.device_put(np.asarray(h), tmpl.sharding)
                             if isinstance(tmpl, jax.Array) else h),
            {"params": state_template.params,
             "opt_state": state_template.opt_state,
             "auc": state_template.auc}, restored_dense)
    tables = {}
    for name, t in state_template.tables.items():
        fname = os.path.join(ckpt_path, meta["tables"][name])
        if t.keys.ndim == 1:
            si, ns = (table_shards or {}).get(name, (0, 1))
            tables[name] = restore_table(fname, t, shard_index=si,
                                         num_shards=ns)
        elif multiproc:
            tables[name] = _restore_table_multiprocess(fname, t)
        else:
            from deeprec_tpu.parallel.trainer import local_view, relift
            import jax as _jax

            s = t.keys.shape[0]
            tmpl = local_view(_jax.tree.map(lambda x: x[0:1], t))
            shards = [restore_table(fname, tmpl, shard_index=i, num_shards=s)
                      for i in range(s)]
            tables[name] = _stack_shards(shards)
    step = jnp.asarray(meta["step"], jnp.int32)
    if multiproc and isinstance(state_template.step, jax.Array):
        step = jax.device_put(np.asarray(meta["step"], np.int32),
                              state_template.step.sharding)
    return state_template.replace(
        params=restored_dense["params"],
        opt_state=restored_dense["opt_state"],
        auc=restored_dense["auc"],
        tables=tables,
        step=step,
    )
