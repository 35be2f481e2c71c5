"""Multi-tier embedding storage composed with the row-sharded trainer.

The sharded analogue of ``embedding/tiered.py`` — the reference's
HbmDramStorage composes with PS sharding by construction
(hbm_dram_storage.h:37: each PS task owns its own multi-tier storage for its
EV partition).  Here each mesh device owns a hot shard of the stacked table,
and each shard gets its own host-side cold store:

  * **routing**: a key's cold rows live on the same shard its hot row would
    (``shard_of`` = logical_partition % S), so promotion payloads are routed
    host-side by the same function the device lookup uses — a promoted row
    is always inserted into the shard that the all-to-all will ask;
  * **promotion** is a ``shard_map``ped bulk-upsert: per-shard payloads are
    padded to a common length, stacked [S, P, ...], sharded over the mesh
    axis, and each device runs the same ``_promote_body`` the single-chip
    tier uses;
  * **demotion** selects the k coldest rows per shard on-device (one
    ``shard_map``), hands them to the per-shard host KVs, then rebuilds
    every shard tombstone-free (second ``shard_map``).

Updates always land in tier-0 (the device shard) — training math is
unchanged, exactly the multi-tier invariant
(docs_zh/Multi-tier-Embedding-Storage.md §1).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deeprec_tpu.data.native import HostKV
from deeprec_tpu.embedding import table as ev
from deeprec_tpu.embedding.tiered import (
    PROMOTE_PAD, _demote_select_body, _promote_body)
from deeprec_tpu.ops import hashing


def shard_of_np(keys: np.ndarray, num_shards: int) -> np.ndarray:
    """Host-side twin of parallel.sharded.shard_of (bit-identical routing)."""

    return hashing.logical_partition_np(keys) % np.int32(num_shards)


class ShardedTiers:
    """Per-shard cold tiers for one physical table on a mesh axis."""

    def __init__(self, stacked: ev.EmbeddingTable, mesh: Mesh, axis: str,
                 *,
                 ssd_dir: Optional[str] = None,
                 max_dram_rows: int = -1,
                 hot_watermark: float = 0.85,
                 evict_fraction: float = 0.3):
        self.mesh = mesh
        self.axis = axis
        self.num_shards = int(stacked.keys.shape[0])
        # Routing must hash keys at the TABLE's key width: the host KV stores
        # keys widened to int64, but an int32 table hashes int32 on device —
        # shard_of_np on the widened copy would take the 64-bit mix path and
        # route to a different shard than the all-to-all.
        self.key_np = np.dtype(stacked.keys.dtype.name)
        if stacked.freqs is None:
            raise ValueError(
                "tiered storage needs the freqs plane — set "
                "record_freq=True on the table option")
        self.dim = stacked.dim
        self.slot_names = tuple(sorted(stacked.slots))
        self.slot_widths = tuple(int(stacked.slots[s].shape[-1])
                                 for s in self.slot_names)
        self.row_floats = self.dim + sum(self.slot_widths) + 1
        per_shard_cap = int(stacked.keys.shape[1])
        # Multi-controller: each process owns host cold stores ONLY for the
        # shards whose device it can address — the reference's analogue is
        # each PS task owning the multi-tier storage of its own EV partition
        # (hbm_dram_storage.h:37).  Single process -> every shard is local
        # and the behavior below is byte-identical to round 3.
        self._mp = jax.process_count() > 1
        proc = jax.process_index()
        axis_devices = self._axis_devices(mesh, axis)
        if self._mp:
            # Promotion fills non-owner replica slices with EMPTY filler
            # (make_array_from_callback below), which is only sound when
            # every replica device of a shard lives on the OWNER's process
            # — otherwise replicas of one logical shard would diverge
            # inside the promote shard_map and corrupt the hot table.
            ax = list(mesh.axis_names).index(axis)
            dev = np.moveaxis(np.asarray(mesh.devices), ax, 0)
            for s in range(dev.shape[0]):
                procs = {d.process_index
                         for d in np.asarray(dev[s]).reshape(-1)}
                if len(procs) > 1:
                    raise ValueError(
                        f"ShardedTiers: shard {s} of axis {axis!r} has "
                        f"replica devices on processes {sorted(procs)}; "
                        "multi-controller tiers require each shard's "
                        "replicas to live on one process (make the "
                        f"{axis!r} axis the process-spanning one)")
        self.local_shards = tuple(
            s for s in range(self.num_shards)
            if axis_devices[s].process_index == proc)
        self.cold: Dict[int, HostKV] = {}
        for i in self.local_shards:
            kv = HostKV(self.row_floats, capacity_hint=per_shard_cap)
            if ssd_dir is not None:
                os.makedirs(ssd_dir, exist_ok=True)
                kv.enable_ssd(os.path.join(ssd_dir, f"shard{i}.log"),
                              max_dram_rows if max_dram_rows >= 0
                              else per_shard_cap)
            self.cold[i] = kv
        self.hot_watermark = hot_watermark
        self.evict_fraction = evict_fraction
        self.strategy = stacked.option.storage.cache_strategy.value
        if self.strategy == "lru" and stacked.versions is None:
            raise ValueError("CacheStrategy.LRU needs record_version=True")
        self._promote_fns: Dict[int, object] = {}  # payload len -> compiled
        self._demote_fns: Dict[int, object] = {}  # capacity -> compiled pair

    @staticmethod
    def _axis_devices(mesh: Mesh, axis: str):
        """The device that owns shard s of a P(axis)-sharded table (first
        replica when the mesh has other axes)."""

        ax = list(mesh.axis_names).index(axis)
        dev = np.moveaxis(np.asarray(mesh.devices), ax, 0)
        return [np.asarray(dev[s]).reshape(-1)[0] for s in range(dev.shape[0])]

    # -- promotion ----------------------------------------------------------

    def prepare(self, flat_ids: np.ndarray, empty: int,
                erase: bool = True) -> Optional[Dict]:
        """Route the batch's ids to their owner shards, look up each LOCAL
        shard's cold store, and build a stacked [S, P, ...] promotion payload
        (non-local shard rows stay EMPTY — each process contributes only the
        slices its devices will consume).

        Multi-controller: ALWAYS returns a payload (possibly all-EMPTY) so
        every process reaches ``promote`` — the skip/pad decisions there are
        collective and must be taken with global knowledge, not per-process
        early exits.  This keeps ``prepare`` collective-free, so the
        TierStager may still run it from a background thread."""

        uids = np.unique(np.asarray(flat_ids))
        uids = uids[uids != empty]
        if not self._mp and (len(uids) == 0
                             or all(kv.size == 0 for kv in self.cold.values())):
            return None
        owner = shard_of_np(uids.astype(self.key_np), self.num_shards)
        per_keys, per_rows, per_freqs = {}, {}, {}
        n_max = 0
        for s in self.local_shards:
            mine = uids[owner == s]
            if len(mine) and self.cold[s].size:
                rows, freqs, found = self.cold[s].lookup(
                    mine.astype(np.int64), erase=erase)
                keys = mine[found]
                rows = rows[found]
                freqs = freqs[found]
            else:
                keys = uids[:0]
                rows = np.zeros((0, self.row_floats), np.float32)
                freqs = np.zeros((0,), np.uint32)
            per_keys[s] = keys
            per_rows[s] = rows
            per_freqs[s] = freqs
            n_max = max(n_max, len(keys))
        if n_max == 0 and not self._mp:
            return None
        pad_to = max(-(-n_max // PROMOTE_PAD) * PROMOTE_PAD, PROMOTE_PAD)
        S = self.num_shards
        keys = np.full((S, pad_to), empty, uids.dtype)
        rows = np.zeros((S, pad_to, self.row_floats), np.float32)
        freqs = np.zeros((S, pad_to), np.int32)
        for s in self.local_shards:
            k = len(per_keys[s])
            keys[s, :k] = per_keys[s]
            rows[s, :k] = per_rows[s]
            freqs[s, :k] = per_freqs[s].astype(np.int64)
        return {"keys": keys, "rows": rows, "freqs": freqs,
                "n_max": n_max}

    def promote(self, stacked: ev.EmbeddingTable,
                payload: Dict) -> ev.EmbeddingTable:
        from deeprec_tpu.parallel.trainer import (
            local_view, relift, table_pspec)

        if self._mp:
            # Collective point (main thread, same order on every process):
            # agree on the payload width, skip the shard_map entirely when
            # NO process promotes anything this step.
            from jax.experimental import multihost_utils

            n_all = multihost_utils.process_allgather(
                np.int32(payload.get("n_max", payload["keys"].shape[1])))
            n_glob = int(np.max(np.asarray(n_all)))
            if n_glob == 0:
                return stacked
            pad_glob = -(-n_glob // PROMOTE_PAD) * PROMOTE_PAD
            payload = _repad_payload(payload, pad_glob,
                                     empty=int(stacked.empty))
        pad_to = payload["keys"].shape[1]
        promote_fn = self._promote_fns.get(pad_to)
        if promote_fn is None:
            sspec = table_pspec(stacked, self.axis)
            sn, sw, d = self.slot_names, self.slot_widths, self.dim

            def body(tbl, keys, rows, freqs):
                t = local_view(tbl)
                t, failed = _promote_body(t, keys[0], rows[0], freqs[0],
                                          slot_names=sn, slot_widths=sw,
                                          dim=d)
                return relift(t), failed[None]

            # cached per payload width (like _demote_fns per capacity):
            # alternating widths must not thrash recompiles
            promote_fn = jax.jit(jax.shard_map(
                body, mesh=self.mesh,
                in_specs=(sspec, P(self.axis), P(self.axis), P(self.axis)),
                out_specs=(sspec, P(self.axis)), check_vma=False))
            self._promote_fns[pad_to] = promote_fn
        sh = NamedSharding(self.mesh, P(self.axis))

        def put(x, dtype=None):
            x = np.asarray(x, dtype)
            if not self._mp:
                return jax.device_put(jnp.asarray(x), sh)
            # only the addressable slices are read — non-local rows of this
            # process's copy are EMPTY filler by construction
            return jax.make_array_from_callback(
                x.shape, NamedSharding(self.mesh, P(self.axis)),
                lambda idx: x[idx])

        out, failed = promote_fn(
            stacked,
            put(payload["keys"], np.dtype(stacked.keys.dtype.name)),
            put(payload["rows"]),
            put(payload["freqs"]))
        # Failed inserts (hot shard full / probe exhausted): their cold
        # copies were taken with erase semantics in prepare() — restore
        # them per ADDRESSABLE shard so learned rows are never lost
        # (growth_hint is bumped device-side, so the demote/widen valves
        # fire).  Mirrors demote's local_rows walk.
        for sh_piece in failed.addressable_shards:
            s = int(sh_piece.index[0].start or 0)
            f = np.asarray(sh_piece.data)[0]
            if s in self.cold and f.any():
                keys_s = np.asarray(payload["keys"])[s]
                self.cold[s].upsert(
                    keys_s[f].astype(np.int64),
                    np.asarray(payload["rows"])[s][f],
                    np.asarray(payload["freqs"])[s][f].astype(np.uint32))
        return out

    # -- demotion -----------------------------------------------------------

    def needs_demote(self, stacked: ev.EmbeddingTable) -> bool:
        cap = stacked.keys.shape[1]
        # device-side max first: a sharded [S] array is not fully
        # addressable from one process on a multi-host mesh, and the
        # replicated scalar guarantees every process takes the same branch
        max_size = int(jax.device_get(jnp.max(stacked.size)))
        hint = int(jax.device_get(jnp.max(stacked.growth_hint)))
        return max_size > self.hot_watermark * cap or hint > 0

    def demote(self, stacked: ev.EmbeddingTable) -> ev.EmbeddingTable:
        """Flush the k coldest rows of EVERY shard down to its cold store."""

        from deeprec_tpu.parallel.trainer import (
            local_view, relift, table_pspec)

        cap = int(stacked.keys.shape[1])
        k = max(1, int(cap * self.evict_fraction))
        fns = self._demote_fns.get(cap)
        if fns is None:
            sspec = table_pspec(stacked, self.axis)
            sn, sw, d = self.slot_names, self.slot_widths, self.dim

            def select(tbl):
                t = local_view(tbl)
                keys, rows, freqs, _idx, mask = _demote_select_body(
                    t, k, slot_names=sn, slot_widths=sw, dim=d,
                    strategy=self.strategy)
                return keys[None], rows[None], freqs[None], mask[None]

            def apply_evict(tbl, mask):
                t = local_view(tbl)
                t = ev._apply_evict(t, mask[0])
                t = ev._rebuild(t, cap)
                return relift(t)

            ps = P(self.axis)
            fns = (
                jax.jit(jax.shard_map(
                    select, mesh=self.mesh, in_specs=(sspec,),
                    out_specs=(ps, ps, ps, ps), check_vma=False)),
                jax.jit(jax.shard_map(
                    apply_evict, mesh=self.mesh, in_specs=(sspec, ps),
                    out_specs=sspec, check_vma=False)),
            )
            self._demote_fns[cap] = fns
        select_fn, evict_fn = fns
        keys, rows, freqs, mask = select_fn(stacked)

        def local_rows(arr):
            # per-ADDRESSABLE-shard host copies (multi-host: device_get of
            # the whole [S, ...] array would touch non-addressable shards)
            # a 1-shard axis yields index slice(None) (start is None) —
            # that replicated shard is shard 0
            return {int(s.index[0].start or 0): np.asarray(s.data)[0]
                    for s in arr.addressable_shards}

        keys_h, rows_h, freqs_h = (local_rows(keys), local_rows(rows),
                                   local_rows(freqs))
        empty = stacked.empty
        for s, kv in self.cold.items():
            valid = keys_h[s] != empty
            if valid.any():
                kv.upsert(keys_h[s][valid].astype(np.int64),
                          rows_h[s][valid],
                          freqs_h[s][valid].astype(np.uint32))
        return evict_fn(stacked, mask)

    # -- checkpoint hooks (same surface as TieredTable) ---------------------

    def export_cold(self):
        """Concatenated live cold rows across every LOCAL shard (keys are
        disjoint by routing; multi-controller checkpoints write one dump per
        process and merge them key-wise on restore)."""

        keys, rows, freqs = [np.zeros((0,), np.int64)], \
            [np.zeros((0, self.row_floats), np.float32)], \
            [np.zeros((0,), np.uint32)]
        for kv in self.cold.values():
            k, r, f = kv.export()
            keys.append(k); rows.append(r); freqs.append(f)
        return (np.concatenate(keys), np.concatenate(rows),
                np.concatenate(freqs))

    def import_cold(self, keys: np.ndarray, rows: np.ndarray,
                    freqs: np.ndarray) -> None:
        """Re-route a cold dump onto this mesh's LOCAL shards — works across
        a reshard (or a different process layout) because routing is
        recomputed from the keys; non-local keys are another process's job
        and are skipped here."""

        if not len(keys):
            return
        keys = np.asarray(keys, np.int64)
        owner = shard_of_np(keys.astype(self.key_np), self.num_shards)
        for s, kv in self.cold.items():
            m = owner == s
            if m.any():
                kv.upsert(keys[m], np.asarray(rows, np.float32)[m],
                          np.asarray(freqs, np.uint32)[m])

    def compact(self) -> int:
        return sum(kv.compact() for kv in self.cold.values())

    @property
    def cold_size(self) -> int:
        """Rows in THIS process's cold stores (the global total on a
        multi-controller mesh is the sum over processes)."""

        return sum(kv.size for kv in self.cold.values())


def _repad_payload(payload: Dict, pad_to: int, *, empty: int) -> Dict:
    """Grow/shrink a [S, P, ...] promotion payload to width ``pad_to``
    (real rows are a prefix; filler is EMPTY-keyed and masked out by
    ``_promote_body``)."""

    keys, rows, freqs = payload["keys"], payload["rows"], payload["freqs"]
    cur = keys.shape[1]
    if cur == pad_to:
        return payload
    S = keys.shape[0]
    if cur > pad_to:
        return {"keys": keys[:, :pad_to], "rows": rows[:, :pad_to],
                "freqs": freqs[:, :pad_to]}
    nk = np.full((S, pad_to), empty, keys.dtype)
    nr = np.zeros((S, pad_to, rows.shape[2]), rows.dtype)
    nf = np.zeros((S, pad_to), freqs.dtype)
    nk[:, :cur] = keys; nr[:, :cur] = rows; nf[:, :cur] = freqs
    return {"keys": nk, "rows": nr, "freqs": nf}
