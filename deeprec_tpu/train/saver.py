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


def _merge_and_partition(parts: List[Dict]) -> Tuple[Dict, np.ndarray]:
    merged = {}
    for k in parts[0]:
        merged[k] = np.concatenate([p[k] for p in parts], axis=0)
    part = _partition_of(merged["keys"])
    order = np.argsort(part, kind="stable")
    for k in merged:
        merged[k] = merged[k][order]
    psorted = part[order]
    offsets = np.searchsorted(psorted, np.arange(SAVED_PARTITIONS + 1))
    return merged, offsets.astype(np.int64)


def _table_shards(table: ev.EmbeddingTable) -> List[ev.EmbeddingTable]:
    """A stacked (sharded) table [S, ...] -> list of per-shard tables."""

    if table.keys.ndim == 1:
        return [table]
    from deeprec_tpu.parallel.trainer import local_view

    s = table.keys.shape[0]
    out = []
    for i in range(s):
        shard = jax.tree.map(lambda x: x[i:i + 1], table)
        out.append(local_view(shard))
    return out


def save_table(path: str, table: ev.EmbeddingTable, *, shrink_step=None):
    shards = _table_shards(table)
    parts = [_export_table_host(t, shrink_step=shrink_step) for t in shards]
    merged, offsets = _merge_and_partition(parts)
    extra = {}
    if shards[0].cbf is not None:
        # Pre-admission CBF state (the reference's filtered-feature persistence,
        # kv_interface.h:26 -keys_filtered/-freqs_filtered): keys route to one
        # owner shard, so summing per-shard sketches yields the global count
        # sketch.  Saturate at the counter dtype's ceiling instead of wrapping.
        dt = shards[0].cbf.dtype
        acc = np.zeros(shards[0].cbf.shape, np.int64)
        for t in shards:
            acc += np.asarray(jax.device_get(t.cbf), np.int64)
        extra["cbf"] = np.minimum(acc, np.iinfo(dt).max).astype(dt)
    np.savez(path, partition_offsets=offsets, **merged, **extra)


def restore_table(
    path: str,
    template: ev.EmbeddingTable,
    *,
    shard_index: int = 0,
    num_shards: int = 1,
) -> ev.EmbeddingTable:
    """Load this shard's sub-partitions (p % num_shards == shard_index) and
    bulk-insert into a fresh table built from ``template``."""

    data = np.load(path)
    offsets = data["partition_offsets"]
    sel = [np.arange(offsets[p], offsets[p + 1])
           for p in range(SAVED_PARTITIONS) if p % num_shards == shard_index]
    idx = (np.concatenate(sel) if sel else np.arange(0)).astype(np.int64)

    keys = data["keys"][idx]
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
    return _bulk_import(fresh, data, idx)


def _bulk_import(fresh: ev.EmbeddingTable, data, idx) -> ev.EmbeddingTable:
    keys = jnp.asarray(data["keys"][idx], fresh.key_dtype)
    valid = jnp.ones(keys.shape, jnp.bool_)
    while True:
        new_keys, slots, inserted, n_failed = ev._find_or_insert(
            fresh.keys, keys, valid, valid)
        if int(jax.device_get(n_failed)) == 0:
            break
        # Pathological probe overflow at this capacity: grow and re-derive
        # (the partial insert is discarded with new_keys).
        fresh = ev.grow(fresh)
    dst = jnp.where(inserted, slots, jnp.int32(fresh.capacity))

    def put(arr, host):
        return arr.at[dst].set(jnp.asarray(host, arr.dtype), mode="drop")

    values = put(fresh.values, data["values"][idx])
    freqs = (put(fresh.freqs, data["freqs"][idx])
             if fresh.freqs is not None and "freqs" in data else fresh.freqs)
    versions = (put(fresh.versions, data["versions"][idx])
                if fresh.versions is not None and "versions" in data
                else fresh.versions)
    slots_d = dict(fresh.slots)
    for sname in fresh.slots:
        k = f"slot_{sname}"
        if k in data:
            slots_d[sname] = put(fresh.slots[sname], data[k][idx])
    return fresh.replace(
        keys=new_keys, values=values, freqs=freqs, versions=versions,
        slots=slots_d, size=fresh.size + jnp.sum(inserted).astype(jnp.int32),
    )


# ---------------------------------------------------------------------------
# incremental


def save_table_delta(path: str, table: ev.EmbeddingTable) -> ev.EmbeddingTable:
    """Dump rows touched since the last (full or delta) save; clears the
    recorder.  Returns the table with the recorder cleared."""

    if table.touched is None:
        raise ValueError(
            f"table {table.name}: incremental save requires record_touched")
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

    data = np.load(path)
    offsets = data["partition_offsets"]
    sel = [np.arange(offsets[p], offsets[p + 1])
           for p in range(SAVED_PARTITIONS) if p % num_shards == shard_index]
    idx = (np.concatenate(sel) if sel else np.arange(0)).astype(np.int64)
    if len(idx) == 0:
        return table
    keys = jnp.asarray(data["keys"][idx], table.key_dtype)
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

    values = put(table.values, data["values"][idx])
    freqs = (put(table.freqs, data["freqs"][idx])
             if table.freqs is not None and "freqs" in data else table.freqs)
    versions = (put(table.versions, data["versions"][idx])
                if table.versions is not None and "versions" in data
                else table.versions)
    slots_d = dict(table.slots)
    for sname in table.slots:
        k = f"slot_{sname}"
        if k in data:
            slots_d[sname] = put(table.slots[sname], data[k][idx])
    return table.replace(
        keys=new_keys, values=values, freqs=freqs, versions=versions,
        slots=slots_d, size=table.size + jnp.sum(inserted).astype(jnp.int32),
    )


# ---------------------------------------------------------------------------
# full TrainState checkpoints


def save_checkpoint(ckpt_dir: str, state, *, step: Optional[int] = None,
                    shrink: bool = False, tiers=None) -> str:
    """Full checkpoint of a TrainState (local or distributed).

    ``tiers`` ({table name: TieredTable} or ShardedTiers) makes the save
    tier-complete: demoted (cold) rows are walked and dumped alongside the
    hot table, matching the reference's multi-tier Save which iterates ALL
    storage levels (multi_tier_storage.h:47, embedding_var.h Save ->
    Storage::Save).  Without it a tiered job would lose every demoted row
    on restart.
    """

    step = int(state.step) if step is None else step
    d = os.path.join(ckpt_dir, f"step_{step}")
    os.makedirs(d, exist_ok=True)
    np.savez(os.path.join(d, "dense.npz"),
             **_flatten_params({"params": state.params,
                                "opt_state": state.opt_state,
                                "auc": state.auc}))
    meta = {"step": step, "tables": {}, "cold": {}}
    for name, t in state.tables.items():
        fname = f"table_{name}.npz"
        save_table(os.path.join(d, fname), t,
                   shrink_step=state.step if shrink else None)
        meta["tables"][name] = fname
    for name, tier in (tiers or {}).items():
        keys, rows, freqs = tier.export_cold()
        if len(keys) == 0:
            continue
        fname = f"cold_{name}.npz"
        np.savez(os.path.join(d, fname), keys=keys, rows=rows, freqs=freqs)
        meta["cold"][name] = {"file": fname, "row_floats": rows.shape[1]}
    with open(os.path.join(d, "meta.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(ckpt_dir, "checkpoint"), "w") as f:
        json.dump({"latest": f"step_{step}"}, f)
    return d


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    marker = os.path.join(ckpt_dir, "checkpoint")
    if not os.path.exists(marker):
        return None
    with open(marker) as f:
        return os.path.join(ckpt_dir, json.load(f)["latest"])


def restore_checkpoint(ckpt_path: str, state_template, *,
                       num_shards: int = 1, tiers=None):
    """Restore into a (possibly differently-sharded) state template.

    ``num_shards`` > 1 rebuilds each table's stacked [S, ...] layout by
    loading each shard's sub-partitions — elastic re-shard on restore.
    ``tiers`` rebuilds each table's cold store from the checkpoint's cold
    dump (tier-complete restore; pass the same mapping given to
    ``save_checkpoint``).
    """

    with open(os.path.join(ckpt_path, "meta.json")) as f:
        meta = json.load(f)
    for name, info in meta.get("cold", {}).items():
        if tiers is None or name not in tiers:
            raise ValueError(
                f"checkpoint has a cold tier for table {name!r} but no "
                "TieredTable was passed to restore it into — demoted rows "
                "would be silently lost")
        cold = np.load(os.path.join(ckpt_path, info["file"]))
        tier = tiers[name]
        if cold["rows"].shape[1] != tier.row_floats:
            raise ValueError(
                f"cold-tier row layout mismatch for {name!r}: checkpoint has "
                f"{cold['rows'].shape[1]} floats/row, tier expects "
                f"{tier.row_floats} (optimizer slot schema must match)")
        tier.import_cold(cold["keys"], cold["rows"], cold["freqs"])
    dense = dict(np.load(os.path.join(ckpt_path, "dense.npz")))
    restored_dense = _unflatten_params(
        {"params": state_template.params,
         "opt_state": state_template.opt_state,
         "auc": state_template.auc}, dense)
    tables = {}
    for name, t in state_template.tables.items():
        fname = os.path.join(ckpt_path, meta["tables"][name])
        if t.keys.ndim == 1:
            tables[name] = restore_table(fname, t, shard_index=0, num_shards=1)
        else:
            from deeprec_tpu.parallel.trainer import local_view, relift
            import jax as _jax

            s = t.keys.shape[0]
            shards = []
            tmpl = local_view(_jax.tree.map(lambda x: x[0:1], t))
            for i in range(s):
                shards.append(restore_table(fname, tmpl, shard_index=i,
                                            num_shards=s))
            # shards may differ in capacity after load-based growth: align
            cap = max(sh_.capacity for sh_ in shards)
            shards = [ev.grow(sh_, cap) if sh_.capacity < cap else sh_
                      for sh_ in shards]

            def stk(get, default=None):
                vals = [get(sh_) for sh_ in shards]
                if vals[0] is None:
                    return None
                return jnp.stack(vals)

            first = shards[0]
            tables[name] = first.replace(
                keys=stk(lambda x: x.keys),
                values=stk(lambda x: x.values),
                slots={k: stk(lambda x, k=k: x.slots[k]) for k in first.slots},
                freqs=stk(lambda x: x.freqs),
                versions=stk(lambda x: x.versions),
                touched=stk(lambda x: x.touched),
                cbf=stk(lambda x: x.cbf),
                size=stk(lambda x: x.size),
                growth_hint=stk(lambda x: x.growth_hint),
            )  # default_rows stays replicated (one copy)
    return state_template.replace(
        params=restored_dense["params"],
        opt_state=restored_dense["opt_state"],
        auc=restored_dense["auc"],
        tables=tables,
        step=jnp.asarray(meta["step"], jnp.int32),
    )
