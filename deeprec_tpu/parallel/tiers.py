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
        self.dim = stacked.dim
        self.slot_names = tuple(sorted(stacked.slots))
        self.slot_widths = tuple(int(stacked.slots[s].shape[-1])
                                 for s in self.slot_names)
        self.row_floats = self.dim + sum(self.slot_widths) + 1
        per_shard_cap = int(stacked.keys.shape[1])
        self.cold: List[HostKV] = []
        for i in range(self.num_shards):
            kv = HostKV(self.row_floats, capacity_hint=per_shard_cap)
            if ssd_dir is not None:
                os.makedirs(ssd_dir, exist_ok=True)
                kv.enable_ssd(os.path.join(ssd_dir, f"shard{i}.log"),
                              max_dram_rows if max_dram_rows >= 0
                              else per_shard_cap)
            self.cold.append(kv)
        self.hot_watermark = hot_watermark
        self.evict_fraction = evict_fraction
        self.strategy = stacked.option.storage.cache_strategy.value
        if self.strategy == "lru" and stacked.versions is None:
            raise ValueError("CacheStrategy.LRU needs record_version=True")
        self._promote_fn = None   # compiled lazily per payload length
        self._promote_len = None
        self._demote_fns: Dict[int, object] = {}  # capacity -> compiled pair

    # -- promotion ----------------------------------------------------------

    def prepare(self, flat_ids: np.ndarray, empty: int,
                erase: bool = True) -> Optional[Dict]:
        """Route the batch's ids to their owner shards, look up each shard's
        cold store, and build a stacked [S, P, ...] promotion payload."""

        uids = np.unique(np.asarray(flat_ids))
        uids = uids[uids != empty]
        if len(uids) == 0 or all(kv.size == 0 for kv in self.cold):
            return None
        owner = shard_of_np(uids.astype(self.key_np), self.num_shards)
        per_keys, per_rows, per_freqs = [], [], []
        n_max = 0
        for s in range(self.num_shards):
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
            per_keys.append(keys)
            per_rows.append(rows)
            per_freqs.append(freqs)
            n_max = max(n_max, len(keys))
        if n_max == 0:
            return None
        pad_to = -(-n_max // PROMOTE_PAD) * PROMOTE_PAD
        S = self.num_shards
        keys = np.full((S, pad_to), empty, uids.dtype)
        rows = np.zeros((S, pad_to, self.row_floats), np.float32)
        freqs = np.zeros((S, pad_to), np.int32)
        for s in range(S):
            k = len(per_keys[s])
            keys[s, :k] = per_keys[s]
            rows[s, :k] = per_rows[s]
            freqs[s, :k] = per_freqs[s].astype(np.int64)
        return {"keys": keys, "rows": rows, "freqs": freqs}

    def promote(self, stacked: ev.EmbeddingTable,
                payload: Dict) -> ev.EmbeddingTable:
        from deeprec_tpu.parallel.trainer import (
            local_view, relift, table_pspec)

        pad_to = payload["keys"].shape[1]
        if self._promote_fn is None or self._promote_len != pad_to:
            sspec = table_pspec(stacked, self.axis)
            sn, sw, d = self.slot_names, self.slot_widths, self.dim

            def body(tbl, keys, rows, freqs):
                t = local_view(tbl)
                t = _promote_body(t, keys[0], rows[0], freqs[0],
                                  slot_names=sn, slot_widths=sw, dim=d)
                return relift(t)

            self._promote_fn = jax.jit(jax.shard_map(
                body, mesh=self.mesh,
                in_specs=(sspec, P(self.axis), P(self.axis), P(self.axis)),
                out_specs=sspec, check_vma=False))
            self._promote_len = pad_to
        sh = NamedSharding(self.mesh, P(self.axis))
        return self._promote_fn(
            stacked,
            jax.device_put(jnp.asarray(payload["keys"], stacked.key_dtype), sh),
            jax.device_put(jnp.asarray(payload["rows"]), sh),
            jax.device_put(jnp.asarray(payload["freqs"]), sh))

    # -- demotion -----------------------------------------------------------

    def needs_demote(self, stacked: ev.EmbeddingTable) -> bool:
        cap = stacked.keys.shape[1]
        max_size = int(np.max(np.asarray(jax.device_get(stacked.size))))
        hint = int(np.max(np.asarray(jax.device_get(stacked.growth_hint))))
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
        keys_h = np.asarray(jax.device_get(keys))
        rows_h = np.asarray(jax.device_get(rows))
        freqs_h = np.asarray(jax.device_get(freqs))
        empty = stacked.empty
        for s in range(self.num_shards):
            valid = keys_h[s] != empty
            if valid.any():
                self.cold[s].upsert(keys_h[s][valid].astype(np.int64),
                                    rows_h[s][valid],
                                    freqs_h[s][valid].astype(np.uint32))
        return evict_fn(stacked, mask)

    # -- checkpoint hooks (same surface as TieredTable) ---------------------

    def export_cold(self):
        """Concatenated live cold rows across every shard (keys are disjoint
        by routing)."""

        keys, rows, freqs = [], [], []
        for kv in self.cold:
            k, r, f = kv.export()
            keys.append(k); rows.append(r); freqs.append(f)
        return (np.concatenate(keys), np.concatenate(rows),
                np.concatenate(freqs))

    def import_cold(self, keys: np.ndarray, rows: np.ndarray,
                    freqs: np.ndarray) -> None:
        """Re-route a cold dump onto this mesh's shards — works across a
        reshard because routing is recomputed from the keys."""

        if not len(keys):
            return
        keys = np.asarray(keys, np.int64)
        owner = shard_of_np(keys.astype(self.key_np), self.num_shards)
        for s in range(self.num_shards):
            m = owner == s
            if m.any():
                self.cold[s].upsert(keys[m], np.asarray(rows, np.float32)[m],
                                    np.asarray(freqs, np.uint32)[m])

    def compact(self) -> int:
        return sum(kv.compact() for kv in self.cold)

    @property
    def cold_size(self) -> int:
        return sum(kv.size for kv in self.cold)
