"""Multi-tier embedding storage: HBM-hot device table + host DRAM/SSD cold.

TPU-native re-design of the reference's MultiTierStorage
(multi_tier_storage.h:47, hbm_dram_storage.h:37, dram_ssd_storage.h) with the
same invariants:

  * **updates always land in tier-0** (the device table) so training math is
    unchanged (docs_zh/Multi-tier-Embedding-Storage.md §1);
  * cold rows live in the native host KV (native/host_kv.cc — DRAM arena with
    optional SSD append-log, CLOCK eviction, compaction);
  * **promotion is prefetch-driven**: the ids of the *next* batch are known on
    the host before the step runs (the AddToCachePrefetchList pattern,
    embedding_var.h:259), so cold hits are fetched and bulk-upserted into the
    device table off the critical path — no host round-trip inside the step;
  * **demotion** replaces growth when the hot tier is at its HBM budget: the
    lowest-frequency live rows are flushed down (EvictionManager role,
    eviction_manager.h:39) and the device table is rebuilt tombstone-free.

Row layout in the cold store: [values | slot_0 | ... | slot_k | version] as
flat f32 (version bitcast), freq carried natively by the KV.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deeprec_tpu.data.native import HostKV
from deeprec_tpu.embedding import table as ev

# Promotion payloads are padded to multiples of this to bound recompiles.
PROMOTE_PAD = 2048


def _EMPTY64(dtype) -> int:
    return int(np.iinfo(dtype).min)


class TieredTable:
    """Host-side coordinator for one physical table's cold tier."""

    def __init__(self, table: ev.EmbeddingTable, *,
                 ssd_path: Optional[str] = None,
                 max_dram_rows: int = -1,
                 hot_watermark: float = 0.85,
                 evict_fraction: float = 0.3):
        self.dim = table.dim
        self.slot_names = tuple(sorted(table.slots))
        self.slot_widths = tuple(int(table.slots[s].shape[-1])
                                 for s in self.slot_names)
        self.row_floats = (self.dim + sum(self.slot_widths) + 1)
        self.cold = HostKV(self.row_floats, capacity_hint=table.capacity)
        if ssd_path is not None:
            self.cold.enable_ssd(ssd_path, max_dram_rows
                                 if max_dram_rows >= 0 else table.capacity)
        self.hot_watermark = hot_watermark
        self.evict_fraction = evict_fraction
        self.strategy = table.option.storage.cache_strategy.value
        if self.strategy == "lru" and table.versions is None:
            raise ValueError(
                "CacheStrategy.LRU needs the versions plane — set "
                "record_version=True on the table option")
        if table.freqs is None:
            # demote selection, the commit mask and HostKV freqs all read
            # table.freqs unconditionally — fail at construction, not hours
            # later inside the first demotion's jit trace (round-4 review)
            raise ValueError(
                "tiered storage needs the freqs plane — set "
                "record_freq=True on the table option")
        # background upsert lane (concurrent demotion, EvictionManager role)
        import concurrent.futures as _cf
        import threading as _th

        self._bg = _cf.ThreadPoolExecutor(max_workers=1)
        self._inflight = None          # (future, key set) of a running upsert
        self._inflight_mu = _th.Lock()

    # -- background-upsert barrier -------------------------------------------

    def _join_inflight(self) -> None:
        with self._inflight_mu:
            inflight, self._inflight = self._inflight, None
        if inflight is not None:
            inflight[0].result()

    def _inflight_hits(self, uids: np.ndarray) -> bool:
        with self._inflight_mu:
            if self._inflight is None:
                return False
            if self._inflight[0].done():
                # upsert landed: surface any error, clear the record —
                # otherwise the membership scan below repeats for every
                # batch until the next demote/ckpt (round-5 review)
                fut, self._inflight = self._inflight[0], None
                fut.result()
                return False
            keyset = self._inflight[1]
        # C-level set disjointness, not a Python per-id loop (~200k
        # uniques per behavior batch on the prefetch thread)
        return not keyset.isdisjoint(uids.tolist())

    # -- promotion (prefetch thread) ---------------------------------------

    def prepare(self, flat_ids: np.ndarray, empty: int,
                erase: bool = True) -> Optional[Dict]:
        """Find the batch's cold-resident ids and build a promotion payload
        (device upsert happens at step time).

        erase=True (training): move semantics — the hot copy becomes
        authoritative (updates always land in tier-0).  erase=False (eval /
        serving read-through): the cold store keeps the row; the promoted
        copy is transient."""

        uids = np.unique(flat_ids)
        uids = uids[uids != empty]
        if len(uids) == 0:
            return None
        # read barrier: if a background demotion upsert is still landing and
        # this batch asks for one of its victims, wait for it — the victim is
        # no longer hot, so the cold store MUST hold it before the lookup.
        # (Victims are cold by construction, so this almost never fires.)
        if self._inflight_hits(uids):
            self._join_inflight()
        if self.cold.size == 0:
            return None
        rows, freqs, found = self.cold.lookup(uids.astype(np.int64),
                                              erase=erase)
        n = int(found.sum())
        if n == 0:
            return None
        keys = uids[found]
        rows = rows[found]
        freqs = freqs[found]
        pad = -len(keys) % PROMOTE_PAD
        if pad:
            keys = np.concatenate([keys, np.full(pad, empty, keys.dtype)])
            rows = np.concatenate([rows, np.zeros((pad, self.row_floats),
                                                  np.float32)])
            freqs = np.concatenate([freqs, np.zeros(pad, np.uint32)])
        return {"keys": keys, "rows": rows, "freqs": freqs.astype(np.int32)}

    # -- device ops ---------------------------------------------------------

    def promote(self, table: ev.EmbeddingTable, payload: Dict) -> ev.EmbeddingTable:
        table, failed = _promote_jit(
            table, jnp.asarray(payload["keys"], table.key_dtype),
            jnp.asarray(payload["rows"]), jnp.asarray(payload["freqs"]),
            slot_names=self.slot_names,
            slot_widths=self.slot_widths, dim=self.dim)
        failed = np.asarray(jax.device_get(failed))
        if failed.any():
            # prepare(erase=True) already removed these rows from the cold
            # store but the hot insert did not land — put them back so
            # nothing learned is lost; growth_hint is bumped device-side,
            # so needs_demote/maybe_grow relieves the pressure.
            self.cold.upsert(
                np.asarray(payload["keys"])[failed].astype(np.int64),
                np.asarray(payload["rows"])[failed],
                np.asarray(payload["freqs"])[failed].astype(np.uint32))
        return table

    def needs_demote(self, table: ev.EmbeddingTable) -> bool:
        return (ev.load_factor(table) > self.hot_watermark
                or int(jax.device_get(table.growth_hint)) > 0)

    def demote(self, table: ev.EmbeddingTable) -> ev.EmbeddingTable:
        """Flush the coldest rows down-tier; rebuild the hot table."""

        self._join_inflight()
        k = max(1, int(table.capacity * self.evict_fraction))
        keys, rows, freqs, idx, mask = _demote_select(
            table, k, slot_names=self.slot_names,
            slot_widths=self.slot_widths, dim=self.dim,
            strategy=self.strategy)
        keys_h = np.asarray(jax.device_get(keys))
        rows_h = np.asarray(jax.device_get(rows))
        freqs_h = np.asarray(jax.device_get(freqs))
        valid = keys_h != table.empty
        if valid.any():
            self.cold.upsert(keys_h[valid].astype(np.int64), rows_h[valid],
                             freqs_h[valid].astype(np.uint32))
        table = ev._apply_evict(table, mask)
        return ev._rebuild(table, table.capacity)

    # -- background (two-phase) demotion ------------------------------------
    # The reference evicts from a shared background thread pool
    # (eviction_manager.h:39, TF_MULTI_TIER_EV_EVICTION_THREADS) so the
    # training step never pays the down-tier copy.  Functional-JAX shape of
    # the same idea: ``begin_demote`` dispatches the victim selection and
    # starts the device->host copy of the victims' rows, then training steps
    # proceed while the transfer drains; ``finish_demote`` (a later
    # between-steps call) commits — but only for victims whose key AND
    # frequency are unchanged since the snapshot, because a touched victim's
    # exported row is stale (tier-0 got updates) and its warmth disqualifies
    # it anyway.  Touched victims simply stay hot for the next round.
    # Slot indices stay valid across the window: the table is only rebuilt
    # by demote/grow, which cannot interleave (both run under the trainer's
    # tier lock from the same host loop).

    def begin_demote(self, table: ev.EmbeddingTable) -> None:
        """Phase A: select victims + start their async device->host copy."""

        if getattr(self, "_pending", None) is not None:
            return
        k = max(1, int(table.capacity * self.evict_fraction))
        keys, rows, freqs, idx, _ = _demote_select(
            table, k, slot_names=self.slot_names,
            slot_widths=self.slot_widths, dim=self.dim,
            strategy=self.strategy)
        for arr in (keys, rows, freqs, idx):
            try:
                arr.copy_to_host_async()
            except Exception:
                pass                     # backend without async copy: the
        self._pending = (keys, rows, freqs, idx)   # fetch blocks at finish

    @property
    def has_pending_demote(self) -> bool:
        return getattr(self, "_pending", None) is not None

    def finish_demote(self, table: ev.EmbeddingTable) -> ev.EmbeddingTable:
        """Phase B: commit untouched victims down-tier, rebuild the hot
        table.  Must run between steps (the caller holds the tier lock).

        Only DEVICE work happens here (commit-mask + evict + rebuild are
        dispatched async); the host side — draining the victims' D2H copy
        and inserting them into the cold KV — runs on the background lane,
        fully overlapped with the next training steps (the reference's
        EvictionManager thread pool, eviction_manager.h:39).  Exactness: the
        victims are already gone from the hot table when the upsert runs,
        so ``prepare`` takes a read barrier if a batch asks for an in-flight
        victim; checkpoint/compact join the lane first."""

        keys, rows, freqs, idx = self._pending
        self._pending = None
        ok, mask = _demote_commit_mask(table, keys, freqs, idx)
        # small sync: #committable victims ([] int32 — blocks on the commit
        # compute, NOT on the big row transfer)
        if int(jax.device_get(jnp.sum(ok))) == 0:
            return table                 # all victims touched: stay hot
        keys_h = np.asarray(jax.device_get(keys))  # [k] ints — small

        def upsert():
            rows_h = np.asarray(jax.device_get(rows))
            freqs_h = np.asarray(jax.device_get(freqs))
            ok_h = np.asarray(jax.device_get(ok))
            if ok_h.any():
                self.cold.upsert(keys_h[ok_h].astype(np.int64),
                                 rows_h[ok_h],
                                 freqs_h[ok_h].astype(np.uint32))

        self._join_inflight()           # one lane: previous batch landed
        keyset = {int(k) for k in keys_h if k != _EMPTY64(keys_h.dtype)}
        with self._inflight_mu:
            self._inflight = (self._bg.submit(upsert), keyset)
        table = ev._apply_evict(table, mask)
        return ev._rebuild(table, table.capacity)

    # -- checkpoint hooks ---------------------------------------------------

    def export_cold(self):
        self._join_inflight()   # checkpoint completeness: all demotions landed
        return self.cold.export()

    def import_cold(self, keys: np.ndarray, rows: np.ndarray,
                    freqs: np.ndarray) -> None:
        """Rebuild the cold store from a checkpoint's cold dump
        (tier-complete restore; the inverse of export_cold)."""

        if len(keys):
            self.cold.upsert(np.asarray(keys, np.int64),
                             np.asarray(rows, np.float32),
                             np.asarray(freqs, np.uint32))

    def compact(self) -> int:
        self._join_inflight()
        return self.cold.compact()


def _promote_body(table, keys, rows, freqs, *, slot_names, slot_widths, dim):
    """-> (table, failed [N] bool).  ``failed`` marks payload keys that
    could not land (hot table full / probe chain exhausted) — the caller
    must keep or restore their cold copies, or the learned rows are lost
    (round-4 review).  Failures also ride ``growth_hint`` so the widen /
    demote pressure valves fire."""

    valid = keys != table.empty
    new_keys, slots, inserted, n_failed = ev._find_or_insert(
        table.keys, keys, valid, valid)
    failed = valid & (slots >= table.capacity)
    # only rows NOT already hot are written (device copy is authoritative)
    write = inserted
    dst = jnp.where(write, slots, jnp.int32(table.capacity))
    off = 0
    values = table.values.at[dst].set(
        rows[:, off:off + dim].astype(table.value_dtype), mode="drop")
    off += dim
    slots_d = dict(table.slots)
    for name, w in zip(slot_names, slot_widths):
        slots_d[name] = table.slots[name].at[dst].set(
            rows[:, off:off + w].astype(table.slots[name].dtype),
            mode="drop")
        off += w
    versions = table.versions
    if versions is not None:
        ver = jax.lax.bitcast_convert_type(rows[:, off], jnp.int32)
        versions = versions.at[dst].set(ver, mode="drop")
    fr = table.freqs
    if fr is not None:
        fr = fr.at[dst].set(freqs, mode="drop")
    touched = table.touched
    if touched is not None:
        # a promoted row must land in the next incremental delta: its
        # cold copy was erased (move semantics), so a full+delta restore
        # that misses it would resurrect only the stale pre-promotion
        # state — same invariant as lookup-phase inserts (table.py
        # round-4 fix; round-5 review)
        touched = touched.at[dst].set(True, mode="drop")
    return table.replace(
        keys=new_keys, values=values, slots=slots_d, versions=versions,
        freqs=fr, touched=touched,
        size=table.size + jnp.sum(inserted).astype(jnp.int32),
        growth_hint=table.growth_hint + n_failed.astype(jnp.int32),
    ), failed


# jitted wrapper for the single-table path; the sharded path calls the raw
# body inside shard_map (parallel/tiers.py).
_promote_jit = jax.jit(
    _promote_body, static_argnames=("slot_names", "slot_widths", "dim"))


def _demote_select_body(table, k, *, slot_names, slot_widths, dim,
                        strategy="lfu"):
    """Pick the k coldest live slots; pack their rows.

    ``strategy`` maps CacheStrategy (config.proto:39-42, cache.h:133/272):
    "lfu" scores by access frequency, "lru" by last-touched step (the
    versions plane, updated on every training touch)."""

    live = table.keys != table.empty
    if strategy == "lru":
        score = table.versions
    else:
        score = table.freqs
    score = jnp.where(live, score, jnp.iinfo(jnp.int32).max)
    _, idx = jax.lax.top_k(-score, k)         # k coldest
    sel_live = live[idx]
    keys = jnp.where(sel_live, table.keys[idx],
                     jnp.asarray(table.empty, table.key_dtype))
    parts = [table.values[idx].astype(jnp.float32)]
    for name in slot_names:
        parts.append(table.slots[name][idx].astype(jnp.float32))
    ver = (table.versions[idx] if table.versions is not None
           else jnp.zeros((k,), jnp.int32))
    parts.append(jax.lax.bitcast_convert_type(ver, jnp.float32)[:, None])
    rows = jnp.concatenate(parts, axis=1)
    freqs = table.freqs[idx]
    mask = jnp.zeros((table.capacity,), jnp.bool_).at[
        jnp.where(sel_live, idx, table.capacity)].set(True, mode="drop")
    return keys, rows, freqs, idx, mask


_demote_select = jax.jit(
    _demote_select_body,
    static_argnames=("k", "slot_names", "slot_widths", "dim", "strategy"))


@jax.jit
def _demote_commit_mask(table, keys, freqs_snap, idx):
    """Which snapshot victims are still safely demotable: key unchanged at
    its slot AND frequency unchanged (any training touch bumps freq, so
    freq-equality proves the exported row is still the authoritative one)."""

    cur_keys = table.keys[idx]
    cur_freqs = table.freqs[idx]
    ok = ((keys != table.empty) & (cur_keys == keys)
          & (cur_freqs == freqs_snap))
    mask = jnp.zeros((table.capacity,), jnp.bool_).at[
        jnp.where(ok, idx, table.capacity)].set(True, mode="drop")
    return ok, mask
