"""Embedding variants: MultiHash, dynamic-dimension, adaptive, SimpleHashTable.

TPU-native rebuilds of the reference's specialty embedding types:

  * ``multihash_lookup`` — MultiHashVariable (kv_variable_ops.py:986,
    get_multihash_variable variable_scope.py:2317): Q-R compositional
    embeddings; an id maps to (quotient, remainder) rows in two small dense
    tables combined by add/mult/concat — memory O(2·sqrt(N)) instead of O(N).
  * ``dynamic_dim_lookup`` — DynamicEmbeddingVariable
    (kv_variable_ops.py:1000, embedding_lookup_sparse_multi_dim
    embedding_ops.py:903): frequency-adaptive dimensions; each id uses its
    first ``blocknums[i]`` blocks of the max-dim embedding, the rest masked.
  * ``adaptive_embedding_lookup`` — adaptive_embedding (embedding_ops.py:667,
    feature_column_v2.py:2089): hot ids (freq >= threshold) read/train the
    collision-free EV; cold ids fall back to a small hash-bucket dense
    Variable where collisions are acceptable.
  * ``SimpleHashTable`` — the HashTable-v2 "tensible" subsystem
    (hash_table.py:46,142): a general int64→vector store with insert/lookup/
    erase/export built on the same device hash table.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from deeprec_tpu import config as cfg
from deeprec_tpu.embedding import table as ev
from deeprec_tpu.ops import hashing


# ---------------------------------------------------------------------------
# MultiHash (Q-R) compositional embeddings


def multihash_split(ids: jnp.ndarray, bucket_sizes: Sequence[int],
                    strategy: str = "Q-R") -> Tuple[jnp.ndarray, ...]:
    """Component indices per partition (complementary Q-R decomposition)."""

    if strategy != "Q-R":
        raise ValueError(f"unknown strategy {strategy}")
    q = bucket_sizes[1]
    outs = []
    for i, b in enumerate(bucket_sizes):
        if i == 0:
            outs.append((ids // q) % b)
        else:
            outs.append(ids % b)
    return tuple(outs)


def multihash_lookup(tables: Sequence[jnp.ndarray], ids: jnp.ndarray,
                     operation: str = "add",
                     strategy: str = "Q-R") -> jnp.ndarray:
    """ids [N] -> [N, D] (or [N, sum(D)] for concat) from component tables."""

    sizes = [int(t.shape[0]) for t in tables]
    parts = multihash_split(ids.reshape(-1), sizes, strategy)
    rows = [t[p] for t, p in zip(tables, parts)]
    if operation == "add":
        out = rows[0]
        for r in rows[1:]:
            out = out + r
        return out
    if operation == "mult":
        out = rows[0]
        for r in rows[1:]:
            out = out * r
        return out
    if operation == "concat":
        return jnp.concatenate(rows, axis=-1)
    raise ValueError(f"unknown operation {operation}")


# ---------------------------------------------------------------------------
# Dynamic-dimension embeddings


def dynamic_dim_lookup(table: ev.EmbeddingTable, lk: ev.Lookup,
                       blocknums: jnp.ndarray, block_dim: int) -> jnp.ndarray:
    """Gather with per-id effective dims: id i reads its first
    ``blocknums[i]`` blocks of ``block_dim`` floats; the tail is zeroed.

    ``blocknums`` aligns with the ORIGINAL id order ([N] like lk.inverse).
    """

    g = ev.collect(table, lk)[lk.inverse]         # [N, D]
    return apply_block_mask(g, blocknums, block_dim)


def apply_block_mask(rows: jnp.ndarray, blocknums: jnp.ndarray,
                     block_dim: int) -> jnp.ndarray:
    """Zero every block past each row's blocknum — THE dynamic-dim mask,
    shared by the single-chip and sharded paths (round-5 review: a copy
    in parallel/trainer.py could silently diverge)."""

    n, d = rows.shape
    nblocks = d // block_dim
    blk = jax.lax.broadcasted_iota(jnp.int32, (n, nblocks), 1)
    mask = jnp.repeat(blk < blocknums[:, None], block_dim, axis=1)
    return rows * mask.astype(rows.dtype)


def blocknums_from_freq(freq: jnp.ndarray,
                        thresholds: Sequence[int]) -> jnp.ndarray:
    """#thresholds crossed + 1, from a frequency array (shared by both
    paths — see apply_block_mask)."""

    bn = jnp.ones_like(freq)
    for t in thresholds:
        bn = bn + (freq >= t).astype(bn.dtype)
    return bn


def frequency_blocknums(table: ev.EmbeddingTable, ids: jnp.ndarray,
                        thresholds: Sequence[int]) -> jnp.ndarray:
    """Derive blocknums from accumulated frequency: #thresholds crossed + 1
    (the frequency-adaptive policy of dynamic-dim EV)."""

    return blocknums_from_freq(ev.get_frequency(table, ids), thresholds)


# ---------------------------------------------------------------------------
# Adaptive embedding (static Variable + EV behind one lookup)


def adaptive_embedding_lookup(
    table: ev.EmbeddingTable,
    static_table: jnp.ndarray,      # [num_buckets, D] dense Variable
    ids: jnp.ndarray,
    *,
    freq_threshold: int,
    step: jnp.ndarray | int = 0,
    train: bool = True,
) -> Tuple[ev.EmbeddingTable, jnp.ndarray, ev.Lookup, jnp.ndarray]:
    """Route hot ids to the EV, cold ids to the hash-bucket static table.

    Returns (new_table, emb [N, D], lookup, use_ev_mask [N]).  The gradient
    story matches the reference: grads w.r.t. the returned emb flow to the EV
    rows for hot ids (via the Lookup) and to the static table for cold ids
    (via standard autodiff on ``static_table``).
    """

    ids = ids.reshape(-1)
    table, lk = ev.lookup_phase(table, ids, step=step, train=train)
    freq = table.freqs.at[
        jnp.where(lk.slot_ids < table.capacity, lk.slot_ids, table.capacity)
    ].get(mode="fill", fill_value=0)
    hot_u = freq >= freq_threshold
    hot = hot_u[lk.inverse]
    ev_rows = ev.collect(table, lk)[lk.inverse]
    buckets = hashing.bucket(ids, static_table.shape[0], salt=3)
    static_rows = static_table[buckets]
    emb = jnp.where(hot[:, None], ev_rows.astype(static_rows.dtype),
                    static_rows)
    return table, emb, lk, hot


# ---------------------------------------------------------------------------
# SimpleHashTable (HashTable v2)


class SimpleHashTable:
    """General int→vector hash table with the EV engine underneath.

    Functional-state wrapper (each mutating call returns a new handle), the
    ``tf.hash_table.HashTable`` surface: lookup(default), insert, erase,
    export; optional Bloom admission via the table option
    (BloomFilterAdmitStrategy role).
    """

    def __init__(self, dim: int, *, capacity: int = 2 ** 12,
                 key_dtype=jnp.int32,
                 option: Optional[cfg.EmbeddingVariableOption] = None,
                 _table: Optional[ev.EmbeddingTable] = None):
        self._t = _table if _table is not None else ev.create(
            "simple_hash_table", dim,
            key_dtype=key_dtype,
            option=option or cfg.EmbeddingVariableOption(
                init=cfg.InitializerOption(initializer="zeros")),
            capacity=capacity)

    def _wrap(self, t):
        return SimpleHashTable(self._t.dim, _table=t)

    @property
    def size(self) -> int:
        return int(self._t.size)

    def insert(self, keys, values) -> "SimpleHashTable":
        """Deterministic upsert (round-4 review): a near-full table grows
        and RETRIES until every key lands (no silent drops), and when the
        batch contains duplicate keys the LAST occurrence wins on every
        backend (XLA's duplicate-index scatter order is unspecified)."""

        keys = jnp.asarray(keys).reshape(-1)
        t = self._t
        while True:
            t2, lk = ev.lookup_phase(t, keys, train=True)
            # PROBE failures only (growth_hint delta): a blanket
            # "valid & slot >= capacity" also counts ADMISSION-DENIED keys
            # (Bloom/counter filter below threshold), which no amount of
            # growth resolves — the loop would double capacity per retry
            # until repeated CBF re-adds crossed the threshold, inflating
            # the table ~2^filter_freq x for one insert (round-5 review).
            n_failed = (int(jax.device_get(t2.growth_hint))
                        - int(jax.device_get(t.growth_hint)))
            if n_failed == 0:
                t = t2
                break
            # grow keeps already-landed keys; the retry resolves the rest
            t = ev.grow(t2)
        ok = lk.valid & (lk.slot_ids < t.capacity)
        dst = jnp.where(ok, lk.slot_ids, jnp.int32(t.capacity))
        order = jnp.argsort(dst, stable=True)
        sdst = dst[order]
        is_last = jnp.concatenate(
            [sdst[1:] != sdst[:-1], jnp.ones((1,), bool)])
        last = jnp.zeros_like(ok).at[order].set(is_last)
        dst = jnp.where(last, dst, jnp.int32(t.capacity))
        vals = jnp.asarray(values, t.value_dtype).reshape(keys.shape[0], -1)
        t = t.replace(values=t.values.at[dst].set(vals, mode="drop"))
        return self._wrap(ev.maybe_grow(t))

    def lookup(self, keys, default: float = 0.0):
        keys = jnp.asarray(keys).reshape(-1)  # accept lists, like insert
        _, lk = ev.lookup_phase(self._t, keys, train=False)
        g = ev.collect(self._t, lk)
        found = (lk.slot_ids < self._t.capacity)[lk.inverse]
        rows = g[lk.inverse]
        rows = jnp.where(found[:, None], rows,
                         jnp.asarray(default, rows.dtype))
        return rows, found

    def erase(self, keys) -> "SimpleHashTable":
        return self._wrap(ev.remove(self._t, jnp.asarray(keys).reshape(-1)))

    def export(self):
        keys, values, _, _, live = ev.export_live(self._t)
        import numpy as np

        live = np.asarray(live)
        return np.asarray(keys)[live], np.asarray(values)[live]
