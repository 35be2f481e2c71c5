"""High-level embedding lookup: sparse combine + multi-table orchestration.

TPU-native equivalent of the reference's embedding lookup op stack:
``embedding_lookup_sparse`` / fused-embedding ops
(core/kernels/fused_embedding/, python/ops/embedding_ops.py) and the
group-embedding batched lookup (core/kernels/group_embedding/,
python/ops/group_embedding_lookup_ops.py:1-203).

Batch format: ragged per-example id lists are carried as dense ``[B, L]``
int matrices padded with the table's EMPTY sentinel — static shapes for XLA,
the padding positions contribute zero weight.  Criteo-style single-valued
features use L=1.

The forward splits into:
  * ``lookup_all``   — state-mutating id resolution for every table (the
    non-differentiable phase; one fused pass per table);
  * ``combine``      — pure, differentiable: gathered [U, D] rows →
    per-example combined activations [B, D] (sum/mean/sqrtn), whose gradient
    w.r.t. the gathered rows is exactly the sparse gradient the sparse
    optimizers consume.  XLA fuses the gather + segment ops into the
    surrounding compute.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from deeprec_tpu.config import Combiner
from deeprec_tpu.embedding import table as ev


class SparseFeature(NamedTuple):
    """One categorical feature's ids for a batch: [B] or [B, L] with padding.

    ``weights`` (optional, same shape) are per-id combiner weights
    (sparse_weights in embedding_lookup_sparse).
    """

    ids: jnp.ndarray
    weights: Optional[jnp.ndarray] = None


def _ids2d(ids: jnp.ndarray) -> jnp.ndarray:
    return ids[:, None] if ids.ndim == 1 else ids


def lookup_all(
    tables: Dict[str, ev.EmbeddingTable],
    features: Dict[str, SparseFeature],
    *,
    step: jnp.ndarray | int = 0,
    train: bool = True,
) -> Tuple[Dict[str, ev.EmbeddingTable], Dict[str, ev.Lookup], Dict[str, jnp.ndarray]]:
    """Resolve every feature's ids against its table; gather PER-POSITION
    rows.

    Returns (new_tables, lookups, gathered) where gathered[name] is the
    [N, D] differentiation boundary — one row per batch position,
    duplicates included (the v2 engine has no batch-level dedup; the
    sparse apply sums duplicate gradients — see table.Lookup's design
    note.  Round-5 review: this docstring used to promise unique [U, D]
    rows).  Multiple features may share one table
    (shared_embedding_columns) by listing the table name with a ``:``
    suffix convention handled by the caller.
    """

    new_tables = dict(tables)
    lks: Dict[str, ev.Lookup] = {}
    gathered: Dict[str, jnp.ndarray] = {}
    for name, feat in features.items():
        tname = name.split(":")[0]
        tbl = new_tables[tname]
        flat = _ids2d(feat.ids).reshape(-1)
        tbl, lk = ev.lookup_phase(tbl, flat, step=step, train=train)
        new_tables[tname] = tbl
        lks[name] = lk
        gathered[name] = ev.collect(tbl, lk)
    return new_tables, lks, gathered


def combine(
    gathered: jnp.ndarray,
    inverse: jnp.ndarray,
    feat: SparseFeature,
    empty: int,
    combiner: Combiner = Combiner.MEAN,
) -> jnp.ndarray:
    """Pure combine: [U, D] unique rows → [B, D] per-example activation.

    ``inverse`` maps this feature's flattened positions into ``gathered``
    (a slice of the group Lookup's inverse for grouped tables).  Equivalent of
    the segment-combine in FusedEmbeddingSparsePostLookUp
    (core/ops/fused_embedding_ops.cc:12-276): padding ids get weight 0; an
    all-padding example yields zeros (the fill-empty-rows behavior).
    """

    ids2 = _ids2d(feat.ids)
    b, l = ids2.shape
    emb = (gathered if inverse is None else gathered[inverse]).reshape(b, l, -1)
    if feat.weights is not None:
        w = _ids2d(feat.weights).astype(emb.dtype)
    else:
        w = jnp.ones((b, l), emb.dtype)
    w = jnp.where(ids2 == empty, jnp.zeros((), emb.dtype), w)
    out = jnp.sum(emb * w[:, :, None], axis=1)
    if combiner == Combiner.SUM:
        return out
    if combiner == Combiner.MEAN:
        denom = jnp.sum(w, axis=1, keepdims=True)
    elif combiner == Combiner.SQRTN:
        denom = jnp.sqrt(jnp.sum(w * w, axis=1, keepdims=True))
    else:
        raise ValueError(f"unknown combiner {combiner}")
    # Divide by the TRUE weight sum (embedding_lookup_sparse semantics) —
    # clamping the denominator to 1 would silently shrink activations
    # whenever an example's combiner weights sum below 1, and negative
    # weight sums are legitimate (round-4 review).  Only the all-padding /
    # zero-sum case maps to zeros.
    nz = denom != 0
    return jnp.where(nz, out / jnp.where(nz, denom, 1), 0)


def sequence_embedding(
    gathered: jnp.ndarray,
    inverse: jnp.ndarray,
    feat: SparseFeature,
    empty: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sequence (un-combined) lookup: [B, L, D] embeddings + [B, L] mask.

    The sequence_categorical_column_with_embedding / sequence_input_layer
    capability (docs_en/Embedding-Variable.md:160-176) used by DIN/DIEN/BST
    behavior-sequence models.
    """

    ids2 = _ids2d(feat.ids)
    b, l = ids2.shape
    emb = (gathered if inverse is None else gathered[inverse]).reshape(b, l, -1)
    mask = (ids2 != empty)
    return emb * mask[:, :, None].astype(emb.dtype), mask


def apply_gradients(
    tables: Dict[str, ev.EmbeddingTable],
    lks: Dict[str, ev.Lookup],
    grads: Dict[str, jnp.ndarray],
    optimizer,
    *,
    step: jnp.ndarray | int = 0,
    use_counts: bool = False,
) -> Dict[str, ev.EmbeddingTable]:
    """Apply per-table sparse gradients (grad of loss w.r.t. ``gathered``).

    When several features share a table the updates are applied sequentially —
    matching the reference's per-lookup sparse-apply ops.
    """

    new_tables = dict(tables)
    for name, g in grads.items():
        tname = name.split(":")[0]
        new_tables[tname] = optimizer.apply(
            new_tables[tname], lks[name], g, step=step, use_counts=use_counts
        )
    return new_tables
