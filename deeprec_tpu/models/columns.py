"""Feature-column transforms: crossed, bucketized, weighted.

The reference exposes these as tf.feature_column graph builders
(python/feature_column/feature_column_v2.py: ``crossed_column``,
``bucketized_column``, ``weighted_categorical_column``); here they are
declarative ``TableSpec`` fields resolved into plain id arrays at batch
time.  One implementation serves both worlds:

  * **device** (jnp): inside the jitted train/eval step — the hash mix and
    searchsorted fuse into the surrounding XLA program, so a derived
    column costs a handful of elementwise ops, never a host round-trip;
  * **host** (np): the tiered-storage prefetch must know the step's table
    keys before the step runs (``host_group_keys``) — the numpy twins of
    the hash primitives guarantee bit-identical ids on both paths.

Crossed ids combine the component columns' salted hashes with an
iterated multiply-xor (every component avalanches through
``hash_to_u32``), then range-reduce into ``cross_buckets``.  Padding
propagates: a position where ANY component equals its EMPTY sentinel
yields the int32 EMPTY sentinel (the lookup's masked-position semantics,
matching SparseTensor dropout of missing cross components).
"""

from __future__ import annotations

from typing import Optional

from deeprec_tpu.ops import hashing

# multiply-accumulate constant for combining component hashes (Knuth's
# 2^32 golden-ratio multiplier — any odd constant works; fixed so device
# and host agree and checkpoints stay stable across versions)
_CROSS_MULT = 0x9E3779B1


def has_derived(spec) -> bool:
    return bool(getattr(spec, "cross", ()) or
                getattr(spec, "bucket_boundaries", ()))


def feature_shape(spec, batch):
    """Shape of this spec's derived/raw id array (host-side metadata)."""

    import numpy as np

    if getattr(spec, "cross", ()):
        return np.shape(batch["cat"][spec.cross[0]])
    if getattr(spec, "bucket_boundaries", ()):
        return np.shape(batch["dense"])[:1]
    return np.shape(batch["cat"][spec.feature or spec.name])


def feature_ids(spec, col: Optional[str], batch, xp):
    """The id array feeding table column ``col`` (None/name = primary).

    ``xp`` is ``jax.numpy`` on the device path or ``numpy`` on the host
    path — outputs are bit-identical.
    """

    if col is not None:
        # Shared-feature extras are ALWAYS raw batch columns — the derived
        # transform applies only to the spec's primary column.  (Without
        # this, host_group_keys would derive ids for extras while the
        # device path feeds raw ids, de-syncing the tiered prefetch.)
        return batch["cat"][col]
    cross = getattr(spec, "cross", ())
    bounds = getattr(spec, "bucket_boundaries", ())
    if not cross and not bounds:
        return batch["cat"][spec.feature or spec.name]
    is_np = xp.__name__ == "numpy"
    h2u = hashing.hash_to_u32_np if is_np else hashing.hash_to_u32
    if cross:
        acc = None
        empty_mask = None
        for i, c in enumerate(cross):
            ids = batch["cat"][c]
            if is_np:
                ids = xp.asarray(ids)
            emp = xp.iinfo(ids.dtype).min
            m = ids == emp
            empty_mask = m if empty_mask is None else (empty_mask | m)
            h = h2u(ids, salt=211 + i)
            acc = h if acc is None else (
                acc * xp.uint32(_CROSS_MULT)) ^ h
        nb = int(spec.cross_buckets)
        if nb & (nb - 1) == 0:
            out = (acc & xp.uint32(nb - 1)).astype(xp.int32)
        else:
            out = (acc % xp.uint32(nb)).astype(xp.int32)
        return xp.where(empty_mask, xp.int32(xp.iinfo(xp.int32).min), out)
    # bucketized: bucket index of the dense scalar column (boundaries[j-1]
    # <= x < boundaries[j] -> id j, matching bucketized_column's intervals)
    x = batch["dense"][:, spec.numeric_feature]
    if is_np:
        x = xp.asarray(x)
    b = xp.asarray(list(bounds), x.dtype)
    return xp.searchsorted(b, x, side="right").astype(xp.int32)


def feature_weights(spec, batch):
    """Combiner weights for weighted_categorical_column specs (or None)."""

    w = getattr(spec, "weight_feature", None)
    if w is None:
        return None
    src = batch.get("weights", {})
    return src[w] if w in src else batch["cat"][w]
