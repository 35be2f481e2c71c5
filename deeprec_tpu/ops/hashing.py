"""Integer hash mixers used by the embedding hash tables and Bloom filters.

These are the TPU-native replacement for the reference's CPU/GPU hash maps'
hashing (sparsehash dense_hash_map_lockless in cpu_hash_map_kv.h:25 and
cuCollections murmurhash in gpu_hash_table.cu.cc).  Everything here is pure
jnp on unsigned integers so it vectorizes on the VPU and works identically
inside Pallas kernels.
"""

from __future__ import annotations

import jax.numpy as jnp


def mix32(x: jnp.ndarray) -> jnp.ndarray:
    """Murmur3 fmix32 finalizer — a full-avalanche 32-bit mixer."""

    x = x.astype(jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def mix64(x: jnp.ndarray) -> jnp.ndarray:
    """splitmix64 finalizer (requires x64 enabled)."""

    x = x.astype(jnp.uint64)
    x = x ^ (x >> 30)
    x = x * jnp.uint64(0xBF58476D1CE4E5B9)
    x = x ^ (x >> 27)
    x = x * jnp.uint64(0x94D049BB133111EB)
    x = x ^ (x >> 31)
    return x


def hash_to_u32(keys: jnp.ndarray, salt: int = 0) -> jnp.ndarray:
    """Hash integer keys (int32 or int64) to uint32 with a salt.

    For int64 keys both halves are mixed so the full key space avalanches.
    """

    if keys.dtype in (jnp.int64, jnp.uint64):
        s64 = (salt * 0x9E3779B97F4A7C15 + 1) & 0xFFFFFFFFFFFFFFFF
        h = mix64(keys.astype(jnp.uint64) ^ jnp.uint64(s64))
        return (h ^ (h >> 32)).astype(jnp.uint32)
    s32 = (salt * 0x9E3779B9 + 1) & 0xFFFFFFFF
    h = mix32(keys.astype(jnp.uint32) ^ jnp.uint32(s32))
    return h


# Logical checkpoint partitions (kSavedPartitionNum, kv_interface.h:26).
# Runtime shard routing MUST be a function of this partition so that
# reshard-on-restore (partition p -> shard p % S) agrees with lookup routing.
SAVED_PARTITIONS = 1000
PARTITION_SALT = 31


def logical_partition(keys: jnp.ndarray) -> jnp.ndarray:
    """Key -> logical checkpoint partition in [0, 1000)."""

    return bucket(keys, SAVED_PARTITIONS, salt=PARTITION_SALT)


def bucket(keys: jnp.ndarray, num_buckets: int, salt: int = 0) -> jnp.ndarray:
    """Map keys to [0, num_buckets). num_buckets need not be a power of two."""

    h = hash_to_u32(keys, salt)
    if num_buckets & (num_buckets - 1) == 0:
        return (h & jnp.uint32(num_buckets - 1)).astype(jnp.int32)
    # Plain modulo (NOT Lemire fast-range): the numpy twin bucket_np must
    # stay bit-identical for reshard-on-restore routing, and % is the
    # simplest form that matches on both.
    return (h % jnp.uint32(num_buckets)).astype(jnp.int32)


# ---------------------------------------------------------------------------
# numpy twins — bit-identical to the jnp versions, for host-side threads
# (tier prefetch routing, checkpoint partitioning) that must not pay a
# device dispatch per call.


def _np():
    import numpy as np

    return np


def hash_to_u32_np(keys, salt: int = 0):
    np = _np()
    keys = np.asarray(keys)
    with np.errstate(over="ignore"):
        if keys.dtype in (np.int64, np.uint64):
            s64 = np.uint64((salt * 0x9E3779B97F4A7C15 + 1)
                            & 0xFFFFFFFFFFFFFFFF)
            x = keys.astype(np.uint64) ^ s64
            x = x ^ (x >> np.uint64(30)); x = x * np.uint64(0xBF58476D1CE4E5B9)
            x = x ^ (x >> np.uint64(27)); x = x * np.uint64(0x94D049BB133111EB)
            x = x ^ (x >> np.uint64(31))
            return (x ^ (x >> np.uint64(32))).astype(np.uint32)
        s32 = np.uint32((salt * 0x9E3779B9 + 1) & 0xFFFFFFFF)
        x = keys.astype(np.uint32) ^ s32
        x = x ^ (x >> np.uint32(16)); x = x * np.uint32(0x85EBCA6B)
        x = x ^ (x >> np.uint32(13)); x = x * np.uint32(0xC2B2AE35)
        x = x ^ (x >> np.uint32(16))
        return x


def bucket_np(keys, num_buckets: int, salt: int = 0):
    np = _np()
    h = hash_to_u32_np(keys, salt)
    if num_buckets & (num_buckets - 1) == 0:
        return (h & np.uint32(num_buckets - 1)).astype(np.int32)
    return (h % np.uint32(num_buckets)).astype(np.int32)


def logical_partition_np(keys):
    return bucket_np(keys, SAVED_PARTITIONS, salt=PARTITION_SALT)
