"""Sample-aware graph compression: run shared user computation once.

The reference's ``enable_sample_awared_graph_compression``
(docs_en/Sample-awared-Graph-Compression.md) exploits ranking-batch structure
<user, N items>: the user-side subgraph executes once per user and is tiled
across that user's items.  Functional equivalent: split the model into a
user_fn over [U, ...] unique users and an item_fn over [U*N(items)], tile the
user outputs — XLA sees the deduplicated computation directly.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def compress_user_item(
    user_features,          # pytree of [B, ...] arrays, constant within a user
    user_index: jnp.ndarray,  # [B] int32 — compact user id per example
    num_users: int,           # static upper bound on unique users in batch
):
    """Compress user-side inputs: keep one row per user.

    Returns (compressed pytree [num_users, ...], expand) where
    ``expand(user_out)`` tiles per-user outputs back to [B, ...].
    """

    n = user_index.shape[0]
    # deterministic first occurrence per user: scatter-min of position
    first_pos = jnp.full((num_users,), n - 1, jnp.int32).at[user_index].min(
        jnp.arange(n, dtype=jnp.int32))
    compressed = jax.tree.map(lambda x: x[first_pos], user_features)

    def expand(user_out):
        return jax.tree.map(lambda x: x[user_index], user_out)

    return compressed, expand


def sample_aware_forward(
    user_fn: Callable,      # (user_feats [U, ...]) -> user_repr [U, D]
    item_fn: Callable,      # (item_feats [B, ...], user_repr [B, D]) -> logits
    user_features,
    item_features,
    user_index: jnp.ndarray,
    num_users: int,
):
    """Compressed ranking forward: user tower runs per-user, not per-example."""

    compressed, expand = compress_user_item(user_features, user_index, num_users)
    user_repr = user_fn(compressed)
    return item_fn(item_features, expand(user_repr))
