"""Row-sharded embedding tables with all-to-all id/embedding exchange.

TPU-native replacement for BOTH of the reference's distribution planes:

  * the async parameter-server (EVs mod-sharded across PS tasks,
    worker↔PS traffic over gRPC/seastar — SURVEY.md §3.2): here the "PS"
    is the device mesh itself; each device owns the keys hashing to it and
    the exchange rides ICI via ``lax.all_to_all`` inside ``shard_map``;
  * SOK's model-parallel GPU embedding (local id bucketing → NCCL
    all-to-all ids → local lookup → all-to-all embeddings back —
    SURVEY.md §3.3): reproduced 1:1 with XLA collectives.

Everything here executes *inside* ``jax.shard_map`` over a Mesh axis: the
table pytree carries a leading shard dimension [S, ...] sharded over the
axis; per-device code sees its local [C, ...] shard.

Ragged all-to-all is handled with static per-destination capacity
(``bucket capacity``, ``bucket_factor``x the balanced load) — ids beyond
capacity fall back to "missing" semantics (default value, no update).  The
overflow count is returned in the step metrics (``n_dropped``) and
``DistributedTrainer`` reacts by widening ``bucket_factor`` and rebuilding
the step — the all-to-all analogue of the EV growth hint.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct
from jax import lax

from deeprec_tpu.embedding import table as ev
from deeprec_tpu.ops import hashing

def shard_of(keys: jnp.ndarray, num_shards: int) -> jnp.ndarray:
    """Owner shard of each key: logical-partition mod num_shards.

    Mod-sharding on the 1000-way logical partition (not the raw hash) keeps
    runtime routing aligned with reshard-on-restore, which assigns saved
    partition p to shard p % S (embedding_var_restore.cc:337-339) — a key
    restored onto shard s is exactly the key the lookup routes to s.
    """

    return hashing.logical_partition(keys) % jnp.int32(num_shards)


def bucket_capacity(n: int, num_shards: int, factor: float = 2.0) -> int:
    """Static per-destination bucket size: ``factor``x balanced load,
    8-aligned.  Forward and backward exchanges must use the same factor."""

    cap = int(factor * -(-n // num_shards)) + 8
    return min(n, (cap + 7) // 8 * 8)


class ExchangeCtx(struct.PyTreeNode):
    """Forward-pass routing state reused by the gradient exchange."""

    uids: jnp.ndarray        # [U] local unique ids
    counts: jnp.ndarray      # [U]
    inverse: jnp.ndarray     # [N] original position -> local unique row
    dest: jnp.ndarray        # [U] owner shard
    pos: jnp.ndarray         # [U] slot within the send bucket (or CAP = dropped)
    owner_lk: ev.Lookup      # owner-side Lookup over the received [S*CAP] ids
    n_dropped: jnp.ndarray   # [] int32 overflowed ids (missing semantics)


def _bucketize(uids, counts, valid, num_shards, cap, empty):
    """Pack local unique ids into a [S, CAP] send buffer, deterministically."""

    dest = shard_of(uids, num_shards)
    dest = jnp.where(valid, dest, num_shards)  # padding -> virtual shard S
    order = jnp.argsort(dest, stable=True)
    sorted_dest = dest[order]
    # rank within each destination run
    idx = jnp.arange(uids.shape[0], dtype=jnp.int32)
    run_start = jnp.searchsorted(sorted_dest, jnp.arange(num_shards + 1, dtype=sorted_dest.dtype))
    pos_sorted = idx - run_start[sorted_dest.clip(0, num_shards)]
    pos = jnp.zeros_like(idx).at[order].set(pos_sorted)
    pos = jnp.where(valid, pos, cap)
    dropped = valid & (pos >= cap)
    pos = jnp.where(pos < cap, pos, cap)

    send = jnp.full((num_shards, cap + 1), empty, uids.dtype)
    send = send.at[dest.clip(0, num_shards - 1), pos].set(
        jnp.where(dropped | ~valid, jnp.asarray(empty, uids.dtype), uids),
        mode="drop",
    )
    send_counts = jnp.zeros((num_shards, cap + 1), jnp.int32)
    send_counts = send_counts.at[dest.clip(0, num_shards - 1), pos].set(
        jnp.where(dropped | ~valid, 0, counts), mode="drop"
    )
    return (send[:, :cap], send_counts[:, :cap], dest, pos,
            jnp.sum(dropped).astype(jnp.int32))


def sharded_lookup(
    local_table: ev.EmbeddingTable,
    ids: jnp.ndarray,
    axis_name: str,
    *,
    step: jnp.ndarray | int = 0,
    train: bool = True,
    bucket_factor: float = 2.0,
    with_freqs: bool = False,
    migrate=None,
):
    """Model-parallel lookup executed per-device inside shard_map.

    Returns (new_local_table, gathered [N, D] rows for this device's batch,
    ctx for the gradient exchange) — plus, with ``with_freqs``, the owner's
    post-update frequency of every position ([N] int32, 0 for missing),
    which feeds the requester-side variant paths (dynamic-dim block masks /
    adaptive hot-cold selection: the role of EVGetFrequency,
    core/ops/kv_variable_ops.cc:74-885).  Forward data path:
      local dedup → bucket by owner → all_to_all ids over ICI →
      owner lookup-or-insert → all_to_all embeddings back → unpack.

    ``migrate``: optional owner-side hook ``(table, lk) -> table`` run after
    the lookup phase and before row collection (adaptive-embedding row
    seeding at the hot-crossing — embedding_ops.py:667 ``ev_init_value``).
    """

    num_shards = lax.psum(1, axis_name)
    ids = ids.reshape(-1).astype(local_table.key_dtype)
    empty = local_table.empty
    uids, counts, inverse = ev.unique_ids(ids, empty)
    valid = uids != empty
    cap = bucket_capacity(uids.shape[0], num_shards, bucket_factor)

    send_ids, send_counts, dest, pos, n_dropped = _bucketize(
        uids, counts, valid, num_shards, cap, empty
    )
    # ids to their owners: recv[j] = bucket sent by device j
    recv_ids = lax.all_to_all(send_ids, axis_name, 0, 0, tiled=True)
    recv_counts = lax.all_to_all(send_counts, axis_name, 0, 0, tiled=True)

    flat = recv_ids.reshape(-1)
    new_table, lk = ev.lookup_phase(
        local_table, flat, step=step, train=train,
        external_counts=recv_counts.reshape(-1),
    )
    if migrate is not None and train:
        new_table = migrate(new_table, lk)
    rows = ev.collect(new_table, lk)          # [S*CAP, D] per received position
    emb = rows.reshape(num_shards, cap, -1)
    # embeddings back to requesters
    emb_back = lax.all_to_all(emb, axis_name, 0, 0, tiled=True)
    # unpack to local unique rows; dropped/padded rows read the table's
    # missing-id default (default_value_no_permission — matching the
    # single-chip _collect for un-admitted ids, 0.0 in the default config)
    safe_dest = dest.clip(0, num_shards - 1)
    safe_pos = pos.clip(0, cap - 1)
    gathered_u = emb_back[safe_dest, safe_pos]
    ok = valid & (pos < cap)
    dvnp = jnp.asarray(local_table.option.default_value_no_permission,
                       gathered_u.dtype)
    gathered_u = jnp.where(ok[:, None], gathered_u, dvnp)
    ctx = ExchangeCtx(uids=uids, counts=counts, inverse=inverse, dest=dest,
                      pos=pos, owner_lk=lk, n_dropped=n_dropped)
    if not with_freqs:
        return new_table, gathered_u[inverse], ctx
    if new_table.freqs is None:
        raise ValueError(
            f"table {new_table.name!r}: with_freqs requires record_freq")
    safe_slot = jnp.where(lk.slot_ids < new_table.capacity, lk.slot_ids,
                          jnp.int32(new_table.capacity))
    f_owner = new_table.freqs.at[safe_slot].get(mode="fill", fill_value=0)
    f_back = lax.all_to_all(f_owner.reshape(num_shards, cap),
                            axis_name, 0, 0, tiled=True)
    f_u = jnp.where(ok, f_back[safe_dest, safe_pos], 0)
    return new_table, gathered_u[inverse], f_u[inverse], ctx


def sharded_apply(
    local_table: ev.EmbeddingTable,
    ctx: ExchangeCtx,
    grad: jnp.ndarray,
    optimizer,
    axis_name: str,
    *,
    step: jnp.ndarray | int = 0,
    use_counts: bool = False,
    bucket_factor: float = 2.0,
) -> ev.EmbeddingTable:
    """Reverse exchange: per-position grads → owner shards → sparse apply.

    ``grad`` is d(loss)/d(lookup output) with shape [N, D] (per original
    position).  Dedup to unique rows, all_to_all to owners, segment-sum per
    owner row, apply.
    """

    g_flat = grad_exchange(ctx, grad, axis_name, bucket_factor=bucket_factor)
    # per-position grads feed the apply directly: duplicate received ids are
    # summed by the dense gradient accumulation (engine v2) — no owner-side
    # segment_sum needed.
    return optimizer.apply(local_table, ctx.owner_lk, g_flat, step=step,
                           use_counts=use_counts)


def grad_exchange(ctx: ExchangeCtx, grad: jnp.ndarray, axis_name: str,
                  *, bucket_factor: float = 2.0) -> jnp.ndarray:
    """Route per-position grads to their owner shards: [N, D] local →
    [S*CAP, D] owner-side, aligned with ``ctx.owner_lk`` positions.  Split
    from ``sharded_apply`` so bounded-staleness mode can exchange THIS
    step's grads while applying the k-steps-old ones (the async-embedding
    pipeline, config.proto:328)."""

    num_shards = lax.psum(1, axis_name)
    u = ctx.uids.shape[0]
    # per-unique grads: transpose of gathered_u[inverse]
    gu = jax.ops.segment_sum(grad, ctx.inverse, num_segments=u)
    cap = bucket_capacity(u, num_shards, bucket_factor)
    ok = (ctx.pos < cap)
    send = jnp.zeros((num_shards, cap, grad.shape[-1]), grad.dtype)
    send = send.at[
        jnp.where(ok, ctx.dest.clip(0, num_shards - 1), num_shards),
        ctx.pos.clip(0, cap - 1),
    ].set(gu, mode="drop")
    recv = lax.all_to_all(send, axis_name, 0, 0, tiled=True)   # [S, CAP, D]
    return recv.reshape(num_shards * cap, -1)
