"""Device-resident collision-free hash embedding table — the EmbeddingVariable.

TPU-native re-design of the reference's EmbeddingVar engine
(core/framework/embedding/embedding_var.h:53, kv_interface.h:42,
cpu_hash_map_kv.h:25).  Instead of a C++ lockless hash map mutated in place by
op kernels, the table is an immutable JAX pytree of fixed-capacity arrays
living in TPU HBM, updated functionally inside jit:

  * ``keys``     [C]    — open-addressing (triangular-probe) hash table.
  * ``values``   [C, D] — embedding rows, row i belongs to ``keys[i]``.
  * ``slots``    {name: [C, D]} — optimizer slot variables (accumulators etc.)
                 sharing the key space, like the reference's "slot EVs saved as
                 <name>/Adagrad" (docs_en/Embedding-Variable-Export-Format.md).
  * ``freqs`` / ``versions`` [C] — the FeatureDescriptor metadata plane
    (feature_descriptor.h:39): access counts and last-update step, powering
    admission filters, WithCounts optimizers, TTL eviction and tiering.
  * ``cbf``      [M]    — counting-Bloom-filter for pre-admission counting
    (bloom_filter_policy.h:33); keys below the threshold never pollute the
    main table.

Dynamic growth (the "dynamic-shape" property of EmbeddingVariable) is realized
as host-mediated capacity doubling between steps (``maybe_grow``): XLA needs
static shapes, so the table grows by rebuild-and-rehash at powers of two —
amortized O(1), a handful of recompiles over a job's lifetime.

Batched lookup-or-insert is deterministic under SPMD: intra-batch claim races
are resolved by a stable sort over candidate slots (first id in each
equal-slot run wins), so every replica that executes the same batch computes
the identical table.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from deeprec_tpu import config as cfg
from deeprec_tpu.ops import hashing


# Number of probe rounds before an insert is declared failed (overflow).  At
# load factor <= 0.75 triangular probing resolves in a few rounds; overflow
# increments ``growth_hint`` and the trainer grows the table between steps.
MAX_PROBE = 64


def empty_key(dtype) -> int:
    """Reserved sentinel (like dense_hash_map's empty_key)."""

    return int(jnp.iinfo(dtype).min)


class EmbeddingTable(struct.PyTreeNode):
    """Functional embedding-table state.  All arrays live on device."""

    keys: jnp.ndarray                 # [C] key_dtype
    values: jnp.ndarray               # [C, D] value_dtype
    slots: Dict[str, jnp.ndarray]     # optimizer slot values, each [C, D] or [C, 1]
    freqs: Optional[jnp.ndarray]      # [C] int32
    versions: Optional[jnp.ndarray]   # [C] int32
    touched: Optional[jnp.ndarray]    # [C] bool — incremental-ckpt recorder
    cbf: Optional[jnp.ndarray]        # [M] counting bloom filter
    default_rows: jnp.ndarray         # [default_value_dim, D] deterministic init pool
    size: jnp.ndarray                 # [] int32 live entries
    growth_hint: jnp.ndarray          # [] int32 — #failed inserts since last grow

    name: str = struct.field(pytree_node=False)
    dim: int = struct.field(pytree_node=False)
    option: cfg.EmbeddingVariableOption = struct.field(pytree_node=False)
    # (slot name, init value) pairs — inserts must reset recycled slots'
    # optimizer state to its init (rebuilds zero-fill dead rows; a new key
    # landing there must NOT inherit a zeroed accumulator: rsqrt(0) -> inf).
    slot_inits: Tuple[Tuple[str, float], ...] = struct.field(
        pytree_node=False, default=())

    @property
    def capacity(self) -> int:
        return self.keys.shape[0]

    @property
    def key_dtype(self):
        return self.keys.dtype

    @property
    def value_dtype(self):
        return self.values.dtype

    @property
    def empty(self) -> int:
        return empty_key(self.keys.dtype)


class Lookup(struct.PyTreeNode):
    """Result of the id-resolution phase — PER BATCH POSITION (engine v2).

    The split between id resolution and value collection mirrors the
    reference's ``_OPT_KvResourceLookupID`` / ``_OPT_KvResourceCollectEmbedding``
    joint-optimization pass (core/graph/embedding_pass.cc:35): forward and
    backward share the resolved slots, and gradients flow to the *gathered*
    [N, D] rows rather than a dense [C, D] buffer.

    v2 design note: there is NO batch-level dedup.  Duplicate positions
    resolve to the same slot; the sparse apply sums duplicate gradients by
    scatter-accumulating into a dense [C, D] gradient buffer before the
    (nonlinear) update rule runs — numerically identical to the old
    dedup-then-apply, and it removes jnp.unique + inverse-expansion + the
    segment-sum transpose, each of which costs milliseconds at recsys batch
    sizes on TPU.  ``uids``/``inverse`` are kept for API compatibility:
    ``uids`` aliases the per-position ids and ``inverse`` is the identity
    (XLA folds iota-gathers away).
    """

    uids: jnp.ndarray        # [N] this batch's ids, per position
    counts: jnp.ndarray      # [N] int32 per-position multiplicity weight
    inverse: jnp.ndarray     # [N] int32 identity (API compatibility)
    slot_ids: jnp.ndarray    # [N] int32 in [0, C), or C for no-slot
    admitted: jnp.ndarray    # [N] bool — trainable this step
    valid: jnp.ndarray       # [N] bool — non-padding
    # [C] int32 per-slot occurrence count of THIS batch (train mode only).
    # Computed once in the lookup phase and shared by the freq update, the
    # sparse apply's touched mask / WithCounts context, and adaptive
    # migration — folding what used to be 2-3 independent scalar scatters
    # over all N positions into one (the scatter costs ~6 ns/lane on v5e;
    # at DIN's 209k lanes each duplicate is ~1.3 ms/step).
    slot_counts: Optional[jnp.ndarray] = None


# ---------------------------------------------------------------------------
# Construction


def _make_default_rows(option: cfg.EmbeddingVariableOption, dim: int, dtype) -> jnp.ndarray:
    io = option.init
    n = max(int(io.default_value_dim), 1)
    key = jax.random.PRNGKey(io.seed)
    if io.initializer == "truncated_normal":
        rows = jax.random.truncated_normal(key, -2.0, 2.0, (n, dim), jnp.float32) * io.stddev
    elif io.initializer == "uniform":
        rows = jax.random.uniform(key, (n, dim), jnp.float32, io.minval, io.maxval)
    elif io.initializer == "zeros":
        rows = jnp.zeros((n, dim), jnp.float32)
    elif io.initializer == "constant":
        rows = jnp.full((n, dim), io.constant, jnp.float32)
    else:
        raise ValueError(f"unknown initializer {io.initializer!r}")
    return rows.astype(dtype)


def _cbf_num_counters(option: cfg.CBFFilterOption) -> int:
    # Standard Bloom sizing: m = -n ln p / (ln 2)^2, rounded up to power of 2.
    import math

    n = max(option.max_element_size, 1)
    p = min(max(option.false_positive_probability, 1e-9), 0.5)
    m = int(-n * math.log(p) / (math.log(2.0) ** 2))
    return 1 << max(10, (m - 1).bit_length())


def _cbf_num_hashes(option: cfg.CBFFilterOption) -> int:
    import math

    m = _cbf_num_counters(option)
    k = max(1, round(m / max(option.max_element_size, 1) * math.log(2.0)))
    return min(k, 8)


def create(
    name: str,
    dim: int,
    *,
    key_dtype=jnp.int32,
    value_dtype=jnp.float32,
    option: Optional[cfg.EmbeddingVariableOption] = None,
    capacity: Optional[int] = None,
) -> EmbeddingTable:
    """Create an empty embedding table.

    Equivalent of ``tf.get_embedding_variable`` (variable_scope.py:2147) +
    ``InitializeKvVariableOp`` (core/ops/kv_variable_ops.cc).
    """

    option = option or cfg.EmbeddingVariableOption()
    c = int(capacity or option.initial_capacity)
    if c & (c - 1):
        raise ValueError(f"capacity must be a power of two, got {c}")
    if c < BLOCK:
        raise ValueError(f"capacity must be >= {BLOCK} (one probe bucket), "
                         f"got {c}")
    emp = empty_key(key_dtype)
    tbl = EmbeddingTable(
        keys=jnp.full((c,), emp, key_dtype),
        values=jnp.zeros((c, dim), value_dtype),
        slots={},
        freqs=jnp.zeros((c,), jnp.int32) if option.record_freq else None,
        versions=jnp.zeros((c,), jnp.int32) if option.record_version else None,
        touched=jnp.zeros((c,), jnp.bool_) if option.record_touched else None,
        cbf=(
            # counter dtype per config (reference tests int8/16/32/64 CBFs;
            # narrow counters trade saturation ceiling for memory)
            jnp.zeros((_cbf_num_counters(option.cbf_filter),),
                      option.cbf_filter.counter_dtype)
            if option.cbf_filter is not None
            else None
        ),
        default_rows=_make_default_rows(option, dim, value_dtype),
        size=jnp.zeros((), jnp.int32),
        growth_hint=jnp.zeros((), jnp.int32),
        name=name,
        dim=dim,
        option=option,
    )
    return tbl


def with_slot(table: EmbeddingTable, slot_name: str, width: Optional[int] = None,
              init: float = 0.0) -> EmbeddingTable:
    """Attach an optimizer slot variable sharing the table's key space.

    Width-1 slots are BOOKKEEPING (per-row beta powers, decay periods):
    they stay f32 even on bf16-valued tables — a bf16 period counter
    cannot represent integers past 256 and bf16 beta powers keep ~3
    significant digits, silently corrupting bias correction / decay lag
    (round-4 review).  Full-width slots follow the table dtype."""

    if slot_name in table.slots:
        return table
    w = table.dim if width is None else width
    dt = jnp.float32 if w == 1 else table.value_dtype
    slot = jnp.full((table.capacity, w), init, dt)
    return table.replace(
        slots={**table.slots, slot_name: slot},
        slot_inits=table.slot_inits + ((slot_name, float(init)),),
    )


# ---------------------------------------------------------------------------
# Probing


# Bucketized probing (cuco-style): the table is an array of aligned
# BLOCK-slot buckets; one probe round gathers a whole bucket per id (a [N,
# BLOCK] row gather costs about the same as a [N] scalar gather — the cost
# is per-row issue overhead, not bytes) and resolves hit/first-empty within
# it.  Chains are measured in BUCKETS, so the worst lane over a 200k-id
# batch resolves in a handful of rounds instead of ~40 slot-granular ones
# (measured: DIN's 209k-id lookup_phase fell 38.9 -> ~6 ms, PERF.md).
# Round 3: BLOCK 8 -> 32 measured 3.2x faster at the 209k-id DIN
# distribution (11.6 -> 3.65 ms interleaved) — wider rows are nearly free
# (per-row issue cost) and chains collapse to ~1 bucket, so ONE unrolled
# round suffices and the straggler while_loop almost never iterates.
# BLOCK=64 was faster still in eval (1.8 ms) but regressed train-mode
# lookup 4x (22 ms) — rejected, see PERF.md.
BLOCK = 32


def _probe_blocks(b0: jnp.ndarray, r: jnp.ndarray, num_blocks: int) -> jnp.ndarray:
    """Triangular probing over buckets: b + r(r+1)/2 mod NB visits every
    bucket for NB = 2^k."""

    off = (r * (r + 1)) // 2
    return (b0 + off) & (num_blocks - 1)


# Straight-line lookup rounds before falling back to the while_loop.  At
# load factor <= 0.75 and BLOCK=32 almost every id resolves in its first
# bucket; the unrolled round is a pure fused gather with no control-flow
# sync, so the common case never pays a loop iteration.
UNROLL_PROBE = 1


def _find_or_insert(
    keys: jnp.ndarray,
    ids: jnp.ndarray,
    may_insert: jnp.ndarray,
    valid: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched deterministic lookup-or-insert.

    Returns (new_keys, slot_ids [N] int32 with C = not-found, inserted [N]
    bool, n_failed [] int32).  ``ids`` MAY contain duplicates (engine v2 runs
    per batch position, no dedup): duplicate positions resolve to the same
    slot, and exactly one position carries ``inserted`` for a new key.
    Equivalent of LocklessHashMap::Lookup/Insert on CPU (cpu_hash_map_kv.h) and
    cuco::dynamic_map insert on GPU (gpu_hash_table.cu.cc:98).

    Two phases, exploiting the open-addressing invariant that a present id
    always appears BEFORE the first empty slot in its probe order (the
    device table has no tombstones — removals rebuild, which re-places every
    key at its first-empty position):

      1. **Lookup** (the steady-state hot path): probe BUCKETS of ``BLOCK``
         aligned slots until a bucket contains the id or an empty slot.
         ``UNROLL_PROBE`` straight-line rounds + a while_loop for the rare
         stragglers — no sorts, no claim machinery, and when every id
         resolves in the unrolled rounds the loop body never executes.
      2. **Insert** (only ids that missed and may insert): each pending id
         targets the first empty slot of its current bucket; claims are
         resolved by a stable sort over candidate slots — first position in
         each equal-slot run wins, deterministic on every SPMD replica;
         losers re-examine the bucket (the new occupant may be their own
         duplicate), advancing only past buckets with no empties.  When a
         batch inserts nothing (steady state), this while_loop runs ZERO
         iterations.
    """

    capacity = keys.shape[0]
    nb = capacity // BLOCK
    keys2 = keys.reshape(nb, BLOCK)
    n = ids.shape[0]
    b0 = hashing.bucket(ids, nb).astype(jnp.int32)
    no_slot = jnp.int32(capacity)
    no_block = jnp.int32(nb)
    emp = empty_key(keys.dtype)

    # -- phase 1: lookup ----------------------------------------------------
    found_slot = jnp.full((n,), no_slot, jnp.int32)
    empty_slot = jnp.full((n,), no_slot, jnp.int32)
    empty_round = jnp.zeros((n,), jnp.int32)
    done = ~valid

    def lookup_round(r, state):
        found_slot, empty_slot, empty_round, done = state
        blk = _probe_blocks(b0, r, nb)
        cur = keys2.at[blk].get(mode="fill", fill_value=0)     # [N, BLOCK]
        eq = cur == ids[:, None]
        hit = ~done & jnp.any(eq, axis=1)
        hit_slot = blk * BLOCK + jnp.argmax(eq, axis=1).astype(jnp.int32)
        found_slot = jnp.where(hit, hit_slot, found_slot)
        is_emp = cur == emp
        stop = ~done & ~hit & jnp.any(is_emp, axis=1)
        first_emp = blk * BLOCK + jnp.argmax(is_emp, axis=1).astype(jnp.int32)
        empty_slot = jnp.where(stop, first_emp, empty_slot)
        empty_round = jnp.where(stop, r, empty_round)
        done = done | hit | stop
        return found_slot, empty_slot, empty_round, done

    state = (found_slot, empty_slot, empty_round, done)
    for r in range(UNROLL_PROBE):
        state = lookup_round(jnp.int32(r), state)

    def lk_cond(carry):
        r, state = carry
        return jnp.logical_and(r < MAX_PROBE, ~jnp.all(state[3]))

    def lk_body(carry):
        r, state = carry
        return r + 1, lookup_round(r, state)

    _, state = jax.lax.while_loop(
        lk_cond, lk_body, (jnp.int32(UNROLL_PROBE), state))
    found_slot, empty_slot, empty_round, done = state

    # -- phase 2: insert ----------------------------------------------------
    # Pending: valid ids that missed, want insertion, and saw an empty slot
    # (ids that exhausted MAX_PROBE buckets without an empty have
    # empty_slot == no_slot and count as failed).
    missed = valid & (found_slot == no_slot)
    pending = missed & may_insert & (empty_slot < no_slot)

    def ins_cond(carry):
        keys_, slots_, pending, inserted, r_i, rounds = carry
        return jnp.logical_and(rounds < MAX_PROBE, jnp.any(pending))

    def ins_body(carry):
        keys_, slots_, pending, inserted, r_i, rounds = carry
        k2 = keys_.reshape(nb, BLOCK)
        blk = jnp.where(pending, _probe_blocks(b0, r_i, nb), no_block)
        cur = k2.at[blk].get(mode="fill", fill_value=0)        # [N, BLOCK]
        # A duplicate position whose twin won the claim last round now HITS
        # the freshly-inserted key (it did not advance, see below).
        eq = cur == ids[:, None]
        hit = pending & jnp.any(eq, axis=1)
        slots_ = jnp.where(
            hit, blk * BLOCK + jnp.argmax(eq, axis=1).astype(jnp.int32),
            slots_)
        pending = pending & ~hit
        is_emp = cur == emp
        has_empty = pending & jnp.any(is_emp, axis=1)
        cand = blk * BLOCK + jnp.argmax(is_emp, axis=1).astype(jnp.int32)
        # Deterministic claims: stable-sort candidate slots, first position
        # in each equal-slot run wins.  O(N log N), no O(capacity) traffic.
        skey = jnp.where(has_empty, cand, no_slot)
        order = jnp.argsort(skey, stable=True)
        ss = skey[order]
        first_in_run = jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), ss[1:] != ss[:-1]])
        winner_sorted = first_in_run & (ss < no_slot)
        won = jnp.zeros_like(pending).at[order].set(winner_sorted)
        keys_ = keys_.at[jnp.where(won, cand, no_slot)].set(ids, mode="drop")
        slots_ = jnp.where(won, cand, slots_)
        inserted = inserted | won
        pending = pending & ~won
        # Advance only positions whose bucket had NO empty slot; claim
        # losers stay to re-examine the bucket (its next empty, or their
        # own id inserted by a duplicate position).
        r_i = jnp.where(pending & ~has_empty, r_i + 1, r_i)
        return keys_, slots_, pending, inserted, r_i, rounds + 1

    init = (keys, found_slot, pending, jnp.zeros((n,), jnp.bool_),
            empty_round, jnp.int32(0))
    keys, slots_out, pending, inserted, _, _ = jax.lax.while_loop(
        ins_cond, ins_body, init)
    n_failed = jnp.sum(
        (missed & may_insert & (empty_slot == no_slot)) | pending
    ).astype(jnp.int32)
    return keys, slots_out, inserted, n_failed


def _find(keys: jnp.ndarray, ids: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Read-only probe: slot ids, C = not found.  Used by serving/export."""

    _, slots, _, _ = _find_or_insert(keys, ids, jnp.zeros_like(valid), valid)
    return slots


# ---------------------------------------------------------------------------
# Counting-Bloom-filter admission (bloom_filter_policy.h:33)


def _cbf_probe(cbf: jnp.ndarray, ids: jnp.ndarray, k: int) -> jnp.ndarray:
    m = cbf.shape[0]
    est = None
    for i in range(k):
        pos = hashing.bucket(ids, m, salt=101 + i)
        c = cbf.at[pos].get(mode="fill", fill_value=0)
        est = c if est is None else jnp.minimum(est, c)
    return est


def _cbf_add(cbf: jnp.ndarray, ids: jnp.ndarray, counts: jnp.ndarray,
             valid: jnp.ndarray, k: int) -> jnp.ndarray:
    m = cbf.shape[0]
    dt = cbf.dtype
    cap = jnp.asarray(jnp.iinfo(dt).max, jnp.int32)
    safe_counts = jnp.where(valid, counts, 0).astype(jnp.int32)
    # Accumulate the per-BATCH delta in its own int32 plane (bounded by
    # batch size x k — cannot overflow), then saturating-add it onto the
    # stored counters without ever forming a sum that can wrap: a
    # narrow-dtype in-place scatter-add wraps (an int8 counter gaining
    # +300 in one batch slips past any post-hoc "went down" check —
    # round-4 review), and an int32 counter already clamped at 2^31-1
    # wraps NEGATIVE in an int32 accumulator, denying admission to
    # provably-hot ids (round-5 advice).  `delta >= room` decides
    # saturation before any overflowing add is issued.
    delta = jnp.zeros((m,), jnp.int32)
    for i in range(k):
        pos = hashing.bucket(ids, m, salt=101 + i)
        delta = delta.at[jnp.where(valid, pos, m)].add(safe_counts,
                                                       mode="drop")
    base = cbf.astype(jnp.int32)
    room = cap - base  # >= 0: stored counters are always clamped to cap
    return jnp.where(delta >= room, cap, base + delta).astype(dt)


# ---------------------------------------------------------------------------
# Lookup phases


def unique_ids(ids: jnp.ndarray, empty: int, size: Optional[int] = None):
    """Static-shape dedup: (uids, counts, inverse).  Padding uses ``empty``.

    jnp.unique's sort-based path measures FASTER on TPU than a hand-rolled
    single-argsort formulation (0.015ms vs 0.035ms for 53k ids on v5e) —
    XLA's variadic sort fuses the inverse/counts passes well.  Keep it.
    """

    size = size or ids.shape[0]
    uids, inverse, counts = jnp.unique(
        ids, return_inverse=True, return_counts=True, size=size, fill_value=empty
    )
    return uids, counts.astype(jnp.int32), inverse.astype(jnp.int32)


def _lookup_phase(
    table: EmbeddingTable,
    ids: jnp.ndarray,
    *,
    step: jnp.ndarray | int = 0,
    train: bool = True,
    external_counts: Optional[jnp.ndarray] = None,
    init_rows: Optional[jnp.ndarray] = None,
) -> Tuple[EmbeddingTable, Lookup]:
    """Resolve a batch of raw (possibly duplicated) ids to table slots.

    In training mode this inserts new keys, counts frequencies, runs admission
    filters, and initializes fresh rows from the deterministic default pool —
    the work of EmbeddingVar::LookupOrCreateKey + FilterPolicy::Lookup
    (embedding_var.h:202-219, counter_filter_policy.h:106-136).  Inference mode
    (train=False) never mutates: unknown ids read the no-permission default.

    ``external_counts`` (same shape as ids) overrides the per-position
    occurrence count of 1 — used by the sharded path, where each received id
    already aggregates several source occurrences.

    ``init_rows`` ([N, D], aligned with the flattened ids) overrides the
    default pool for freshly inserted rows — the ``ev_init_value`` mechanism
    of adaptive embedding (embedding_ops.py:667: new EV rows start from the
    learned static-table row, migrating what the hash bucket learned).
    """

    ids = ids.reshape(-1).astype(table.key_dtype)
    emp = table.empty
    uids = ids                                   # v2: per position, no dedup
    inverse = jnp.arange(ids.shape[0], dtype=jnp.int32)
    counts = (external_counts.reshape(-1).astype(jnp.int32)
              if external_counts is not None
              else jnp.ones((ids.shape[0],), jnp.int32))
    valid = uids != emp
    opt = table.option
    step = jnp.asarray(step, jnp.int32)

    cbf = table.cbf
    if train and opt.cbf_filter is not None:
        k = _cbf_num_hashes(opt.cbf_filter)
        # Add first, then probe: for an id with total batch multiplicity c
        # the post-add estimate equals (prior + c) at every one of its
        # positions — identical admission to the old dedup formulation.
        cbf = _cbf_add(cbf, uids, counts, valid, k)
        est = _cbf_probe(cbf, uids, k)
        may_insert = valid & (est >= opt.cbf_filter.filter_freq)
    else:
        may_insert = valid if train else jnp.zeros_like(valid)

    keys, slot_ids, inserted, n_failed = _find_or_insert(table.keys, uids, may_insert, valid)
    found = slot_ids < table.capacity
    no_slot = jnp.int32(table.capacity)
    safe_slot = jnp.where(found, slot_ids, no_slot)

    values = table.values
    slot_arrays = table.slots
    freqs = table.freqs
    versions = table.versions
    touched = table.touched
    size = table.size
    growth_hint = table.growth_hint

    if train:
        # Initialize freshly inserted rows from the deterministic default
        # pool: stable per-key init across restarts/shards (InitializerOption
        # default_value_dim, variables.py:180).  Skipping this work when a
        # batch inserts nothing is load-bearing: a full-width row scatter on
        # TPU costs ~6.5 ns per scattered ELEMENT even when every index is
        # dropped (209k x 32 -> ~40 ms/step measured), and `lax.cond` is NOT
        # a free gate — the identity branch pays a pass-through copy of the
        # values array (~6 ms at [524k, 32] on v5e).  A `lax.while_loop`
        # aliases its carry in place, so zero iterations cost nothing
        # (measured: gather after a 0-iter while == plain gather); inserting
        # steps run ceil(n_inserted / K) compact K-row scatter chunks
        # (~2 ms/chunk) instead of the full-width scatter.
        n_inserted = jnp.sum(inserted).astype(jnp.int32)
        npos = uids.shape[0]
        K = min(4096, npos)
        if init_rows is not None:
            init_flat = jax.lax.stop_gradient(
                init_rows.reshape(-1, table.dim).astype(table.value_dtype))
        # rank of each position among inserted positions (order-stable)
        rank = jnp.cumsum(inserted.astype(jnp.int32)) - 1

        def ins_chunk_cond(carry):
            i = carry[0]
            return i * K < n_inserted

        def ins_chunk_body(carry):
            i, values, slot_arrays, versions, touched = carry
            lo = i * K
            in_chunk = inserted & (rank >= lo) & (rank < lo + K)
            # compact: position index of each chunk member, K-padded
            cpos = jnp.where(in_chunk, rank - lo, K)
            comp = jnp.full((K + 1,), npos, jnp.int32).at[cpos].set(
                jnp.arange(npos, dtype=jnp.int32), mode="drop")[:K]
            chunk_slot = slot_ids.at[comp].get(
                mode="fill", fill_value=table.capacity)
            # unfilled compact lanes point at npos -> no_slot -> dropped
            chunk_slot = jnp.where(comp < npos, chunk_slot, no_slot)
            if init_rows is None:
                dvd = table.default_rows.shape[0]
                chunk_ids = uids.at[comp].get(mode="fill", fill_value=emp)
                fresh = table.default_rows[
                    hashing.bucket(chunk_ids, dvd, salt=7)]
            else:
                fresh = init_flat.at[comp].get(mode="fill", fill_value=0)
            values = values.at[chunk_slot].set(fresh, mode="drop")
            # Reset recycled rows' optimizer slots to their init value:
            # rebuilds zero-fill dead rows, and a fresh key must not inherit
            # that zero (adagrad rsqrt(0) = inf -> NaN on first apply).
            slot_arrays = dict(slot_arrays)
            for sname, sinit in table.slot_inits:
                slot_arrays[sname] = slot_arrays[sname].at[chunk_slot].set(
                    jnp.asarray(sinit, slot_arrays[sname].dtype),
                    mode="drop")
            if versions is not None:
                versions = versions.at[chunk_slot].set(step, mode="drop")
            # Incremental-checkpoint correctness: an inserted key must land
            # in the delta even if it never receives an (admitted) gradient
            # — otherwise full+delta restore loses the key and its
            # admission progress (round-4 review; IndicesIncrRecorder
            # records inserts too, incr_save_restore_ops.h:347).
            if touched is not None:
                touched = touched.at[chunk_slot].set(True, mode="drop")
            return i + 1, values, slot_arrays, versions, touched

        _, values, slot_arrays, versions, touched = jax.lax.while_loop(
            ins_chunk_cond, ins_chunk_body,
            (jnp.int32(0), values, dict(table.slots), versions, touched))
        size = size + n_inserted
        growth_hint = growth_hint + n_failed

        # One scalar scatter builds the per-slot batch-count plane; every
        # consumer (freq plane, sparse apply, adaptive migration) reuses it.
        upd_slot = jnp.where(found, slot_ids, no_slot)
        slot_counts = jnp.zeros((table.capacity,), jnp.int32).at[upd_slot].add(
            jnp.where(found, counts, 0), mode="drop")
        if freqs is not None:
            freqs = freqs + slot_counts

    # Admission: counter filter gates trainability by accumulated frequency.
    admitted = found
    if opt.counter_filter is not None and opt.counter_filter.filter_freq > 0:
        if freqs is None:
            raise ValueError(f"table {table.name}: counter filter requires record_freq")
        f = freqs.at[safe_slot].get(mode="fill", fill_value=0)
        admitted = found & (f >= opt.counter_filter.filter_freq)

    new_table = table.replace(
        keys=keys, values=values, slots=slot_arrays, freqs=freqs,
        versions=versions, touched=touched, cbf=cbf, size=size,
        growth_hint=growth_hint,
    )
    lk = Lookup(
        uids=uids, counts=counts, inverse=inverse,
        slot_ids=slot_ids, admitted=admitted, valid=valid,
        slot_counts=slot_counts if train else None,
    )
    return new_table, lk


def chunked_masked_row_set(arr: jnp.ndarray, mask: jnp.ndarray,
                           dst: jnp.ndarray, row_fn, *, K: int = 4096
                           ) -> jnp.ndarray:
    """``arr.at[dst[p]].set(row_fn(p))`` for masked positions p — as a
    while_loop over compact K-position chunks that costs NOTHING when the
    mask is empty.

    The obvious ``lax.cond`` gate is not free: its identity branch pays a
    pass-through copy of ``arr`` (~6 ms at [524k, 32] on v5e), and an
    ungated full-width scatter pays ~60-105 ns per source row even for
    dropped indices.  A 0-iteration ``lax.while_loop`` aliases its carry in
    place (measured: free — PERF.md round 2c), and active steps pay only
    ceil(n_active / K) compact chunks.

    ``row_fn(comp)`` maps compact position indices ``comp`` [K] (entries
    ``>= mask.size`` are padding) to replacement rows [K, D].  Positions
    whose ``dst`` is out of range are dropped.
    """

    npos = mask.shape[0]
    K = min(K, npos)
    cap = arr.shape[0]
    n_active = jnp.sum(mask).astype(jnp.int32)
    rank = jnp.cumsum(mask.astype(jnp.int32)) - 1

    def cond(carry):
        return carry[0] * K < n_active

    def body(carry):
        i, a = carry
        lo = i * K
        in_chunk = mask & (rank >= lo) & (rank < lo + K)
        cpos = jnp.where(in_chunk, rank - lo, K)
        comp = jnp.full((K + 1,), npos, jnp.int32).at[cpos].set(
            jnp.arange(npos, dtype=jnp.int32), mode="drop")[:K]
        cdst = dst.at[comp].get(mode="fill", fill_value=cap)
        cdst = jnp.where(comp < npos, cdst, jnp.int32(cap))
        return i + 1, a.at[cdst].set(row_fn(comp), mode="drop")

    _, arr = jax.lax.while_loop(cond, body, (jnp.int32(0), arr))
    return arr


# Benchmark hook (read at TRACE time): force the admitted-select in
# _collect even when it is a provable no-op, for interleaved A/Bs.
_FORCE_COLLECT_SELECT = False


def _collect(table: EmbeddingTable, lk: Lookup) -> jnp.ndarray:
    """Gather this batch's embedding rows [N, D] (one per position).

    Differentiation boundary: treat the result as an input to the loss; its
    gradient is the sparse gradient handed to the sparse optimizers (the
    _OPT_KvResourceCollectEmbedding role, kv_variable_ops.cc:404).
    Un-admitted / missing ids read ``default_value_no_permission``
    (counter_filter_policy.h:106).
    """

    vals = table.values.at[lk.slot_ids].get(mode="fill", fill_value=0)
    opt = table.option
    if not _FORCE_COLLECT_SELECT \
            and (opt.counter_filter is None
                 or opt.counter_filter.filter_freq <= 0) \
            and float(opt.default_value_no_permission) == 0.0:
        # No counter filter => admitted == found, and both not-found and
        # padding positions already read 0 == default_value_no_permission
        # through the gather's fill value — the select is a provable no-op.
        # Skipping it drops a full [N, D] elementwise pass in the forward
        # AND its mirror select in the backward (measured ~1 ms each way at
        # DIN's 209k positions; q8/q9 round-4 ablation).
        return vals
    dvnp = jnp.asarray(opt.default_value_no_permission, table.value_dtype)
    return jnp.where(lk.admitted[:, None], vals, dvnp)


def _lookup(table: EmbeddingTable, ids: jnp.ndarray) -> jnp.ndarray:
    """Inference-path lookup: [N, D] embeddings, no state mutation."""

    _, lk = _lookup_phase(table, ids, train=False)
    return _collect(table, lk)


# Public, jitted entry points.  These compose into larger jitted programs too
# (jit-of-jit is inlined by XLA); standalone eager use would otherwise pay
# per-op dispatch for the probe loop.
lookup_phase = jax.jit(_lookup_phase, static_argnames=("train",))
collect = jax.jit(_collect)
lookup = jax.jit(_lookup)


# ---------------------------------------------------------------------------
# Growth / rebuild / shrink


def load_factor(table: EmbeddingTable) -> float:
    return float(jax.device_get(table.size)) / table.capacity


def needs_grow(table: EmbeddingTable) -> bool:
    """Host-side check; call between steps (dynamic capacity, EV semantics)."""

    return (
        load_factor(table) > table.option.max_load_factor
        or int(jax.device_get(table.growth_hint)) > 0
    )


def _rebuild_impl(table: EmbeddingTable, new_capacity: int) -> EmbeddingTable:
    live = table.keys != table.empty
    emp = empty_key(table.key_dtype)
    new_keys = jnp.full((new_capacity,), emp, table.key_dtype)
    # Re-insert every live key.  Unique by construction.
    new_keys, new_slots, inserted, n_failed = _find_or_insert(
        new_keys, table.keys, live, live
    )
    dst = jnp.where(live, new_slots, jnp.int32(new_capacity))

    def move(arr, fill=0):
        out = jnp.full((new_capacity,) + arr.shape[1:], fill, arr.dtype)
        return out.at[dst].set(arr, mode="drop")

    return table.replace(
        keys=new_keys,
        values=move(table.values),
        slots={k: move(v) for k, v in table.slots.items()},
        freqs=move(table.freqs) if table.freqs is not None else None,
        versions=move(table.versions) if table.versions is not None else None,
        touched=move(table.touched, False) if table.touched is not None else None,
        # A re-insert can fail for straggler bucket chains (> MAX_PROBE
        # advances at high load): count only keys that actually landed and
        # surface the failures through growth_hint so maybe_grow widens and
        # the loss is observable instead of silent (round-4 review).
        size=(jnp.sum(live) - n_failed).astype(jnp.int32),
        growth_hint=n_failed.astype(jnp.int32),
    )


# NOTE on growth memory (measured, v5e): donating the old table into the
# growth rebuild does NOT lower peak HBM — XLA buffer donation is strictly
# input-output aliasing, and no output of a 2x rebuild matches an old-
# capacity shape, so every donated buffer is reported "not usable" and the
# old arrays live until the program ends regardless.  Peak during growth is
# inherently old C + new 2C; budget capacity accordingly (TODO.md item
# closed as not-applicable).
_rebuild = functools.partial(jax.jit, static_argnums=(1,))(_rebuild_impl)


def grow(table: EmbeddingTable, new_capacity: Optional[int] = None) -> EmbeddingTable:
    new_capacity = int(new_capacity or table.capacity * 2)
    if new_capacity & (new_capacity - 1):
        raise ValueError("capacity must be a power of two")
    return _rebuild(table, new_capacity)


def maybe_grow(table: EmbeddingTable) -> EmbeddingTable:
    while needs_grow(table):
        table = grow(table)
    return table


@jax.jit
def evict_mask(table: EmbeddingTable, step) -> jnp.ndarray:
    """Which live slots the shrink policies would drop (shrink_policy.h).

    GlobalStepShrinkPolicy: ``step - version > steps_to_live``;
    L2WeightShrinkPolicy: ``0.5 * ||value||^2 < l2_weight_threshold`` —
    the half-squared norm, matching the reference bit-for-bit
    (l2weight_shrink_policy.h:52-57 ``l2_weight *= 0.5``); round-5 review
    aligned the three L2 surfaces (this, hash_table.L2WeightFilter, the
    config docstring) on that one definition.
    """

    live = table.keys != table.empty
    mask = jnp.zeros((table.capacity,), jnp.bool_)
    opt = table.option
    step = jnp.asarray(step, jnp.int32)
    if opt.global_step_evict is not None and opt.global_step_evict.steps_to_live > 0:
        if table.versions is None:
            raise ValueError("global-step eviction requires record_version")
        mask = mask | (step - table.versions > opt.global_step_evict.steps_to_live)
    if opt.l2_weight_evict is not None and opt.l2_weight_evict.l2_weight_threshold > 0:
        l2 = 0.5 * jnp.sum(jnp.square(table.values.astype(jnp.float32)),
                           axis=-1)
        mask = mask | (l2 < opt.l2_weight_evict.l2_weight_threshold)
    return mask & live


@jax.jit
def _apply_evict(table: EmbeddingTable, mask: jnp.ndarray) -> EmbeddingTable:
    emp = jnp.asarray(table.empty, table.key_dtype)
    keys = jnp.where(mask, emp, table.keys)
    live = keys != table.empty
    # Rebuild at same capacity to heal probe chains (no tombstones).
    tmp = table.replace(keys=keys, size=jnp.sum(live).astype(jnp.int32))
    return tmp


def shrink(table: EmbeddingTable, step) -> EmbeddingTable:
    """Apply eviction policies (delete-on-checkpoint in the reference —
    save_restore_v2_ops.cc:296-310 DumpEv applies shrink at save time)."""

    mask = evict_mask(table, step)
    n = int(jax.device_get(jnp.sum(mask)))
    if n == 0:
        return table
    table = _apply_evict(table, mask)
    return _rebuild(table, table.capacity)


@jax.jit
def _remove_mask(table: EmbeddingTable, ids: jnp.ndarray) -> jnp.ndarray:
    ids = ids.reshape(-1).astype(table.key_dtype)
    valid = ids != table.empty
    slots = _find(table.keys, ids, valid)
    mask = jnp.zeros((table.capacity,), jnp.bool_)
    return mask.at[jnp.where(slots < table.capacity, slots, table.capacity)].set(
        True, mode="drop"
    )


def remove(table: EmbeddingTable, ids: jnp.ndarray) -> EmbeddingTable:
    """Explicit key removal (KVInterface::Remove)."""

    mask = _remove_mask(table, ids)
    table = _apply_evict(table, mask)
    return _rebuild(table, table.capacity)


# ---------------------------------------------------------------------------
# Introspection (EVGetFrequency / EVGetVersion, core/ops/kv_variable_ops.cc)


@jax.jit
def get_frequency(table: EmbeddingTable, ids: jnp.ndarray) -> jnp.ndarray:
    ids = ids.reshape(-1).astype(table.key_dtype)
    slots = _find(table.keys, ids, ids != table.empty)
    return table.freqs.at[slots].get(mode="fill", fill_value=0)


@jax.jit
def get_version(table: EmbeddingTable, ids: jnp.ndarray) -> jnp.ndarray:
    ids = ids.reshape(-1).astype(table.key_dtype)
    slots = _find(table.keys, ids, ids != table.empty)
    return table.versions.at[slots].get(mode="fill", fill_value=-1)


@jax.jit
def contains(table: EmbeddingTable, ids: jnp.ndarray) -> jnp.ndarray:
    ids = ids.reshape(-1).astype(table.key_dtype)
    slots = _find(table.keys, ids, ids != table.empty)
    return slots < table.capacity


def export_live(table: EmbeddingTable):
    """(keys, values, freqs, versions, live_mask) for checkpointing/export
    (KvResourceExport, core/ops/kv_variable_ops.cc:74-885)."""

    live = table.keys != table.empty
    return table.keys, table.values, table.freqs, table.versions, live
