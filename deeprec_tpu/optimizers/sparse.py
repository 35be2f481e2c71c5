"""Sparse optimizers applying directly on embedding-table slots.

TPU-native re-design of the reference's KvResourceSparseApply* kernel family
(core/kernels/training_ali_ops.cc:73-3457, core/ops/training_ali_ops.cc:110-764).
The reference shards a scalar loop over ids, doing per-id LookupOrCreateKey +
Eigen row math; here the ids are already resolved to slots by the lookup phase
(the _OPT_ pre-resolved-pointer pattern), gradients arrive deduplicated as
[U, D] rows, and the update is one batched scatter per state array — the whole
thing fuses into a handful of XLA ops on the VPU.

Semantics matrix reproduced from the reference:
  * every optimizer × ``WithCounts`` variant via ``use_counts``.  NOTE on
    semantics (verified against training_ali_ops.cc:140-165): the reference's
    *_with_counts ops feed counts ONLY into per-key frequency/admission
    bookkeeping — the gradient math is untouched.  This repo accumulates
    counts into freqs at lookup time, so ``use_counts=False`` already matches
    the reference's WithCounts behavior.  ``use_counts=True`` additionally
    exposes ``ctx["counts"]`` (per-row duplicate multiplicity) to custom
    update rules; no built-in rule consumes it;
  * filter gating: un-admitted ids receive no update but still count
    frequency (counter_filter_policy.h:106-136);
  * version bump to the current global step on update (UpdateVersion,
    training_ali_ops.cc:143-160);
  * AdamAsync's per-row beta-power bookkeeping (apply_adam_async semantics,
    training_ali_ops.cc ApplyAdamAsync: beta1_power/beta2_power live per row
    and advance only when the row is touched);
  * AdagradDecay's global accumulator decay schedule
    (docs: accumulator *= decay_rate every decay_step steps).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from deeprec_tpu.embedding import table as ev
from deeprec_tpu.ops import segment_scatter


@dataclasses.dataclass(frozen=True)
class SparseOptimizer:
    """A sparse optimizer = slot schema + batched row-update rule."""

    name: str
    slot_names: Tuple[str, ...]
    slot_widths: Tuple[Optional[int], ...]   # None = table dim, 1 = scalar/row
    slot_inits: Tuple[float, ...]
    # update(params, slot_values, grad, ctx) -> (new_params, new_slot_values)
    # operating on [U, D] rows.
    update: Callable
    hyper: dict = dataclasses.field(default_factory=dict)

    def init(self, table: ev.EmbeddingTable) -> ev.EmbeddingTable:
        """Attach this optimizer's slot variables to the table (slot EVs)."""

        for n, w, i in zip(self.slot_names, self.slot_widths, self.slot_inits):
            table = ev.with_slot(table, n, width=w, init=i)
        return table

    def apply(
        self,
        table: ev.EmbeddingTable,
        lk: ev.Lookup,
        grad: jnp.ndarray,
        *,
        step: jnp.ndarray | int = 0,
        use_counts: bool = False,
        strategy: Optional[str] = None,
    ) -> ev.EmbeddingTable:
        """Apply sparse gradients [N, D] (per batch position) to the table.

        ``lk`` is the Lookup from the forward pass; positions where
        ``lk.admitted`` is False are skipped entirely (no slot update, no
        version bump) — matching the filter-gated sparse-apply
        (training_ali_ops.cc:143-160).  Duplicate positions of the same id
        have their gradients summed before the update rule runs.

        ``strategy``: ``None``/"auto" dispatches on shape (see
        ``_pick_strategy``); "dense" forces the dense-masked apply,
        "compact" the touched-set chunked apply — test/benchmark hooks.
        """

        return _apply_jit(
            table, lk, grad, jnp.asarray(step, jnp.int32), dict(self.hyper),
            update=self.update, slot_names=self.slot_names,
            use_counts=use_counts, strategy=strategy or APPLY_STRATEGY,
        )


# Module-level default dispatch ("auto" / "dense" / "compact").  Benchmarks
# override it to force one path process-wide; production code leaves "auto".
APPLY_STRATEGY = "auto"


def _pick_strategy(n: int, capacity: int, n_arrays: int) -> str:
    """Shape-based dense-vs-compact dispatch (measured on v5e, interleaved —
    benchmarks/apply_compact_ab.py + apply_dense_ablate.py, PERF.md
    "Touched-set apply", round 4).

    The measurement went AGAINST the obvious theory twice: the dense-masked
    apply's full-capacity [C, D] passes are bandwidth-cheap on TPU, while
    the compact path pays per-row gather+scatter ISSUE cost per state array
    plus a sort — it lost 2.5-3.5x at every production shape (dlrm@2048
    3.2->11.5 ms, dlrm@16384 30.5->82.7, din@2048 12.9->26.5), and the
    round-4 small-batch/huge-table probe (dlrm batch 512 on a 2^22-cap
    table — capacity = 8192x the batch) STILL favored dense, 4.51 vs
    5.12 ms/step.  No measured regime flips the trade on this backend, so
    ``auto`` is always dense; the compact path stays reachable via
    ``strategy="compact"`` (parity-tested) for re-evaluation on a backend
    or hardware bump."""

    del n, capacity, n_arrays
    return "dense"


@functools.partial(
    jax.jit, static_argnames=("update", "slot_names", "use_counts",
                              "strategy")
)
def _apply_jit(table, lk, grad, step, hyper, *, update, slot_names,
               use_counts, strategy="auto"):
    """Sparse apply dispatch: dense-masked (engine v2) or touched-set
    compact (round 4) per ``_pick_strategy``."""

    if strategy == "auto":
        strategy = _pick_strategy(
            int(grad.shape[0]), table.capacity, 1 + len(slot_names))
    if strategy == "compact":
        return _apply_compact(table, lk, grad, step, hyper, update=update,
                              slot_names=slot_names, use_counts=use_counts)
    return _apply_dense(table, lk, grad, step, hyper, update=update,
                        slot_names=slot_names, use_counts=use_counts)


def _apply_dense(table, lk, grad, step, hyper, *, update, slot_names,
                 use_counts):
    """Dense-masked sparse apply (engine v2).

    TPU reality check (measured on v5e, honest timing): an XLA row scatter
    costs ~100 ns/row — updating values + each slot array for 53k rows ran
    to >10 ms/step.  Instead the per-position gradients are scatter-ADDED
    once into a dense [C, D] buffer (summing duplicates exactly like the
    old dedup path), the update rule runs VECTORIZED over the whole table,
    and a touched-row mask selects which rows keep the new state.  Cost is
    one scatter-add + one full-table elementwise pass — bandwidth-bound,
    ~2-3x cheaper than per-row scatters at recsys batch/table shapes, and
    independent of how many arrays the optimizer updates.
    """

    c = table.capacity
    ok = lk.valid & lk.admitted & (lk.slot_ids < c)
    no_slot = jnp.int32(c)
    dst = jnp.where(ok, lk.slot_ids, no_slot)
    # Upcast BEFORE the scatter.  Riding bf16 grads natively through the
    # stream kernel (half the bytes; segment_scatter supports it with
    # exact f32 accumulation) was built and measured SLOWER in-step —
    # the grad permute is row-issue-bound, not bandwidth-bound, so
    # halving bytes buys nothing and the packed-id decode adds work
    # (PERF.md rejected optimizations, benchmarks/bf16grad_ab.py).
    grad = grad.astype(table.value_dtype)

    # The single large scatter of the hot path.  ops/segment_scatter owns
    # the dispatch: at sequence-model id volumes (>=128k positions) the
    # dedup + chunked-set path cuts the DIN step 28.1 -> 19.6 ms on v5e;
    # below that the XLA scatter-add wins (see segment_scatter docstring +
    # PERF.md).  The scalar cnt scatter stays SEPARATE deliberately:
    # folding it into the dedup pass (shared sort, cumsum-diff counts,
    # chunked cnt writes) measured 2.2 ms SLOWER interleaved — XLA
    # schedules the standalone scalar scatter nearly for free.  Rows with
    # dst == capacity (masked positions) are dropped.
    g_dense = segment_scatter.scatter_add_rows(dst, grad, c).astype(
        table.value_dtype)
    # Per-slot counts: reuse the plane the lookup phase already scattered
    # when its mask provably equals ours — no counter filter means
    # admitted == found, so ok == the lookup's found mask.  (A counter
    # filter makes admitted a strict subset; re-scatter to keep the
    # touched mask exact — an Adam-style rule with g=0 still decays state,
    # so over-marking touched rows would corrupt non-admitted rows.)
    cf = table.option.counter_filter
    if (lk.slot_counts is not None and lk.slot_counts.shape[0] == c
            and (cf is None or cf.filter_freq <= 0)):
        cnt = lk.slot_counts
    else:
        cnt = jnp.zeros((c,), jnp.int32).at[dst].add(
            jnp.where(ok, lk.counts, 0), mode="drop")
    touched_now = cnt > 0

    ctx = dict(hyper)
    ctx["step"] = step
    ctx["counts"] = (
        cnt[:, None].astype(table.value_dtype)
        if use_counts
        else jnp.ones((c, 1), table.value_dtype)
    )
    new_params, new_slots = update(
        table.values, {n: table.slots[n] for n in slot_names}, g_dense, ctx)

    m = touched_now[:, None]
    values = jnp.where(m, new_params.astype(table.value_dtype), table.values)
    slots = dict(table.slots)
    for n in slot_names:
        slots[n] = jnp.where(m, new_slots[n].astype(table.slots[n].dtype),
                             table.slots[n])
    versions = table.versions
    if versions is not None:
        versions = jnp.where(touched_now, step, versions)
    touched = table.touched
    if touched is not None:
        touched = touched | touched_now
    return table.replace(values=values, slots=slots, versions=versions,
                         touched=touched)


_COMPACT_K = 16384  # chunk width of the compact apply's while_loop


def _apply_compact(table, lk, grad, step, hyper, *, update, slot_names,
                   use_counts):
    """Touched-set sparse apply (round 4): capacity-INDEPENDENT update.

    The dense-masked apply reads+writes every [C, D] state array each step
    (~(2 + n_slots) full-capacity passes plus a dense [C, D] gradient
    buffer) — the reference's apply hot loop touches exactly the looked-up
    ids (training_ali_ops.cc:143-160), and this path restores that scaling
    on TPU with static shapes:

      1. sort batch positions by destination slot (masked positions sort
         last as ``dst == capacity``);
      2. segment-aggregate duplicate gradients into compact [U, D] rows
         with a contiguous-destination ``.at[seg].add`` (destinations are
         0..U-1 in order — cache-resident, unlike the random dense scatter)
         and recover the unique slot id per segment the same way;
      3. a ``lax.while_loop`` of ceil(U / K) chunks, each doing one K-row
         gather of values+slots, the update rule on [K, D], and K-row
         ``.set`` scatters back — only LIVE rows move, and the carry
         aliases in place (a no-op batch costs zero iterations).

    Numerically identical to the dense path up to f32 summation order of
    duplicate gradients.  Versions/touched update inside the chunk loop,
    so this path never materializes a dense per-slot count plane.
    """

    c = table.capacity
    n, d = grad.shape
    K = min(_COMPACT_K, _pow2ceil(n))
    n_pad = -(-n // K) * K
    ok = lk.valid & lk.admitted & (lk.slot_ids < c)
    dst = jnp.where(ok, lk.slot_ids, c).astype(jnp.int32)

    order = jnp.argsort(dst)
    sdst = dst[order]
    # Accumulate duplicate-position sums in f32 regardless of table dtype
    # (a raw bf16 .at[].add rounds per PARTIAL sum — the anti-pattern
    # segment_scatter documents; the dense path gets exact accumulation
    # from scatter_add_rows), then downcast ONCE to the table dtype so
    # both paths feed the update rule bit-identical aggregated gradients.
    acc_dt = jnp.promote_types(grad.dtype, jnp.float32)
    sgrad = grad.astype(acc_dt)[order]
    heads = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), sdst[1:] != sdst[:-1]])
    seg = jnp.cumsum(heads.astype(jnp.int32)) - 1
    # Compact per-unique sums: destinations are contiguous ascending, so
    # this scatter-add stays cache-resident (unlike the dense [C, D] one).
    g_u = jnp.zeros((n_pad, d), acc_dt).at[seg].add(sgrad).astype(
        table.value_dtype)
    u_dst = jnp.full((n_pad,), c, jnp.int32).at[seg].min(sdst)
    # u_dst is ascending with the pad value (c) last, masked positions
    # included (their segment's value IS c): live segment count =
    n_u = jnp.searchsorted(u_dst, jnp.int32(c)).astype(jnp.int32)
    if use_counts:
        scnt = jnp.where(ok, lk.counts, 0)[order]
        cnt_u = jnp.zeros((n_pad,), jnp.int32).at[seg].add(scnt)
    else:
        cnt_u = None

    dt = table.value_dtype
    arrs = (table.values,) + tuple(table.slots[s] for s in slot_names)
    versions, touched = table.versions, table.touched

    def cond(carry):
        return carry[0] * K < n_u

    def body(carry):
        i, arrs, versions, touched = carry
        # i*K + K <= n_pad always (n_pad is a K multiple): no clamp, no
        # overlap — a row is gathered+updated at most once.
        sl = jax.lax.dynamic_slice_in_dim(u_dst, i * K, K)
        gs = jax.lax.dynamic_slice_in_dim(g_u, i * K, K)
        slc = jnp.minimum(sl, c - 1)
        p = arrs[0][slc]
        s = {name: arrs[1 + j][slc] for j, name in enumerate(slot_names)}
        ctx = dict(hyper)
        ctx["step"] = step
        if cnt_u is None:
            ctx["counts"] = jnp.ones((K, 1), dt)
        else:
            ctx["counts"] = jax.lax.dynamic_slice_in_dim(
                cnt_u, i * K, K)[:, None].astype(dt)
        new_p, new_s = update(p, s, gs, ctx)
        out = [arrs[0].at[sl].set(new_p.astype(dt), mode="drop")]
        for j, name in enumerate(slot_names):
            out.append(arrs[1 + j].at[sl].set(
                new_s[name].astype(arrs[1 + j].dtype), mode="drop"))
        if versions is not None:
            versions = versions.at[sl].set(step, mode="drop")
        if touched is not None:
            touched = touched.at[sl].set(True, mode="drop")
        return i + 1, tuple(out), versions, touched

    _, arrs, versions, touched = jax.lax.while_loop(
        cond, body, (jnp.int32(0), arrs, versions, touched))
    slots = dict(table.slots)
    for j, name in enumerate(slot_names):
        slots[name] = arrs[1 + j]
    return table.replace(values=arrs[0], slots=slots, versions=versions,
                         touched=touched)


def _pow2ceil(x: int) -> int:
    return 1 << max(0, int(x - 1).bit_length())


# ---------------------------------------------------------------------------
# Update rules.  All operate on [U, D] f32 rows; ctx carries hyperparams.


def with_lr_schedule(opt: SparseOptimizer,
                     schedule: Callable) -> SparseOptimizer:
    """Wrap a sparse optimizer so its learning rate is ``schedule(step)``,
    evaluated INSIDE the jitted update rule — no retrace per step (the
    reference composes tf.train.exponential_decay etc. with its EV
    optimizers; this is that capability on the sparse path)."""

    base_update = opt.update

    def update(p, slots, g, ctx):
        ctx = dict(ctx)
        ctx["lr"] = schedule(ctx["step"])
        return base_update(p, slots, g, ctx)

    return dataclasses.replace(opt, name=f"{opt.name}_sched", update=update)


def _adagrad_update(p, s, g, ctx):
    # KvSparseApplyAdagrad: a += g^2; v -= lr * g * rsqrt(a)
    # (training_ali_ops.cc:143-160)
    a = s["accumulator"] + jnp.square(g)
    p = p - ctx["lr"] * g * jax.lax.rsqrt(a + ctx["epsilon"])
    return p, {"accumulator": a}


def adagrad(lr: float = 0.01, initial_accumulator_value: float = 0.1,
            epsilon: float = 0.0) -> SparseOptimizer:
    return SparseOptimizer(
        name="Adagrad",
        slot_names=("accumulator",),
        slot_widths=(None,),
        slot_inits=(initial_accumulator_value,),
        update=_adagrad_update,
        hyper={"lr": lr, "epsilon": epsilon},
    )


def _adagrad_decay_update(p, s, g, ctx):
    # AdagradDecay (adagrad_decay.py / ApplyAdagradDecay): every
    # ``decay_step`` global steps the accumulator is scaled by decay_rate,
    # with a floor at ``decay_baseline``.  Per-row application: decay is
    # applied when the row's recorded decay period lags the global one.
    period = (ctx["step"] // ctx["decay_step"]).astype(jnp.float32)
    row_period = s["decay_counter"]  # [U, 1] — last decay period applied to row
    # A FRESH row (sentinel counter < 0) starts at the CURRENT period: a
    # key that did not exist cannot have lived through past decay periods
    # — decaying its initial accumulator by decay_rate^period gave late-
    # inserted keys a near-unbounded first step (round-4 review; the dense
    # twin decays only incrementally).
    prev = jnp.where(row_period[:, 0] < 0.0, period, row_period[:, 0])
    lag = jnp.maximum(period - prev, 0.0)
    decay = jnp.power(ctx["decay_rate"], lag)[:, None]
    a = jnp.maximum(s["accumulator"] * decay, ctx["decay_baseline"])
    a = a + jnp.square(g)
    p = p - ctx["lr"] * g * jax.lax.rsqrt(a + 1e-10)
    return p, {"accumulator": a, "decay_counter": jnp.full_like(row_period, period)}


def adagrad_decay(lr: float = 0.01, initial_accumulator_value: float = 0.1,
                  decay_step: int = 100000, decay_rate: float = 0.9,
                  decay_baseline: float = 1e-7) -> SparseOptimizer:
    return SparseOptimizer(
        name="AdagradDecay",
        slot_names=("accumulator", "decay_counter"),
        slot_widths=(None, 1),
        slot_inits=(initial_accumulator_value, -1.0),
        update=_adagrad_decay_update,
        hyper={"lr": lr, "decay_step": decay_step, "decay_rate": decay_rate,
               "decay_baseline": decay_baseline},
    )


def _adam_update(p, s, g, ctx):
    # Standard Adam with global-step bias correction (KvSparseApplyAdam).
    t = ctx["step"].astype(jnp.float32) + 1.0
    b1, b2 = ctx["beta1"], ctx["beta2"]
    m = b1 * s["m"] + (1.0 - b1) * g
    v = b2 * s["v"] + (1.0 - b2) * jnp.square(g)
    lr_t = ctx["lr"] * jnp.sqrt(1.0 - jnp.power(b2, t)) / (1.0 - jnp.power(b1, t))
    p = p - lr_t * m / (jnp.sqrt(v) + ctx["epsilon"])
    return p, {"m": m, "v": v}


def adam(lr: float = 0.001, beta1: float = 0.9, beta2: float = 0.999,
         epsilon: float = 1e-8) -> SparseOptimizer:
    return SparseOptimizer(
        name="Adam",
        slot_names=("m", "v"),
        slot_widths=(None, None),
        slot_inits=(0.0, 0.0),
        update=_adam_update,
        hyper={"lr": lr, "beta1": beta1, "beta2": beta2, "epsilon": epsilon},
    )


def _adam_async_update(p, s, g, ctx):
    # AdamAsync (training_ali_ops.cc ApplyAdamAsync, adam_async.py): each row
    # carries its own beta1_power/beta2_power, advanced only when the row is
    # updated — correct bias correction under async/sparse touching without a
    # global dense counter.
    b1, b2 = ctx["beta1"], ctx["beta2"]
    b1p = s["beta1_power"][:, 0] * b1
    b2p = s["beta2_power"][:, 0] * b2
    m = b1 * s["m"] + (1.0 - b1) * g
    v = b2 * s["v"] + (1.0 - b2) * jnp.square(g)
    lr_t = ctx["lr"] * jnp.sqrt(1.0 - b2p) / (1.0 - b1p)
    p = p - lr_t[:, None] * m / (jnp.sqrt(v) + ctx["epsilon"])
    return p, {"m": m, "v": v, "beta1_power": b1p[:, None], "beta2_power": b2p[:, None]}


def adam_async(lr: float = 0.001, beta1: float = 0.9, beta2: float = 0.999,
               epsilon: float = 1e-8) -> SparseOptimizer:
    return SparseOptimizer(
        name="AdamAsync",
        slot_names=("m", "v", "beta1_power", "beta2_power"),
        slot_widths=(None, None, 1, 1),
        slot_inits=(0.0, 0.0, 1.0, 1.0),
        update=_adam_async_update,
        hyper={"lr": lr, "beta1": beta1, "beta2": beta2, "epsilon": epsilon},
    )


def _adamw_update(p, s, g, ctx):
    t = ctx["step"].astype(jnp.float32) + 1.0
    b1, b2 = ctx["beta1"], ctx["beta2"]
    m = b1 * s["m"] + (1.0 - b1) * g
    v = b2 * s["v"] + (1.0 - b2) * jnp.square(g)
    lr_t = ctx["lr"] * jnp.sqrt(1.0 - jnp.power(b2, t)) / (1.0 - jnp.power(b1, t))
    p = p - lr_t * m / (jnp.sqrt(v) + ctx["epsilon"]) - ctx["lr"] * ctx["weight_decay"] * p
    return p, {"m": m, "v": v}


def adamw(lr: float = 0.001, beta1: float = 0.9, beta2: float = 0.999,
          epsilon: float = 1e-8, weight_decay: float = 0.01) -> SparseOptimizer:
    return SparseOptimizer(
        name="AdamW",
        slot_names=("m", "v"),
        slot_widths=(None, None),
        slot_inits=(0.0, 0.0),
        update=_adamw_update,
        hyper={"lr": lr, "beta1": beta1, "beta2": beta2, "epsilon": epsilon,
               "weight_decay": weight_decay},
    )


def _ftrl_update(p, s, g, ctx):
    # KvSparseApplyFtrl (training_ali_ops.cc): accum/linear formulation with
    # accum^{-lr_power}; learning_rate_power is validated <= 0 (TF semantics),
    # so -lr_power >= 0 and step sizes SHRINK as the accumulator grows
    # (lr_power=-0.5 -> the classic sqrt(accum) schedule).
    lr, l1, l2, power = ctx["lr"], ctx["l1"], ctx["l2"], ctx["lr_power"]
    a = s["accumulator"]
    a_new = a + jnp.square(g)
    sigma = (jnp.power(a_new, -power) - jnp.power(a, -power)) / lr
    lin = s["linear"] + g - sigma * p
    quad = jnp.power(a_new, -power) / lr + 2.0 * l2
    l1_reg = jnp.clip(lin, -l1, l1)
    p = jnp.where(jnp.abs(lin) > l1, (l1_reg - lin) / quad, 0.0)
    return p, {"accumulator": a_new, "linear": lin}


def ftrl(lr: float = 0.01, initial_accumulator_value: float = 0.1,
         l1: float = 0.0, l2: float = 0.0, lr_power: float = -0.5) -> SparseOptimizer:
    if lr_power > 0:
        raise ValueError(
            f"lr_power must be <= 0 (got {lr_power}); positive values grow "
            "the step size as the accumulator grows and diverge")
    return SparseOptimizer(
        name="Ftrl",
        slot_names=("accumulator", "linear"),
        slot_widths=(None, None),
        slot_inits=(initial_accumulator_value, 0.0),
        update=_ftrl_update,
        hyper={"lr": lr, "l1": l1, "l2": l2, "lr_power": lr_power},
    )


def _sgd_update(p, s, g, ctx):
    return p - ctx["lr"] * g, {}


def sgd(lr: float = 0.01) -> SparseOptimizer:
    # KvResourceSparseApplyGradientDescent
    return SparseOptimizer(
        name="GradientDescent",
        slot_names=(),
        slot_widths=(),
        slot_inits=(),
        update=_sgd_update,
        hyper={"lr": lr},
    )


def _momentum_update(p, s, g, ctx):
    m = ctx["momentum"] * s["momentum"] + g
    return p - ctx["lr"] * m, {"momentum": m}


def momentum(lr: float = 0.01, momentum_val: float = 0.9) -> SparseOptimizer:
    return SparseOptimizer(
        name="Momentum",
        slot_names=("momentum",),
        slot_widths=(None,),
        slot_inits=(0.0,),
        update=_momentum_update,
        hyper={"lr": lr, "momentum": momentum_val},
    )


ALL = {
    "adagrad": adagrad,
    "adagrad_decay": adagrad_decay,
    "adam": adam,
    "adam_async": adam_async,
    "adamw": adamw,
    "ftrl": ftrl,
    "sgd": sgd,
    "momentum": momentum,
}


def get(name: str, **kwargs) -> SparseOptimizer:
    return ALL[name](**kwargs)
