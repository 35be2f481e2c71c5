"""Sparse optimizer tests: numeric parity with dense reference implementations
plus the optimizer × filter semantic matrix.

Modeled on the reference's exhaustive matrix in
python/ops/embedding_variable_ops_test.py (every optimizer × filter combo).
Each sparse optimizer applied to a single always-admitted key must match the
same update rule applied to a dense 1-row parameter.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeprec_tpu import config as cfg
from deeprec_tpu.embedding import table as ev
from deeprec_tpu.optimizers import sparse

OPTS = {
    "sgd": lambda: sparse.sgd(lr=0.1),
    "adagrad": lambda: sparse.adagrad(lr=0.1, initial_accumulator_value=0.1),
    "adagrad_decay": lambda: sparse.adagrad_decay(lr=0.1, decay_step=2, decay_rate=0.9),
    "adam": lambda: sparse.adam(lr=0.1),
    "adam_async": lambda: sparse.adam_async(lr=0.1),
    "adamw": lambda: sparse.adamw(lr=0.1, weight_decay=0.01),
    "ftrl": lambda: sparse.ftrl(lr=0.1),
    "momentum": lambda: sparse.momentum(lr=0.1),
}


def dense_reference(name, p0, grads):
    """Reference dense implementation of each update rule, numpy float32."""

    p = p0.copy()
    if name == "sgd":
        for g in grads:
            p -= 0.1 * g
    elif name == "adagrad":
        a = np.full_like(p, 0.1)
        for g in grads:
            a += g * g
            p -= 0.1 * g / np.sqrt(a)
    elif name == "adagrad_decay":
        a = np.full_like(p, 0.1)
        rowp = 0.0
        for t, g in enumerate(grads):
            period = t // 2
            lag = max(period - rowp, 0)
            a = np.maximum(a * 0.9 ** lag, 1e-7)
            rowp = period
            a += g * g
            p -= 0.1 * g / np.sqrt(a + 1e-10)
    elif name in ("adam", "adamw"):
        m = np.zeros_like(p)
        v = np.zeros_like(p)
        for t, g in enumerate(grads):
            m = 0.9 * m + 0.1 * g
            v = 0.999 * v + 0.001 * g * g
            lr_t = 0.1 * np.sqrt(1 - 0.999 ** (t + 1)) / (1 - 0.9 ** (t + 1))
            decay = 0.1 * 0.01 * p if name == "adamw" else 0.0
            p = p - lr_t * m / (np.sqrt(v) + 1e-8) - decay
    elif name == "adam_async":
        m = np.zeros_like(p)
        v = np.zeros_like(p)
        b1p, b2p = 1.0, 1.0
        for g in grads:
            b1p *= 0.9
            b2p *= 0.999
            m = 0.9 * m + 0.1 * g
            v = 0.999 * v + 0.001 * g * g
            lr_t = 0.1 * np.sqrt(1 - b2p) / (1 - b1p)
            p -= lr_t * m / (np.sqrt(v) + 1e-8)
    elif name == "ftrl":
        # TF/DeepRec FTRL with learning_rate_power=-0.5: the accumulator
        # enters as new_accum^{-lr_power} = sqrt(new_accum).
        a = np.full_like(p, 0.1)
        lin = np.zeros_like(p)
        for g in grads:
            a_new = a + g * g
            sigma = (a_new ** 0.5 - a ** 0.5) / 0.1
            lin += g - sigma * p
            quad = a_new ** 0.5 / 0.1
            p = np.where(np.abs(lin) > 0.0, (np.clip(lin, 0, 0) - lin) / quad, 0.0)
            a = a_new
    elif name == "momentum":
        mom = np.zeros_like(p)
        for g in grads:
            mom = 0.9 * mom + g
            p -= 0.1 * mom
    return p


@pytest.mark.parametrize("name", sorted(OPTS))
def test_matches_dense_reference(name):
    dim = 4
    opt = cfg.EmbeddingVariableOption(init=cfg.InitializerOption(initializer="zeros"))
    t = ev.create("t", dim=dim, capacity=64, option=opt)
    o = OPTS[name]()
    t = o.init(t)
    rng = np.random.RandomState(0)
    grads = [rng.randn(dim).astype(np.float32) for _ in range(5)]
    ids = jnp.array([11], jnp.int32)
    for step, g in enumerate(grads):
        t, lk = ev.lookup_phase(t, ids, step=step)
        gu = jnp.zeros((lk.uids.shape[0], dim), jnp.float32)
        gu = gu.at[jnp.argmax(lk.uids == 11)].set(g)
        t = o.apply(t, lk, gu, step=step)
    got = np.asarray(ev.lookup(t, ids))[0]
    want = dense_reference(name, np.zeros(dim, np.float32), grads)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("name", sorted(OPTS))
@pytest.mark.parametrize("filt", ["counter", "cbf"])
def test_optimizer_filter_matrix(name, filt):
    """Un-admitted keys must receive no updates; once admitted, updates apply."""

    dim = 4
    if filt == "counter":
        opt = cfg.EmbeddingVariableOption(
            counter_filter=cfg.CounterFilterOption(filter_freq=2),
            init=cfg.InitializerOption(initializer="zeros"),
        )
    else:
        opt = cfg.EmbeddingVariableOption(
            cbf_filter=cfg.CBFFilterOption(filter_freq=2, max_element_size=100),
            init=cfg.InitializerOption(initializer="zeros"),
        )
    t = ev.create("t", dim=dim, capacity=64, option=opt)
    o = OPTS[name]()
    t = o.init(t)
    g = np.ones(dim, np.float32)
    ids = jnp.array([5], jnp.int32)

    # step 0: freq 1 < 2 — no update possible
    t, lk = ev.lookup_phase(t, ids, step=0)
    assert not bool(lk.admitted[jnp.argmax(lk.uids == 5)]) or filt == "cbf" and False
    gu = jnp.broadcast_to(g, (lk.uids.shape[0], dim))
    t = o.apply(t, lk, gu, step=0)
    if filt == "counter":
        # key exists but value untouched (reads no-permission default = 0)
        assert int(t.size) == 1
    else:
        # key not even inserted
        assert int(t.size) == 0

    # step 1: freq reaches 2 — admitted, update applies
    t, lk = ev.lookup_phase(t, ids, step=1)
    assert bool(lk.admitted[jnp.argmax(lk.uids == 5)])
    gu = jnp.zeros((lk.uids.shape[0], dim), jnp.float32)
    gu = gu.at[jnp.argmax(lk.uids == 5)].set(jnp.asarray(g))
    t = o.apply(t, lk, gu, step=1)
    got = np.asarray(ev.lookup(t, ids))[0]
    assert not np.allclose(got, 0.0), f"{name}+{filt}: admitted key not updated"


def test_with_counts_scales_freq():
    """WithCounts variants receive per-id batch counts in ctx (the
    *_with_counts op family)."""

    def spy_update(p, s, g, ctx):
        # write the received count into the row so the test can observe it
        # (engine v2: ctx["counts"] is the per-slot [C, 1] count plane)
        return jnp.broadcast_to(ctx["counts"], p.shape), {}

    o = sparse.SparseOptimizer(
        name="spy", slot_names=(), slot_widths=(), slot_inits=(),
        update=spy_update, hyper={},
    )
    t = ev.create("t", dim=2, capacity=64)
    t = o.init(t)
    ids = jnp.array([1, 1, 1, 2], jnp.int32)
    t, lk = ev.lookup_phase(t, ids)
    t = o.apply(t, lk, jnp.zeros((lk.uids.shape[0], 2)), use_counts=True)
    rows = np.asarray(ev.lookup(t, jnp.array([1, 2], jnp.int32)))
    np.testing.assert_allclose(rows[0], [3.0, 3.0])
    np.testing.assert_allclose(rows[1], [1.0, 1.0])


def test_duplicate_ids_single_update():
    """Dedup semantics: a key appearing k times in the batch gets ONE update
    with the summed gradient (embedding_lookup_sparse unique+segment path)."""

    t = ev.create("t", dim=2, capacity=64,
                  option=cfg.EmbeddingVariableOption(
                      init=cfg.InitializerOption(initializer="zeros")))
    o = sparse.sgd(lr=1.0)
    t = o.init(t)
    ids = jnp.array([7, 7, 7], jnp.int32)
    t, lk = ev.lookup_phase(t, ids)
    # model loss sums over batch rows -> grad w.r.t. gathered row = 3 * g_row
    per_row = jnp.ones((3, 2))
    gu = jax.ops.segment_sum(per_row, lk.inverse, num_segments=lk.uids.shape[0])
    t = o.apply(t, lk, gu)
    got = np.asarray(ev.lookup(t, jnp.array([7], jnp.int32)))[0]
    np.testing.assert_allclose(got, [-3.0, -3.0])


@pytest.mark.parametrize("name", sorted(OPTS))
@pytest.mark.parametrize("policy", ["ttl", "l2"])
def test_optimizer_eviction_matrix(name, policy):
    """Every optimizer × shrink policy (globalstep_shrink_policy.h /
    l2weight_shrink_policy.h): eviction drops the stale/weak key and keeps
    the live one, and a re-inserted key restarts from FRESH optimizer state
    (slot re-init — no inherited accumulators, no NaN), the reference's
    evict-then-recreate semantics."""

    dim = 4
    if policy == "ttl":
        opt = cfg.EmbeddingVariableOption(
            init=cfg.InitializerOption(initializer="zeros"),
            global_step_evict=cfg.GlobalStepEvictOption(steps_to_live=5))
    else:
        opt = cfg.EmbeddingVariableOption(
            init=cfg.InitializerOption(initializer="zeros"),
            l2_weight_evict=cfg.L2WeightEvictOption(l2_weight_threshold=1e-6))
    t = ev.create("t", dim=dim, capacity=64, option=opt)
    o = OPTS[name]()
    t = o.init(t)
    rng = np.random.RandomState(1)
    g_big = rng.randn(dim).astype(np.float32)

    # key 7: one zero-gradient touch at step 0 (stale, weight stays 0 —
    # adaptive optimizers would turn any nonzero grad into an lr-sized
    # step, so only an exact zero keeps the L2 norm below threshold);
    # key 9: real updates at steps 0..2 (fresh + substantial weight)
    for step in range(3):
        ids = jnp.array([7, 9] if step == 0 else [9], jnp.int32)
        t, lk = ev.lookup_phase(t, ids, step=step)
        g = np.tile(g_big[None], (int(lk.uids.shape[0]), 1))
        if step == 0:
            g[0] = 0.0                         # position of key 7
        t = o.apply(t, lk, jnp.asarray(g), step=step)
    val9 = np.asarray(ev.lookup(t, jnp.array([9], jnp.int32)))[0].copy()

    t = ev.shrink(t, step=7)   # ttl: 7-0 > 5 evicts key 7; 7-2 = 5 keeps 9
    got = np.asarray(ev.contains(t, jnp.array([7, 9], jnp.int32)))
    assert list(got) == [False, True], (name, policy, got)
    np.testing.assert_array_equal(
        np.asarray(ev.lookup(t, jnp.array([9], jnp.int32)))[0], val9)

    # re-insert 7: optimizer state must be fresh (slot re-init — a recycled
    # accumulator would diverge or NaN: rsqrt(0) is what slot_inits guards)
    g2 = rng.randn(dim).astype(np.float32)
    t, lk = ev.lookup_phase(t, jnp.array([7], jnp.int32), step=8)
    slot7 = int(lk.slot_ids[0])
    for sname, sinit in t.slot_inits:
        np.testing.assert_array_equal(
            np.asarray(t.slots[sname][slot7]),
            np.full_like(np.asarray(t.slots[sname][slot7]), sinit),
            err_msg=f"{name}/{policy}: slot {sname} not re-initialized")
    t = o.apply(t, lk, jnp.asarray(g2)[None], step=8)
    got = np.asarray(ev.lookup(t, jnp.array([7], jnp.int32)))[0]
    assert np.isfinite(got).all(), (name, policy, got)
    if name in ("sgd", "adagrad", "ftrl", "momentum"):
        # step-independent rules: first update matches the dense reference
        # from scratch exactly (adam-family bias correction uses the GLOBAL
        # step like the reference's shared beta-power variables, so their
        # first-step magnitude legitimately differs)
        want = dense_reference(name, np.zeros(dim, np.float32), [g2])
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("name", sorted(OPTS))
@pytest.mark.parametrize("use_counts", [False, True])
def test_compact_apply_parity(name, use_counts):
    """The touched-set (compact) apply must match the dense-masked apply
    bit-for-bit up to f32 summation order of duplicate gradients — on a
    batch with duplicates, masked padding, an un-admitted tail (counter
    filter) and untouched rows (round 4, optimizers/sparse._apply_compact;
    reference per-id apply: training_ali_ops.cc:143-160)."""

    dim = 8
    opt = cfg.EmbeddingVariableOption(
        counter_filter=cfg.CounterFilterOption(filter_freq=2),
        init=cfg.InitializerOption(initializer="zeros"))
    rng = np.random.RandomState(3)
    ids_np = rng.randint(0, 500, size=300)
    ids_np[::17] = ev.empty_key(jnp.int32)       # padding positions
    ids = jnp.asarray(ids_np, jnp.int32)
    g = jnp.asarray(rng.randn(300, dim), jnp.float32)

    tabs = {}
    for strat in ("dense", "compact"):
        t = ev.create("t", dim=dim, capacity=1024, option=opt)
        o = OPTS[name]()
        t = o.init(t)
        for step in range(3):   # step 0 leaves ids un-admitted (freq 1 < 2)
            t, lk = ev.lookup_phase(t, ids, step=step, train=True)
            t = o.apply(t, lk, g, step=step, use_counts=use_counts,
                        strategy=strat)
        tabs[strat] = t
    td, tc = tabs["dense"], tabs["compact"]
    np.testing.assert_allclose(np.asarray(td.values), np.asarray(tc.values),
                               rtol=1e-6, atol=1e-6)
    for s in td.slots:
        np.testing.assert_allclose(np.asarray(td.slots[s]),
                                   np.asarray(tc.slots[s]),
                                   rtol=1e-6, atol=1e-6, err_msg=s)
    np.testing.assert_array_equal(np.asarray(td.versions),
                                  np.asarray(tc.versions))
    np.testing.assert_array_equal(np.asarray(td.touched),
                                  np.asarray(tc.touched))


def test_compact_apply_zero_batch_free():
    """A fully-masked batch must take ZERO chunk iterations (the while_loop
    carry aliases in place) and leave the table bit-identical."""

    t = ev.create("t", dim=4, capacity=256)
    o = sparse.adagrad(lr=0.1)
    t = o.init(t)
    ids = jnp.full((64,), ev.empty_key(jnp.int32), jnp.int32)
    t1, lk = ev.lookup_phase(t, ids, step=0, train=True)
    t2 = o.apply(t1, lk, jnp.ones((64, 4)), step=0, strategy="compact")
    np.testing.assert_array_equal(np.asarray(t1.values), np.asarray(t2.values))
    np.testing.assert_array_equal(np.asarray(t1.versions),
                                  np.asarray(t2.versions))


def test_with_lr_schedule_matches_manual():
    """with_lr_schedule(opt, f): lr becomes f(step) inside the jitted rule —
    step-0 matches the base optimizer at f(0), a later step matches a base
    optimizer constructed with lr=f(step)."""

    import jax.numpy as jnp
    from deeprec_tpu import config as cfg

    def sched(step):
        return 0.2 * jnp.power(0.5, step.astype(jnp.float32) / 10.0)

    def run(opt, step):
        t = ev.create("t", dim=4, capacity=256,
                      option=cfg.EmbeddingVariableOption())
        t = opt.init(t)
        ids = jnp.asarray([5, 9, 5], jnp.int32)
        t, lk = ev.lookup_phase(t, ids, step=step)
        g = jnp.full((3, 4), 0.5)
        t = opt.apply(t, lk, g, step=step)
        return np.asarray(ev.lookup(t, ids))

    sopt = sparse.with_lr_schedule(sparse.adagrad(lr=123.0), sched)
    np.testing.assert_allclose(run(sopt, 0), run(sparse.adagrad(lr=0.2), 0),
                               rtol=1e-6)
    np.testing.assert_allclose(run(sopt, 20),
                               run(sparse.adagrad(lr=0.05), 20), rtol=1e-6)
