"""Unit tests for the core hash embedding table.

Modeled on the reference's embedding_variable_ops_test.py coverage
(python/ops/embedding_variable_ops_test.py:219-1027): insert/lookup, dedup,
growth, filters, eviction, freq/version tracking.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeprec_tpu import config as cfg
from deeprec_tpu.embedding import table as ev


def test_insert_and_lookup_roundtrip():
    t = ev.create("t", dim=8, capacity=256)
    ids = jnp.array([5, 9, 5, 123, 9, 9], jnp.int32)
    t, lk = ev.lookup_phase(t, ids, step=0)
    g = ev.collect(t, lk)
    emb = g[lk.inverse]
    assert emb.shape == (6, 8)
    # duplicate ids get identical rows
    np.testing.assert_array_equal(emb[0], emb[2])
    np.testing.assert_array_equal(emb[1], emb[4])
    assert int(t.size) == 3
    # second lookup: same rows, no new inserts
    t2, lk2 = ev.lookup_phase(t, ids, step=1)
    emb2 = ev.collect(t2, lk2)[lk2.inverse]
    np.testing.assert_array_equal(np.asarray(emb), np.asarray(emb2))
    assert int(t2.size) == 3


def test_deterministic_init_across_tables():
    # Same key must get the same initial row in two different table instances
    # (default-value pool keyed by id hash).
    t1 = ev.create("a", dim=4, capacity=128)
    t2 = ev.create("b", dim=4, capacity=512)
    ids = jnp.arange(10, dtype=jnp.int32)
    t1, lk1 = ev.lookup_phase(t1, ids)
    t2, lk2 = ev.lookup_phase(t2, ids)
    np.testing.assert_array_equal(
        np.asarray(ev.collect(t1, lk1)[lk1.inverse]),
        np.asarray(ev.collect(t2, lk2)[lk2.inverse]),
    )


def test_many_keys_no_collision_loss():
    t = ev.create("t", dim=4, capacity=4096)
    rng = np.random.RandomState(0)
    ids = rng.choice(10**9, size=2000, replace=False).astype(np.int32)
    t, lk = ev.lookup_phase(t, jnp.asarray(ids))
    assert int(t.size) == 2000
    assert bool(jnp.all(lk.slot_ids[lk.valid] < t.capacity))
    # every id maps to a distinct slot
    slots = np.asarray(lk.slot_ids[lk.valid])
    assert len(np.unique(slots)) == 2000
    # re-find every key read-only
    found = ev.contains(t, jnp.asarray(ids))
    assert bool(jnp.all(found))


def test_growth_preserves_content():
    t = ev.create("t", dim=8, capacity=64)
    ids = jnp.arange(50, dtype=jnp.int32)
    t, lk = ev.lookup_phase(t, ids)
    before = np.asarray(ev.collect(t, lk)[lk.inverse])
    assert ev.needs_grow(t)
    t = ev.maybe_grow(t)
    assert t.capacity >= 128
    assert int(t.size) == 50
    after = np.asarray(ev.lookup(t, ids))
    np.testing.assert_array_equal(before, after)


def test_overflow_triggers_growth_hint():
    t = ev.create("t", dim=2, capacity=32)
    ids = jnp.arange(64, dtype=jnp.int32)
    t, lk = ev.lookup_phase(t, ids)
    # table can hold at most 32; the rest must flag overflow, not corrupt
    assert int(t.size) <= 32
    assert int(t.growth_hint) > 0
    # trainer loop behavior: grow between steps, retry lookups next step
    for _ in range(5):
        t = ev.maybe_grow(t)
        t, lk = ev.lookup_phase(t, ids)
        if int(t.size) == 64:
            break
    assert int(t.size) == 64
    assert t.capacity >= 64


def test_counter_filter_admission():
    opt = cfg.EmbeddingVariableOption(
        counter_filter=cfg.CounterFilterOption(filter_freq=3),
        default_value_no_permission=0.0,
    )
    t = ev.create("t", dim=4, capacity=128, option=opt)
    ids = jnp.array([7, 7], jnp.int32)
    # freq 2 after first batch -> not admitted
    t, lk = ev.lookup_phase(t, ids, step=0)
    assert not bool(lk.admitted[lk.valid][0])
    g = ev.collect(t, lk)
    np.testing.assert_array_equal(np.asarray(g[lk.inverse]), np.zeros((2, 4)))
    # freq 4 after second batch -> admitted, reads real row
    t, lk = ev.lookup_phase(t, ids, step=1)
    assert bool(lk.admitted[lk.valid][0])
    g = ev.collect(t, lk)[lk.inverse]
    assert not np.allclose(np.asarray(g), 0.0)


def test_cbf_filter_blocks_table_insert():
    opt = cfg.EmbeddingVariableOption(
        cbf_filter=cfg.CBFFilterOption(filter_freq=3, max_element_size=1000),
    )
    t = ev.create("t", dim=4, capacity=128, option=opt)
    ids = jnp.array([42], jnp.int32)
    t, lk = ev.lookup_phase(t, ids, step=0)  # cbf count 1 < 3: no insert
    assert int(t.size) == 0
    t, lk = ev.lookup_phase(t, ids, step=1)  # count 2 < 3
    assert int(t.size) == 0
    t, lk = ev.lookup_phase(t, ids, step=2)  # count 3 >= 3: inserted
    assert int(t.size) == 1
    assert bool(lk.admitted[lk.valid][0])


def test_freq_and_version_tracking():
    t = ev.create("t", dim=4, capacity=128)
    t, _ = ev.lookup_phase(t, jnp.array([1, 1, 2], jnp.int32), step=5)
    t, _ = ev.lookup_phase(t, jnp.array([1], jnp.int32), step=9)
    f = np.asarray(ev.get_frequency(t, jnp.array([1, 2, 99], jnp.int32)))
    np.testing.assert_array_equal(f, [3, 1, 0])
    v = np.asarray(ev.get_version(t, jnp.array([1, 2, 99], jnp.int32)))
    # version = insert step until an optimizer update bumps it
    np.testing.assert_array_equal(v, [5, 5, -1])


def test_global_step_eviction():
    # Version = last *update* step (UpdateVersion in the sparse-apply kernels,
    # training_ali_ops.cc:143-160): a lookup alone does not refresh TTL.
    from deeprec_tpu.optimizers import sparse

    opt = cfg.EmbeddingVariableOption(
        global_step_evict=cfg.GlobalStepEvictOption(steps_to_live=10),
    )
    t = ev.create("t", dim=4, capacity=128, option=opt)
    o = sparse.sgd(lr=0.1)
    t = o.init(t)
    t, _ = ev.lookup_phase(t, jnp.array([1, 2], jnp.int32), step=0)
    t, lk = ev.lookup_phase(t, jnp.array([2], jnp.int32), step=8)
    t = o.apply(t, lk, jnp.zeros((lk.uids.shape[0], 4)), step=8)
    t = ev.shrink(t, step=15)  # key 1 age 15 > 10 evicted; key 2 age 7 kept
    c = np.asarray(ev.contains(t, jnp.array([1, 2], jnp.int32)))
    np.testing.assert_array_equal(c, [False, True])
    assert int(t.size) == 1


def test_l2_eviction():
    opt = cfg.EmbeddingVariableOption(
        l2_weight_evict=cfg.L2WeightEvictOption(l2_weight_threshold=1e-8),
        init=cfg.InitializerOption(initializer="zeros"),
    )
    t = ev.create("t", dim=4, capacity=128, option=opt)
    t, lk = ev.lookup_phase(t, jnp.array([1, 2], jnp.int32))
    # give key 2 a non-trivial row
    s = lk.slot_ids[jnp.argmax(lk.uids == 2)]
    t = t.replace(values=t.values.at[s].set(jnp.ones(4)))
    t = ev.shrink(t, step=0)
    c = np.asarray(ev.contains(t, jnp.array([1, 2], jnp.int32)))
    np.testing.assert_array_equal(c, [False, True])


def test_remove():
    t = ev.create("t", dim=4, capacity=128)
    t, _ = ev.lookup_phase(t, jnp.arange(10, dtype=jnp.int32))
    t = ev.remove(t, jnp.array([3, 4], jnp.int32))
    c = np.asarray(ev.contains(t, jnp.arange(10, dtype=jnp.int32)))
    np.testing.assert_array_equal(c, [1, 1, 1, 0, 0, 1, 1, 1, 1, 1])
    assert int(t.size) == 8


def test_inference_mode_does_not_insert():
    t = ev.create("t", dim=4, capacity=128)
    t2, lk = ev.lookup_phase(t, jnp.array([1, 2], jnp.int32), train=False)
    assert int(t2.size) == 0
    g = ev.collect(t2, lk)[lk.inverse]
    np.testing.assert_array_equal(np.asarray(g), np.zeros((2, 4)))


def test_lookup_phase_jits():
    t = ev.create("t", dim=8, capacity=256)

    @jax.jit
    def step(t, ids):
        t, lk = ev.lookup_phase(t, ids, step=0)
        return t, ev.collect(t, lk)[lk.inverse]

    t, e1 = step(t, jnp.array([10, 20, 10], jnp.int32))
    t, e2 = step(t, jnp.array([10, 30, 20], jnp.int32))
    np.testing.assert_array_equal(np.asarray(e1[0]), np.asarray(e2[0]))
    assert int(t.size) == 3


def test_recycled_slot_rows_reinitialized():
    """Regression: after a rebuild (grow/evict), a NEW key inserted into a
    recycled slot must get the optimizer slot INIT value, not the zero left
    by the rebuild fill — adagrad with eps=0 otherwise produces
    rsqrt(0)*0 = NaN on its first zero-gradient apply."""

    from deeprec_tpu.optimizers import sparse

    o = sparse.adagrad(lr=0.1, initial_accumulator_value=0.1)
    t = ev.create("t", dim=4, capacity=64)
    t = o.init(t)
    t, _ = ev.lookup_phase(t, jnp.arange(30, dtype=jnp.int32), step=0)
    t = ev.remove(t, jnp.arange(30, dtype=jnp.int32))  # rebuild zero-fills
    # new keys land on recycled rows
    t, lk = ev.lookup_phase(t, jnp.arange(100, 130, dtype=jnp.int32), step=1)
    acc = t.slots["accumulator"].at[
        jnp.where(lk.slot_ids < t.capacity, lk.slot_ids, t.capacity)
    ].get(mode="fill", fill_value=-1.0)
    valid = lk.valid & (lk.slot_ids < t.capacity)
    assert float(jnp.min(jnp.where(valid[:, None], acc, 1.0))) >= 0.1 - 1e-6
    # zero-gradient apply must stay finite
    t = o.apply(t, lk, jnp.zeros((lk.uids.shape[0], 4)), step=1)
    emb = ev.lookup(t, jnp.arange(100, 130, dtype=jnp.int32))
    assert bool(jnp.all(jnp.isfinite(emb)))



def test_hot_path_has_no_cond_over_table_buffers():
    """Regression guard for the round-2c control-flow finding: `lax.cond`
    pays a pass-through copy of its operands on TPU (~6 ms at [524k, 32]),
    so the training lookup/apply hot path must gate optional work with
    while_loops (carry aliased in place), never cond.  Asserts at the
    jaxpr level so it holds on every backend."""

    import jax
    from deeprec_tpu.optimizers import sparse as sp

    table = ev.create("guard", dim=8, capacity=1024)
    table = sp.adagrad().init(table)
    ids = jnp.arange(64, dtype=table.key_dtype)

    def step(t, ids):
        t2, lk = ev._lookup_phase(t, ids, step=1, train=True)
        rows = ev._collect(t2, lk)
        return sp.adagrad().apply(t2, lk, rows * 0.01, step=1)

    jaxpr = jax.make_jaxpr(step)(table, ids)

    def find_conds(jxp, out):
        for eqn in jxp.eqns:
            if eqn.primitive.name == "cond":
                out.append(eqn)
            for p in eqn.params.values():
                vals = p if isinstance(p, (tuple, list)) else [p]
                for v in vals:
                    if hasattr(v, "jaxpr"):
                        find_conds(v.jaxpr, out)
        return out

    conds = find_conds(jaxpr.jaxpr, [])
    big = [
        e for e in conds
        if any(hasattr(v, "aval") and v.aval.size >= table.capacity
               for v in e.invars)
    ]
    assert not big, (
        "lax.cond over table-sized buffers reintroduced on the hot path: "
        f"{big}")

def test_collect_skips_select_without_filter():
    """Round-4 fast path: with no counter filter and
    default_value_no_permission == 0 the admitted-select in collect is a
    provable no-op and must be ABSENT from the jaxpr (it costs a full
    [N, D] pass forward + a mirror select backward — ~1 ms each at DIN's
    209k positions).  With a counter filter the select must remain."""

    import jax

    def n_selects(fn, *args):
        jaxpr = jax.make_jaxpr(fn)(*args)

        def walk(jxp, out):
            for eqn in jxp.eqns:
                if eqn.primitive.name == "select_n" and any(
                        hasattr(v, "aval") and v.aval.ndim == 2
                        for v in eqn.invars):
                    out.append(eqn)
                for p in eqn.params.values():
                    vals = p if isinstance(p, (tuple, list)) else [p]
                    for v in vals:
                        if hasattr(v, "jaxpr"):
                            walk(v.jaxpr, out)
            return out
        return len(walk(jaxpr.jaxpr, []))

    ids = jnp.arange(64, dtype=jnp.int32)

    plain = ev.create("sel_plain", dim=8, capacity=1024)
    assert n_selects(lambda t: ev._collect(
        *ev._lookup_phase(t, ids, train=True)), plain) == 0

    filt = ev.create(
        "sel_filt", dim=8, capacity=1024,
        option=cfg.EmbeddingVariableOption(
            counter_filter=cfg.CounterFilterOption(filter_freq=2)))
    assert n_selects(lambda t: ev._collect(
        *ev._lookup_phase(t, ids, train=True)), filt) >= 1

    # numeric parity: forced select == fast path where both are defined
    t2, lk = ev._lookup_phase(plain, ids, train=True)
    fast = ev._collect(t2, lk)
    ev._FORCE_COLLECT_SELECT = True
    try:
        slow = ev._collect(t2, lk)
    finally:
        ev._FORCE_COLLECT_SELECT = False
    assert bool(jnp.all(fast == slow))

def test_inserted_rows_are_marked_touched():
    """Round-4 review fix: an inserted key must land in the touched plane
    even if it never receives an admitted gradient — otherwise incremental
    deltas omit it and full+delta restore loses the key."""

    opt = cfg.EmbeddingVariableOption(
        record_touched=True,
        counter_filter=cfg.CounterFilterOption(filter_freq=5))
    t = ev.create("t", dim=4, capacity=128, option=opt)
    ids = jnp.array([11, 12], jnp.int32)
    t, lk = ev.lookup_phase(t, ids, step=1)
    assert not bool(lk.admitted[lk.valid].any())  # freq 1 < 5
    slots = np.asarray(lk.slot_ids)
    assert bool(np.asarray(t.touched)[slots].all())


def test_cbf_narrow_counter_saturates_on_large_batch_counts():
    """Round-4 review fix: an int8 CBF counter gaining +300 in one batch
    must SATURATE at 127, not wrap to 44 — a wrapped count would deny
    admission to an id that is provably hot."""

    opt = cfg.EmbeddingVariableOption(
        cbf_filter=cfg.CBFFilterOption(filter_freq=60,
                                       max_element_size=int(1e3),
                                       counter_dtype="int8"))
    t = ev.create("t", dim=4, capacity=256, option=opt)
    assert t.cbf is not None and t.cbf.dtype == jnp.int8
    ids = jnp.full((300,), 7, jnp.int32)
    t, lk = ev.lookup_phase(t, ids, step=0)
    est = int(ev._cbf_probe(t.cbf, jnp.array([7], jnp.int32),
                            ev._cbf_num_hashes(opt.cbf_filter))[0])
    assert est == 127, est  # saturated, not wrapped
    # and the id was admitted (freq estimate >= 60 at insert time)
    assert bool(lk.slot_ids[0] < t.capacity)


def test_cbf_int32_counter_saturated_bucket_does_not_wrap_negative():
    """Round-5 advice fix: with the DEFAULT int32 counter dtype, a bucket
    already clamped at 2^31-1 must stay there when more counts arrive — an
    int32 accumulator would wrap NEGATIVE and deny admission to a
    provably-hot id."""

    opt = cfg.EmbeddingVariableOption(
        cbf_filter=cfg.CBFFilterOption(filter_freq=3,
                                       max_element_size=int(1e3)))
    t = ev.create("t", dim=4, capacity=256, option=opt)
    assert t.cbf is not None and t.cbf.dtype == jnp.int32
    # Force every CBF bucket to the saturation cap, as years of traffic
    # would; then stream the hot id again.
    t = t.replace(cbf=jnp.full_like(t.cbf, jnp.iinfo(jnp.int32).max))
    ids = jnp.full((64,), 7, jnp.int32)
    t, lk = ev.lookup_phase(t, ids, step=0)
    est = int(ev._cbf_probe(t.cbf, jnp.array([7], jnp.int32),
                            ev._cbf_num_hashes(opt.cbf_filter))[0])
    assert est == jnp.iinfo(jnp.int32).max, est  # clamped, not negative
    assert bool(lk.admitted[lk.valid].all())  # hot id stays admitted
