"""Variant-embedding tests (multihash / dynamic-dim / adaptive / hash table),
mirroring embedding_variable_ops_test.py:219-1027 variant cases."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeprec_tpu import config as cfg
from deeprec_tpu.embedding import table as ev
from deeprec_tpu.embedding import variants as va


def test_multihash_qr_complementary():
    # Q-R decomposition must be injective over [0, b0*b1)
    b0, b1 = 32, 37
    ids = jnp.arange(b0 * b1, dtype=jnp.int32)
    q, r = va.multihash_split(ids, [b0, b1])
    combos = np.asarray(q) * 1000 + np.asarray(r)
    assert len(np.unique(combos)) == b0 * b1


def test_multihash_lookup_ops():
    rng = np.random.RandomState(0)
    t1 = jnp.asarray(rng.randn(8, 4), jnp.float32)
    t2 = jnp.asarray(rng.randn(11, 4), jnp.float32)
    ids = jnp.array([5, 30, 87], jnp.int32)
    add = va.multihash_lookup([t1, t2], ids, "add")
    q, r = va.multihash_split(ids, [8, 11])
    want = np.asarray(t1)[np.asarray(q)] + np.asarray(t2)[np.asarray(r)]
    np.testing.assert_allclose(np.asarray(add), want, rtol=1e-6)
    cat = va.multihash_lookup([t1, t2], ids, "concat")
    assert cat.shape == (3, 8)


def test_dynamic_dim_lookup():
    t = ev.create("t", dim=8, capacity=64,
                  option=cfg.EmbeddingVariableOption(
                      init=cfg.InitializerOption(initializer="constant",
                                                 constant=1.0)))
    ids = jnp.array([1, 2, 3], jnp.int32)
    t, lk = ev.lookup_phase(t, ids)
    blocknums = jnp.array([1, 2, 4], jnp.int32)   # of 4 blocks x dim 2
    out = va.dynamic_dim_lookup(t, lk, blocknums, block_dim=2)
    want_nonzero = np.array([2, 4, 8])
    got_nonzero = (np.asarray(out) != 0).sum(axis=1)
    np.testing.assert_array_equal(got_nonzero, want_nonzero)


def test_frequency_blocknums():
    t = ev.create("t", dim=8, capacity=64)
    t, _ = ev.lookup_phase(t, jnp.array([7] * 10 + [8], jnp.int32))
    bn = va.frequency_blocknums(t, jnp.array([7, 8, 99], jnp.int32),
                                thresholds=[2, 5])
    np.testing.assert_array_equal(np.asarray(bn), [3, 1, 1])


def test_adaptive_embedding_routes_by_freq():
    t = ev.create("t", dim=4, capacity=128,
                  option=cfg.EmbeddingVariableOption(
                      init=cfg.InitializerOption(initializer="constant",
                                                 constant=2.0)))
    static = jnp.full((16, 4), 7.0, jnp.float32)
    hot_ids = jnp.array([1] * 5, jnp.int32)
    t, _, _, _ = va.adaptive_embedding_lookup(t, static, hot_ids,
                                              freq_threshold=3)
    # id 1 now hot (freq 5); id 2 cold (freq 1)
    t, emb, lk, hot = va.adaptive_embedding_lookup(
        t, static, jnp.array([1, 2], jnp.int32), freq_threshold=3)
    assert bool(hot[0]) and not bool(hot[1])
    np.testing.assert_allclose(np.asarray(emb[0]), [2, 2, 2, 2])
    np.testing.assert_allclose(np.asarray(emb[1]), [7, 7, 7, 7])


def test_simple_hash_table():
    ht = va.SimpleHashTable(dim=3, capacity=64)
    keys = jnp.array([10, 20, 30], jnp.int32)
    vals = jnp.asarray(np.arange(9).reshape(3, 3), jnp.float32)
    ht = ht.insert(keys, vals)
    assert ht.size == 3
    rows, found = ht.lookup(jnp.array([20, 99], jnp.int32), default=-1.0)
    assert bool(found[0]) and not bool(found[1])
    np.testing.assert_allclose(np.asarray(rows[0]), [3, 4, 5])
    np.testing.assert_allclose(np.asarray(rows[1]), [-1, -1, -1])
    ht = ht.erase(jnp.array([10], jnp.int32))
    assert ht.size == 2
    ek, evs = ht.export()
    assert sorted(ek.tolist()) == [20, 30]


# ---------------------------------------------------------------------------
# First-class integration: TableSpec(variant=...) usable in a model with no
# bespoke plumbing (the variable_scope.py:2317/2373 + feature_column_v2.py:2089
# getter surface).


def _variant_model():
    import jax.numpy as jnp
    from deeprec_tpu.models import base, nn

    specs = {
        "C1": base.TableSpec(name="C1", dim=8, initial_capacity=2 ** 12),
        "C2": base.TableSpec(name="C2", dim=8, variant="multihash",
                             multihash_buckets=(64, 64)),
        "C3": base.TableSpec(name="C3", dim=8, variant="dynamic_dim",
                             dyn_dim_block=4, dyn_dim_thresholds=(3,),
                             initial_capacity=2 ** 12),
        "C4": base.TableSpec(name="C4", dim=8, variant="adaptive",
                             adaptive_buckets=128, adaptive_threshold=3,
                             initial_capacity=2 ** 12),
    }
    cols = list(specs)

    def init_params(key):
        return {"mlp": nn.mlp_init(key, 13 + 8 * len(cols), [32, 1])}

    def forward(params, batch, acts, train=True):
        x = jnp.concatenate([batch["dense"]] + [acts[c] for c in cols], axis=1)
        return nn.mlp_apply(params["mlp"], x)[:, 0]

    return base.RecModel(name="variant_mix", table_specs=specs,
                         init_params=init_params, forward=forward)


def test_variants_first_class_in_trainer():
    import optax
    from deeprec_tpu.data.synthetic import SyntheticCriteo
    from deeprec_tpu.models import base
    from deeprec_tpu.optimizers import sparse
    from deeprec_tpu.train.loop import Trainer

    model = _variant_model()
    tables = base.make_tables(model)
    # multihash spec is dense-only: no physical EV table for it
    assert "C2" not in tables and "C1" in tables
    tr = Trainer(model=model, tables=tables,
                 sparse_optimizer=sparse.adagrad(lr=0.05),
                 dense_tx=optax.adagrad(0.05))
    state = tr.init_state(jax.random.PRNGKey(0))
    assert "C2" in state.params["_variants"]
    assert "C4" in state.params["_variants"]
    mh0 = np.asarray(state.params["_variants"]["C2"][0]).copy()
    ad0 = np.asarray(state.params["_variants"]["C4"]).copy()

    gen = SyntheticCriteo(batch_size=512, num_ids_per_col=500, seed=1)
    state = tr.fit(state, iter(gen), steps=100, log_every=0)
    eval_gen = SyntheticCriteo(batch_size=512, num_ids_per_col=500, seed=99)
    m = tr.evaluate(state, iter(eval_gen), steps=8)
    assert m["auc"] > 0.58, f"variant-mix model failed to learn: {m}"
    # gradients actually reached the variant params
    assert not np.allclose(mh0, np.asarray(state.params["_variants"]["C2"][0]))
    assert not np.allclose(ad0, np.asarray(state.params["_variants"]["C4"]))
    # EV-backed variants trained through the sparse path
    assert int(state.tables["C3"].size) > 0
    assert int(state.tables["C4"].size) > 0


def test_variant_spec_validation():
    from deeprec_tpu.models import base

    with pytest.raises(ValueError):
        base.TableSpec(name="x", dim=8, variant="multihash")  # no buckets
    with pytest.raises(ValueError):
        base.TableSpec(name="x", dim=8, variant="dynamic_dim", dyn_dim_block=3)
    with pytest.raises(ValueError):
        base.TableSpec(name="x", dim=8, variant="adaptive")
    with pytest.raises(ValueError):
        base.TableSpec(name="x", dim=8, variant="multihash",
                       multihash_buckets=(8, 8), group="g")
    with pytest.raises(ValueError):
        base.TableSpec(name="x", dim=8, variant="nope")


def test_variants_supported_on_distributed_trainer():
    """Round 3: variants run on the sharded path (see
    tests/test_sharded.py::test_distributed_variants_match_local and
    test_distributed_variants_staleness for the parity matrix) — including
    dynamic_dim + staleness (the forward-applied block mask makes delayed
    grads plain bounded-staleness)."""

    import optax
    from jax.sharding import Mesh
    from deeprec_tpu.optimizers import sparse
    from deeprec_tpu.parallel.trainer import DistributedTrainer

    model = _variant_model()
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    tr = DistributedTrainer(model=model, mesh=mesh,
                            sparse_optimizer=sparse.adagrad(lr=0.05),
                            dense_tx=optax.adagrad(0.05))
    assert tr is not None
    tr2 = DistributedTrainer(model=model, mesh=mesh,
                             sparse_optimizer=sparse.adagrad(lr=0.05),
                             dense_tx=optax.adagrad(0.05), staleness=2)
    assert tr2 is not None


# ---------------------------------------------------------------------------
# HashTable v2 object surface (python/ops/hash_table/: HashTable,
# BloomFilterAdmitStrategy, GlobalStepFilter/L2WeightFilter)


def test_hash_table_v2_slots_and_snapshot():
    from deeprec_tpu.embedding import hash_table as ht

    t = ht.HashTable(dim=4, capacity=2 ** 8, initializer="zeros")
    t = t.with_slot("accum", init=0.1)
    assert t.slots == ("accum",)
    assert t.get_slot("accum").shape == (2 ** 8, 4)

    keys = jnp.array([5, 9, 5, 11], jnp.int32)
    t, rows, lk = t.lookup_or_insert(keys)
    assert t.size == 3
    assert rows.shape == (4, 4)
    # explicit upsert then read back
    t = t.insert([42], np.full((1, 4), 7.0, np.float32))
    got = t.lookup([42, 12345])
    np.testing.assert_allclose(np.asarray(got[0]), 7.0)
    np.testing.assert_allclose(np.asarray(got[1]), 0.0)  # missing -> default
    ks, vs = t.snapshot()
    assert set(ks.tolist()) == {5, 9, 11, 42}
    t = t.erase([42])
    assert not bool(t.contains(jnp.array([42]))[0])


def test_hash_table_v2_bloom_admit():
    from deeprec_tpu.embedding import hash_table as ht

    t = ht.HashTable(dim=2, capacity=2 ** 8,
                     admit=ht.BloomFilterAdmitStrategy(minimum_frequency=3))
    k = jnp.array([77], jnp.int32)
    t, _, _ = t.lookup_or_insert(k)      # est 1 < 3: not admitted
    t, _, _ = t.lookup_or_insert(k)      # est 2
    assert t.size == 0
    t, _, _ = t.lookup_or_insert(k)      # est 3 -> inserted
    assert t.size == 1


def test_hash_table_v2_filters():
    from deeprec_tpu.embedding import hash_table as ht

    t = ht.HashTable(dim=2, capacity=2 ** 8, initializer="zeros",
                     filters=(ht.GlobalStepFilter(filter_interval_steps=10),))
    t, _, _ = t.lookup_or_insert(jnp.array([1, 2], jnp.int32), step=0)
    t, _, _ = t.lookup_or_insert(jnp.array([2], jnp.int32), step=9)
    # at step 20: key 1 (version 0) is stale (< 20-10), key 2 (version 9) kept
    # ... but version only updates on INSERT; re-lookup of key 2 at step 9
    # does not bump it.  Use a fresh key at step 15 instead.
    t, _, _ = t.lookup_or_insert(jnp.array([3], jnp.int32), step=15)
    t2 = t.filter_step(20)
    assert not bool(t2.contains(jnp.array([1]))[0])
    assert bool(t2.contains(jnp.array([3]))[0])
    # off-cadence step: no-op
    assert t.filter_step(21) is t

    tl = ht.HashTable(dim=2, capacity=2 ** 8,
                      filters=(ht.L2WeightFilter(threshold=1e-9,
                                                 filter_interval_steps=5),))
    tl, _, _ = tl.lookup_or_insert(jnp.array([4], jnp.int32))
    tl = tl.insert([5], np.zeros((1, 2), np.float32))   # zero row -> filtered
    tl2 = tl.filter_step(5)
    assert bool(tl2.contains(jnp.array([4]))[0])
    assert not bool(tl2.contains(jnp.array([5]))[0])


def test_adaptive_migration_seeds_ev_from_static_row():
    """The step an id crosses adaptive_threshold, its EV row is seeded from
    the static hash-bucket row it trained while cold (the reference's
    ev_init_value migration, embedding_ops.py:667) — not a fresh init."""

    import optax
    from deeprec_tpu.models import base, nn
    from deeprec_tpu.optimizers import sparse
    from deeprec_tpu.ops import hashing
    from deeprec_tpu.train.loop import Trainer

    spec = base.TableSpec(name="C1", dim=4, variant="adaptive",
                          adaptive_buckets=32, adaptive_threshold=4,
                          initial_capacity=2 ** 8)

    def init_params(key):
        return {"w": jnp.ones((4,), jnp.float32)}

    def forward(params, batch, acts, train=True):
        return acts["C1"] @ params["w"].astype(acts["C1"].dtype)

    model = base.RecModel(name="adaptive_mig", table_specs={"C1": spec},
                          init_params=init_params, forward=forward,
                          dense_dim=1)
    tables = base.make_tables(model)
    tr = Trainer(model=model, tables=tables,
                 sparse_optimizer=sparse.adagrad(lr=0.1),
                 dense_tx=optax.adagrad(0.1))
    state = tr.init_state(jax.random.PRNGKey(0))

    def batch(ids):
        ids = np.asarray(ids, np.int32)
        return {"dense": np.zeros((len(ids), 1), np.float32),
                "cat": {"C1": ids},
                "label": np.ones((len(ids),), np.float32)}

    # 3 cold sightings: static bucket row trains, EV row untouched
    for _ in range(3):
        state, _ = tr.train_step(state, batch([7]))
    # copy now: train state is donated, device buffers die on the next step
    static = np.asarray(state.params["_variants"]["C1"])
    bkt = int(hashing.bucket(jnp.array([7], jnp.int32), 32, salt=3)[0])
    trained_static_row = static[bkt]
    init_static_row = np.asarray(
        tr.init_state(jax.random.PRNGKey(0)).params["_variants"]["C1"][bkt])
    assert not np.allclose(trained_static_row, init_static_row)  # it learned

    # 4th sighting crosses the threshold -> migration
    state, _ = tr.train_step(state, batch([7]))
    t = state.tables["C1"]
    _, lk = ev.lookup_phase(t, jnp.array([7], jnp.int32), train=False)
    ev_row = np.asarray(t.values[int(lk.slot_ids[0])])
    # EV row = migrated static row + one optimizer update ON that row;
    # it must be far closer to the trained static row than to a fresh init.
    d_mig = np.linalg.norm(ev_row - trained_static_row)
    d_init = np.linalg.norm(ev_row - init_static_row)
    assert d_mig < 0.2 and d_init > 0.05, (ev_row, trained_static_row)

    # a different id seen once stays cold: present in the EV but un-migrated
    state, _ = tr.train_step(state, batch([9]))
    t = state.tables["C1"]
    assert bool(ev.contains(t, jnp.array([9, 7], jnp.int32))[0])
    _, lk9 = ev.lookup_phase(t, jnp.array([9], jnp.int32), train=False)
    row9 = np.asarray(t.values[int(lk9.slot_ids[0])])
    b9 = int(hashing.bucket(jnp.array([9], jnp.int32), 32, salt=3)[0])
    assert not np.allclose(row9, np.asarray(static[b9]))

def test_simple_hash_table_duplicate_insert_last_wins():
    """Round-4 review fix: insert with duplicate keys must be
    deterministic — the LAST occurrence wins on every backend (XLA's
    duplicate-index scatter order is unspecified)."""

    ht = va.SimpleHashTable(dim=2, capacity=64)
    ht = ht.insert(jnp.array([7, 7, 9], jnp.int32),
                   jnp.array([[1., 1.], [2., 2.], [3., 3.]]))
    rows, found = ht.lookup(jnp.array([7, 9], jnp.int32))
    assert found.all()
    np.testing.assert_array_equal(np.asarray(rows), [[2., 2.], [3., 3.]])


def test_simple_hash_table_insert_grows_past_capacity():
    """Round-4 review fix: bulk-inserting more keys than the table can
    hold must grow-and-retry until every key lands — never silently drop
    (upsert semantics)."""

    ht = va.SimpleHashTable(dim=2, capacity=64)
    n = 300
    keys = jnp.arange(n, dtype=jnp.int32)
    vals = jnp.tile(jnp.arange(n, dtype=jnp.float32)[:, None], (1, 2))
    ht = ht.insert(keys, vals)
    rows, found = ht.lookup(keys)
    assert bool(found.all())
    np.testing.assert_array_equal(np.asarray(rows), np.asarray(vals))


def test_simple_hash_table_admission_denied_does_not_grow():
    """Round-5 review: a below-threshold key under Bloom admission is NOT
    an insert failure — the grow-and-retry loop must not double capacity
    per retry until the CBF crosses the threshold."""

    from deeprec_tpu import config as cfg
    from deeprec_tpu.embedding.variants import SimpleHashTable

    ht = SimpleHashTable(
        dim=4, capacity=64,
        option=cfg.EmbeddingVariableOption(
            init=cfg.InitializerOption(initializer="zeros"),
            cbf_filter=cfg.CBFFilterOption(filter_freq=10,
                                           max_element_size=1000)))
    cap0 = ht._t.capacity
    ht = ht.insert(jnp.arange(8, dtype=jnp.int32),
                   jnp.ones((8, 4), jnp.float32))
    assert ht._t.capacity == cap0, (cap0, ht._t.capacity)
    assert ht.size == 0  # denied: nothing landed, and nothing grew


def test_distributed_trainer_rejects_int32_group_overflow():
    """Round-5 review: composed group keys that overflow int32 must fail
    at construction on the sharded path too (make_tables already checks)."""

    import dataclasses

    import optax
    from jax.sharding import Mesh

    from deeprec_tpu.models import base as mbase, nn as mnn
    from deeprec_tpu.optimizers import sparse as sp
    from deeprec_tpu.parallel.trainer import DistributedTrainer

    specs = {f"C{i}": mbase.TableSpec(name=f"C{i}", dim=4, group="g",
                                      id_bits=30,
                                      initial_capacity=1024)
             for i in range(4)}  # 3 << 30 > int32 max

    def init_params(key):
        return {"mlp": mnn.mlp_init(key, 13 + 4 * 4, [8, 1])}

    def fwd(params, batch, acts, train=True):
        x = jnp.concatenate([batch["dense"]] + [acts[c] for c in specs],
                            axis=1)
        return mnn.mlp_apply(params["mlp"], x)[:, 0]

    model = mbase.RecModel(name="overflow", table_specs=specs,
                           init_params=init_params, forward=fwd)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    tr = DistributedTrainer(model=model, mesh=mesh,
                            sparse_optimizer=sp.adagrad(lr=0.05),
                            dense_tx=optax.adagrad(0.05),
                            per_shard_capacity=256)
    with pytest.raises(ValueError, match="overflows int32"):
        tr.init_state(jax.random.PRNGKey(0))
