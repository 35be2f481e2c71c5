"""Sharded (multi-device) path tests on the 8-device virtual CPU mesh.

Mirrors the reference's simulated-cluster distributed tests (SURVEY.md §4) —
but on a real SPMD mesh, which the reference's seastar tests never had.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from deeprec_tpu import config as cfg
from deeprec_tpu.data.synthetic import SyntheticCriteo
from deeprec_tpu.embedding import table as ev
from deeprec_tpu.models import base, nn
from deeprec_tpu.optimizers import sparse
from deeprec_tpu.parallel import sharded as sh
from deeprec_tpu.parallel.trainer import DistributedTrainer
from deeprec_tpu.train.loop import Trainer
from tests.test_train_e2e import tiny_model


def mesh8():
    return Mesh(np.array(jax.devices()), ("data",))


def test_sharded_lookup_matches_local():
    """Row-sharded lookup returns the same embeddings a single table would."""

    mesh = mesh8()
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 5000, size=(1024,)),
                      jnp.int32)

    # single-device reference
    t_ref = ev.create("t", dim=8, capacity=2 ** 13)
    t_ref, lk = ev.lookup_phase(t_ref, ids, step=0)
    want = np.asarray(ev.collect(t_ref, lk)[lk.inverse])

    # sharded: each of 8 devices runs the same lookup on its batch slice
    t_loc = ev.create("t", dim=8, capacity=2 ** 10)
    from deeprec_tpu.parallel.trainer import stack_table, table_pspec, local_view, relift

    stacked = stack_table(t_loc, 8)

    def body(tbl, ids_l):
        t = local_view(tbl)
        t, rows, ctx = sh.sharded_lookup(t, ids_l, "data", step=0, train=True)
        return relift(t), rows

    sspec = table_pspec(t_loc, "data")
    out = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(sspec, P("data")),
        out_specs=(sspec, P("data")), check_vma=False,
    ))(stacked, ids)
    new_stacked, rows = out
    got = np.asarray(rows)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # keys are partitioned: every id lives on exactly its owner shard
    total = int(np.sum(np.asarray(new_stacked.size)))
    assert total == len(np.unique(np.asarray(ids)))


def test_distributed_trainer_learns():
    mesh = mesh8()
    model = tiny_model(n_cols=4)
    tr = DistributedTrainer(
        model=model, mesh=mesh,
        sparse_optimizer=sparse.adagrad(lr=0.05),
        dense_tx=optax.adagrad(0.05),
        per_shard_capacity=2 ** 10,
    )
    state = tr.init_state(jax.random.PRNGKey(0))
    gen = SyntheticCriteo(batch_size=512, num_ids_per_col=2000, seed=1)
    it = iter(gen)
    losses = []
    for i in range(60):
        state, m = tr.train_step(state, next(it))
        losses.append(float(m["loss"]))
        assert int(m["n_dropped"]) == 0
    assert losses[-1] < losses[0] - 0.02, f"no learning: {losses[:3]} -> {losses[-3:]}"
    # tables sharded and populated
    sizes = np.asarray(jax.device_get(state.tables[list(state.tables)[0]].size))
    assert sizes.shape == (8,)
    assert int(sizes.sum()) > 500
    # every shard holds roughly balanced load (hash sharding)
    assert sizes.max() < 4 * max(sizes.min(), 1)


def test_distributed_matches_single_device_loss():
    """Same data, same seeds: distributed first-step loss == local first-step
    loss (the math is identical, only layout differs)."""

    model = tiny_model(n_cols=2)
    gen = SyntheticCriteo(batch_size=256, num_ids_per_col=500, seed=5)
    batch = next(iter(gen))

    # local
    tables = base.make_tables(model)
    lt = Trainer(model=model, tables=tables,
                 sparse_optimizer=sparse.adagrad(lr=0.05),
                 dense_tx=optax.adagrad(0.05))
    ls = lt.init_state(jax.random.PRNGKey(0))
    ls, m = lt.train_step(ls, batch)
    local_loss = float(m["loss"])

    # distributed
    mesh = mesh8()
    dt = DistributedTrainer(model=model, mesh=mesh,
                            sparse_optimizer=sparse.adagrad(lr=0.05),
                            dense_tx=optax.adagrad(0.05),
                            per_shard_capacity=2 ** 10)
    ds = dt.init_state(jax.random.PRNGKey(0))
    ds, dm = dt.train_step(ds, batch)
    np.testing.assert_allclose(float(dm["loss"]), local_loss, rtol=1e-4)


def test_eval_step_sharded():
    mesh = mesh8()
    model = tiny_model(n_cols=2)
    tr = DistributedTrainer(
        model=model, mesh=mesh,
        sparse_optimizer=sparse.adagrad(lr=0.05),
        dense_tx=optax.adagrad(0.05), per_shard_capacity=2 ** 10,
    )
    state = tr.init_state(jax.random.PRNGKey(0))
    gen = SyntheticCriteo(batch_size=256, num_ids_per_col=500, seed=6)
    it = iter(gen)
    state, _ = tr.train_step(state, next(it))
    logits, loss = tr.eval_step(state, next(it))
    assert logits.shape == (256,)
    assert np.isfinite(float(loss))


def test_distributed_sequence_model():
    """DIN (sequence attention, shared tables) through the sharded path."""

    import dataclasses
    from deeprec_tpu.data.behavior import SyntheticBehavior
    from deeprec_tpu.models import get_model

    model = get_model("din")
    specs = {n: dataclasses.replace(s, initial_capacity=2 ** 10)
             for n, s in model.table_specs.items()}
    model = dataclasses.replace(model, table_specs=specs)
    mesh = mesh8()
    tr = DistributedTrainer(
        model=model, mesh=mesh,
        sparse_optimizer=sparse.adagrad(lr=0.05),
        dense_tx=optax.adam(1e-3), per_shard_capacity=2 ** 10,
    )
    state = tr.init_state(jax.random.PRNGKey(0))
    gen = SyntheticBehavior(batch_size=256, num_items=1000, num_categories=40,
                            seq_len=10, seed=1)
    it = iter(gen)
    losses = []
    for _ in range(20):
        state, m = tr.train_step(state, next(it))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0], losses
    logits, _ = tr.eval_step(state, next(it))
    assert logits.shape == (256,)


def test_distributed_with_counter_filter():
    """Admission filtering under sharding: freq counts aggregate correctly
    across source devices (external_counts path in sharded_lookup)."""

    model = tiny_model(n_cols=2)
    mesh = mesh8()
    tr = DistributedTrainer(
        model=model, mesh=mesh,
        sparse_optimizer=sparse.adagrad(lr=0.05),
        dense_tx=optax.adagrad(0.05), per_shard_capacity=2 ** 10,
        table_option=cfg.EmbeddingVariableOption(
            counter_filter=cfg.CounterFilterOption(filter_freq=3)),
    )
    state = tr.init_state(jax.random.PRNGKey(0))
    gen = SyntheticCriteo(batch_size=256, num_ids_per_col=50, seed=7)
    it = iter(gen)
    losses = []
    for _ in range(12):
        state, m = tr.train_step(state, next(it))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(l) for l in losses)
    # with only 50 ids/col and batch 256, every id repeats >3x per batch:
    # admission passes and training proceeds (loss finite and moving)
    assert losses[-1] != losses[0]


def test_grow_stacked_preserves_content():
    """Mesh-wide capacity doubling (the EV dynamic-shape growth on the
    sharded path): content, slots, and predictions must survive the vmapped
    rebuild.  VERDICT r1: this path previously had zero coverage."""

    from deeprec_tpu.parallel.trainer import grow_stacked

    mesh = mesh8()
    model = tiny_model(n_cols=2)
    tr = DistributedTrainer(
        model=model, mesh=mesh,
        sparse_optimizer=sparse.adagrad(lr=0.05),
        dense_tx=optax.adagrad(0.05), per_shard_capacity=128,
    )
    state = tr.init_state(jax.random.PRNGKey(0))
    gen = SyntheticCriteo(batch_size=512, num_ids_per_col=900, seed=11)
    it = iter(gen)
    for _ in range(6):
        state, _ = tr.train_step(state, next(it))

    b = next(it)
    want, _ = tr.eval_step(state, b)
    sizes_before = {n: np.asarray(jax.device_get(t.size)).copy()
                    for n, t in state.tables.items()}

    grown = {n: grow_stacked(t, t.keys.shape[1] * 2)
             for n, t in state.tables.items()}
    state2 = state.replace(tables=grown)
    for n, t in state2.tables.items():
        assert t.keys.shape[1] == 256
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(t.size)), sizes_before[n])
    # eval must be bit-identical after the rebuild (recompiles: new shapes)
    tr._train_step = None
    got, _ = tr.eval_step(state2, b)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_maybe_grow_on_mesh_under_insert_pressure():
    """Insert far past the per-shard load factor; maybe_grow must expand the
    stacked tables and training must continue with nothing lost."""

    mesh = mesh8()
    model = tiny_model(n_cols=2)
    tr = DistributedTrainer(
        model=model, mesh=mesh,
        sparse_optimizer=sparse.adagrad(lr=0.05),
        dense_tx=optax.adagrad(0.05), per_shard_capacity=128,
    )
    state = tr.init_state(jax.random.PRNGKey(0))
    # 8k ids/col -> ~1000 per shard >> 128*0.75: growth must trigger
    gen = SyntheticCriteo(batch_size=1024, num_ids_per_col=8000, seed=12)
    it = iter(gen)
    for _ in range(10):
        state, m = tr.train_step(state, next(it))
        state = tr.maybe_grow(state)
        if any(t.keys.shape[1] > 128 for t in state.tables.values()):
            tr._train_step = None  # shapes changed; rebuild
    caps = {n: t.keys.shape[1] for n, t in state.tables.items()}
    assert all(c >= 512 for c in caps.values()), caps
    for n, t in state.tables.items():
        sizes = np.asarray(jax.device_get(t.size))
        lf = sizes / t.keys.shape[1]
        assert lf.max() <= t.option.max_load_factor + 0.05, (n, lf)
    logits, loss = tr.eval_step(state, next(it))
    assert np.isfinite(float(loss))


def test_sharded_overflow_counted_and_self_heals():
    """Bucket overflow must be (a) surfaced in metrics, never silent, and
    (b) healed by automatic bucket widening (ADVICE r1 medium finding)."""

    mesh = mesh8()
    model = tiny_model(n_cols=2)
    logs = []
    tr = DistributedTrainer(
        model=model, mesh=mesh,
        sparse_optimizer=sparse.adagrad(lr=0.05),
        dense_tx=optax.adagrad(0.05), per_shard_capacity=2 ** 10,
        bucket_factor=0.05,           # pathologically narrow buckets
        drop_check_every=1, log_fn=logs.append,
    )
    state = tr.init_state(jax.random.PRNGKey(0))
    gen = SyntheticCriteo(batch_size=1024, num_ids_per_col=4000, seed=13)
    it = iter(gen)
    state, m = tr.train_step(state, next(it))
    assert int(m["n_dropped"]) > 0          # narrow buckets must overflow
    assert tr.bucket_factor > 0.05          # and the trainer reacted
    assert logs and "overflow" in logs[0]
    # keep stepping; widening doubles until the exchange fits
    for _ in range(8):
        state, m = tr.train_step(state, next(it))
        if int(m["n_dropped"]) == 0:
            break
    assert int(m["n_dropped"]) == 0, "bucket widening never converged"
    assert tr.total_dropped > 0             # the loss was accounted, not hidden


def test_sharded_tiered_matches_unbounded():
    """VERDICT r1 item 2: multi-tier storage composed with the sharded
    trainer — tight per-shard HBM budgets with demote/promote churn must
    train to the same predictions as unbounded sharded training (the
    single-chip tiered parity test, repeated on the 8-device mesh)."""

    from deeprec_tpu.parallel.tiers import ShardedTiers

    mesh = mesh8()
    model = tiny_model(n_cols=2, emb_dim=4)
    gen_it = iter(SyntheticCriteo(batch_size=128, num_ids_per_col=600, seed=3))
    batches = [next(gen_it) for _ in range(12)]

    def run(tiered):
        tr = DistributedTrainer(
            model=model, mesh=mesh,
            sparse_optimizer=sparse.adagrad(lr=0.05),
            dense_tx=optax.adagrad(0.05),
            per_shard_capacity=64 if tiered else 2 ** 10,
        )
        state = tr.init_state(jax.random.PRNGKey(0))
        if tiered:
            tr.tiers = {n: ShardedTiers(t, mesh, "data",
                                        hot_watermark=0.5, evict_fraction=0.5)
                        for n, t in state.tables.items()}
        for b in batches:
            state, _ = tr.train_step(state, b)
            state = tr.maybe_grow(state)
        logits, _ = tr.eval_step(state, batches[0])
        return np.asarray(logits), tr, state

    want, _, _ = run(False)
    got, tr, state = run(True)
    # hot shards stayed at budget and rows actually went cold
    for n, t in state.tables.items():
        assert t.keys.shape[1] == 64
    assert any(tier.cold_size > 0 for tier in tr.tiers.values())
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_sharded_tiered_checkpoint_roundtrip(tmp_path):
    """Tier-complete checkpointing on the mesh: cold shards dump/reload and
    re-route (including across a reshard to a different template)."""

    from deeprec_tpu.parallel.tiers import ShardedTiers
    from deeprec_tpu.train import saver

    mesh = mesh8()
    model = tiny_model(n_cols=2, emb_dim=4)
    gen_it = iter(SyntheticCriteo(batch_size=128, num_ids_per_col=600, seed=4))
    batches = [next(gen_it) for _ in range(10)]

    def build():
        tr = DistributedTrainer(
            model=model, mesh=mesh,
            sparse_optimizer=sparse.adagrad(lr=0.05),
            dense_tx=optax.adagrad(0.05), per_shard_capacity=64)
        state = tr.init_state(jax.random.PRNGKey(0))
        tr.tiers = {n: ShardedTiers(t, mesh, "data",
                                    hot_watermark=0.5, evict_fraction=0.5)
                    for n, t in state.tables.items()}
        return tr, state

    tr, state = build()
    for b in batches:
        state, _ = tr.train_step(state, b)
        state = tr.maybe_grow(state)
    assert any(t.cold_size > 0 for t in tr.tiers.values())
    want, _ = tr.eval_step(state, batches[0])
    ckpt = saver.save_checkpoint(str(tmp_path), state, tiers=tr.tiers)

    tr2, template = build()
    state2 = saver.restore_checkpoint(ckpt, template, tiers=tr2.tiers)
    for n in tr.tiers:
        assert tr2.tiers[n].cold_size == tr.tiers[n].cold_size
    got, _ = tr2.eval_step(state2, batches[0])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_hash_np_matches_jnp():
    """Host-side routing must be bit-identical to the device hash.  (int32
    inline; the int64 mix path needs x64, which test_int64_keys covers in a
    subprocess — without x64 jnp silently truncates int64 to int32, which is
    exactly why routing hashes at the table's key width.)"""

    from deeprec_tpu.ops import hashing as H

    keys = np.random.RandomState(0).randint(
        np.iinfo(np.int32).min, np.iinfo(np.int32).max, 4096).astype(np.int32)
    np.testing.assert_array_equal(
        H.logical_partition_np(keys),
        np.asarray(H.logical_partition(jnp.asarray(keys))))
    np.testing.assert_array_equal(
        H.bucket_np(keys, 1024, salt=7),
        np.asarray(H.bucket(jnp.asarray(keys), 1024, salt=7)))


def test_sharded_staged_tiering_matches_inline():
    """TierStager over the DistributedTrainer: background-prepared payloads
    with demote re-sync must match inline per-step promotion bit-for-bit."""

    from deeprec_tpu.parallel.tiers import ShardedTiers
    from deeprec_tpu.train.stager import TierStager

    mesh = mesh8()
    model = tiny_model(n_cols=2, emb_dim=4)
    gen_it = iter(SyntheticCriteo(batch_size=128, num_ids_per_col=600, seed=5))
    batches = [next(gen_it) for _ in range(12)]

    def run(staged):
        tr = DistributedTrainer(
            model=model, mesh=mesh,
            sparse_optimizer=sparse.adagrad(lr=0.05),
            dense_tx=optax.adagrad(0.05), per_shard_capacity=64)
        state = tr.init_state(jax.random.PRNGKey(0))
        tr.tiers = {n: ShardedTiers(t, mesh, "data",
                                    hot_watermark=0.5, evict_fraction=0.5)
                    for n, t in state.tables.items()}
        if staged:
            stager = TierStager(tr, iter(batches), max_steps=len(batches))
            for i, (b, pl) in enumerate(stager):
                state, _ = tr.train_step(state, b, payloads=pl)
                if (i + 1) % 3 == 0:
                    state = tr.maybe_grow(state, stager=stager)
        else:
            for i, b in enumerate(batches):
                state, _ = tr.train_step(state, b)
                if (i + 1) % 3 == 0:
                    state = tr.maybe_grow(state)
        assert any(t.cold_size > 0 for t in tr.tiers.values())
        logits, _ = tr.eval_step(state, batches[0])
        return np.asarray(logits)

    want = run(False)
    got = run(True)
    np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# DistributedTrainer feature parity with Trainer (VERDICT r2 item 5):
# staleness, micro_batch_num, fused multi-step dispatch, variant embeddings —
# each validated against the single-chip Trainer on identical data (the
# async-PS / MicroBatch / CUDA-graph-replay / variant capabilities on the
# mesh: modelzoo/wide_and_deep/train.py:920-936, config.proto:324-328).


def _parity_pair(model, steps, batches, **kwargs):
    tables = base.make_tables(model)
    lt = Trainer(model=model, tables=tables,
                 sparse_optimizer=sparse.adagrad(lr=0.05),
                 dense_tx=optax.adagrad(0.05), **kwargs)
    ls = lt.init_state(jax.random.PRNGKey(0))
    local = []
    for b in batches[:steps]:
        ls, m = lt.train_step(ls, b)
        local.append(float(m["loss"]))

    dt = DistributedTrainer(model=model, mesh=mesh8(),
                            sparse_optimizer=sparse.adagrad(lr=0.05),
                            dense_tx=optax.adagrad(0.05),
                            per_shard_capacity=2 ** 10, **kwargs)
    ds = dt.init_state(jax.random.PRNGKey(0))
    dist = []
    for b in batches[:steps]:
        ds, m = dt.train_step(ds, b)
        dist.append(float(m["loss"]))
    return local, dist, ls, ds


_LAYOUT_DRIFT = 1e-2  # cross-layout f32 reduction-order drift: the plain
# local-vs-sharded trajectory already differs ~0.3% over 8 steps (measured);
# same-layout comparisons below use tight tolerances instead.


def test_distributed_staleness_matches_local():
    model = tiny_model(n_cols=2)
    gen = SyntheticCriteo(batch_size=256, num_ids_per_col=500, seed=5)
    it = iter(gen)
    batches = [next(it) for _ in range(8)]
    local, dist, _, _ = _parity_pair(model, 8, batches, staleness=2)
    np.testing.assert_allclose(dist, local, rtol=_LAYOUT_DRIFT)
    # crisp semantics, drift-free: with staleness=k the first k applies are
    # the primed no-op entries, so steps 0..k-1 must equal the no-apply
    # trajectory of a fresh trainer whose sparse updates never run
    dt = DistributedTrainer(model=model, mesh=mesh8(),
                            sparse_optimizer=sparse.adagrad(lr=0.0),
                            dense_tx=optax.adagrad(0.05),
                            per_shard_capacity=2 ** 10, staleness=2)
    ds = dt.init_state(jax.random.PRNGKey(0))
    frozen = []
    for b in batches[:2]:
        ds, m = dt.train_step(ds, b)
        frozen.append(float(m["loss"]))
    np.testing.assert_allclose(frozen, dist[:2], rtol=1e-6)


def test_distributed_micro_batch_matches_local():
    model = tiny_model(n_cols=2)
    gen = SyntheticCriteo(batch_size=256, num_ids_per_col=500, seed=6)
    it = iter(gen)
    batches = [next(it) for _ in range(6)]
    local, dist, _, _ = _parity_pair(model, 6, batches, micro_batch_num=2)
    np.testing.assert_allclose(dist, local, rtol=_LAYOUT_DRIFT)


def test_distributed_multi_step_matches_per_step():
    """make_multi_step(K): one lax.scan dispatch == K per-step dispatches."""

    model = tiny_model(n_cols=2)
    gen = SyntheticCriteo(batch_size=256, num_ids_per_col=500, seed=7)
    it = iter(gen)
    batches = [next(it) for _ in range(8)]

    def make():
        dt = DistributedTrainer(model=model, mesh=mesh8(),
                                sparse_optimizer=sparse.adagrad(lr=0.05),
                                dense_tx=optax.adagrad(0.05),
                                per_shard_capacity=2 ** 10)
        return dt, dt.init_state(jax.random.PRNGKey(0))

    dt, s1 = make()
    per_step = []
    for b in batches:
        s1, m = dt.train_step(s1, b)
        per_step.append(float(m["loss"]))

    dt2, s2 = make()
    multi = dt2.make_multi_step(4)
    s2, l1 = multi(s2, batches[:4])
    s2, l2 = multi(s2, batches[4:])
    fused = [float(x) for x in np.concatenate([np.asarray(l1),
                                               np.asarray(l2)])]
    np.testing.assert_allclose(fused, per_step, rtol=2e-4)
    assert int(s2.step) == int(s1.step) == 8


def test_distributed_staleness_with_multi_step():
    """The delayed-grad FIFO rides the scan carry (pending in TrainState):
    fused K-step dispatch reproduces per-step sharded staleness exactly
    (same layout -> tight tolerance)."""

    model = tiny_model(n_cols=2)
    gen = SyntheticCriteo(batch_size=256, num_ids_per_col=500, seed=8)
    it = iter(gen)
    batches = [next(it) for _ in range(8)]

    def make():
        dt = DistributedTrainer(model=model, mesh=mesh8(),
                                sparse_optimizer=sparse.adagrad(lr=0.05),
                                dense_tx=optax.adagrad(0.05),
                                per_shard_capacity=2 ** 10, staleness=1)
        return dt, dt.init_state(jax.random.PRNGKey(0))

    dt1, s1 = make()
    per_step = []
    for b in batches:
        s1, m = dt1.train_step(s1, b)
        per_step.append(float(m["loss"]))

    dt2, s2 = make()
    multi = dt2.make_multi_step(4)
    s2, l1 = multi(s2, batches[:4])
    s2, l2 = multi(s2, batches[4:])
    fused = [float(x) for x in np.concatenate([np.asarray(l1),
                                               np.asarray(l2)])]
    np.testing.assert_allclose(fused, per_step, rtol=2e-4)


def test_distributed_variants_match_local():
    """Multihash/dynamic-dim/adaptive variants on the sharded path: same
    step-by-step losses as the single-chip Trainer (kv_variable_ops.py:986,
    embedding_ops.py:903/667 over PS-partitioned EVs in the reference)."""

    from tests.test_variants import _variant_model

    model = _variant_model()
    gen = SyntheticCriteo(batch_size=256, num_ids_per_col=500, seed=9)
    it = iter(gen)
    batches = [next(it) for _ in range(8)]
    local, dist, ls, ds = _parity_pair(model, 8, batches)
    np.testing.assert_allclose(dist, local, rtol=_LAYOUT_DRIFT)
    # variant params trained on the mesh too
    assert int(jnp.sum(ds.tables["C3"].size)) > 0
    assert int(jnp.sum(ds.tables["C4"].size)) > 0
    np.testing.assert_allclose(
        np.asarray(ds.params["_variants"]["C2"][0]),
        np.asarray(ls.params["_variants"]["C2"][0]), atol=5e-4)


def test_distributed_variants_staleness():
    """dynamic_dim/adaptive/multihash + delayed gradients on the mesh (TODO
    r3 correctness #6): the block mask rides the FORWARD, so a k-stale grad
    applies with its compute-time mask — same trajectory as the single-chip
    staleness Trainer; first-k steps equal the frozen-sparse trajectory."""

    from tests.test_variants import _variant_model

    model = _variant_model()
    gen = SyntheticCriteo(batch_size=256, num_ids_per_col=500, seed=11)
    it = iter(gen)
    batches = [next(it) for _ in range(8)]
    local, dist, ls, ds = _parity_pair(model, 8, batches, staleness=2)
    np.testing.assert_allclose(dist, local, rtol=_LAYOUT_DRIFT)
    # crisp no-drift check: the first k=2 applies are primed no-ops
    dt = DistributedTrainer(model=model, mesh=mesh8(),
                            sparse_optimizer=sparse.adagrad(lr=0.0),
                            dense_tx=optax.adagrad(0.05),
                            per_shard_capacity=2 ** 10, staleness=2)
    s = dt.init_state(jax.random.PRNGKey(0))
    frozen = []
    for b in batches[:2]:
        s, m = dt.train_step(s, b)
        frozen.append(float(m["loss"]))
    np.testing.assert_allclose(frozen, dist[:2], rtol=1e-6)

def test_sharded_tiers_on_single_device_mesh():
    """Round-4 review fix: a 1-device mesh's addressable shards carry
    index slice(None) (start is None) — demote's per-shard host copy must
    treat that replicated shard as shard 0 instead of raising TypeError."""

    from jax.sharding import Mesh

    from deeprec_tpu.parallel.tiers import ShardedTiers

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("data",))
    model = tiny_model(n_cols=2, emb_dim=4)
    tr = DistributedTrainer(model=model, mesh=mesh,
                            sparse_optimizer=sparse.adagrad(lr=0.05),
                            dense_tx=optax.adagrad(0.05),
                            per_shard_capacity=64)
    state = tr.init_state(jax.random.PRNGKey(0))
    tr.tiers = {n: ShardedTiers(t, mesh, "data", hot_watermark=0.5,
                                evict_fraction=0.5)
                for n, t in state.tables.items()}
    it = iter(SyntheticCriteo(batch_size=128, num_ids_per_col=600, seed=3))
    for _ in range(10):
        state, _ = tr.train_step(state, next(it))
        for n, tier in tr.tiers.items():
            if tier.needs_demote(state.tables[n]):
                state.tables[n] = tier.demote(state.tables[n])
    assert any(tier.cold_size > 0 for tier in tr.tiers.values())


def test_staleness_fifo_is_batch_proportional_not_capacity():
    """Round-5 verdict: FIFO entries must buffer only exchange-bucket-sized
    state.  At production table sizes a capacity-proportional plane is
    k x S x C x 4 B per table (GBs); the footprint must not move when the
    per-shard capacity grows 8x at fixed batch."""

    model = tiny_model(n_cols=2)
    gen = SyntheticCriteo(batch_size=256, num_ids_per_col=500, seed=9)
    batch = next(iter(gen))

    def fifo_bytes(cap):
        dt = DistributedTrainer(model=model, mesh=mesh8(),
                                sparse_optimizer=sparse.adagrad(lr=0.05),
                                dense_tx=optax.adagrad(0.05),
                                per_shard_capacity=cap, staleness=2)
        s = dt.init_state(jax.random.PRNGKey(0))
        s, _ = dt.train_step(s, batch)  # FIFO primed + one real push
        assert s.pending is not None
        return sum(x.size * x.dtype.itemsize
                   for x in jax.tree.leaves(s.pending))

    small, big = fifo_bytes(2 ** 10), fifo_bytes(2 ** 13)
    assert big == small, (small, big)  # capacity-independent
