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
        state, loss = tr.train_step(state, next(it))
        losses.append(float(loss))
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
    ds, dloss = dt.train_step(ds, batch)
    np.testing.assert_allclose(float(dloss), local_loss, rtol=1e-4)


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
        state, loss = tr.train_step(state, next(it))
        losses.append(float(loss))
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
        state, loss = tr.train_step(state, next(it))
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)
    # with only 50 ids/col and batch 256, every id repeats >3x per batch:
    # admission passes and training proceeds (loss finite and moving)
    assert losses[-1] != losses[0]
