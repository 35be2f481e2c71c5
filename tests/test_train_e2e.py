"""End-to-end training tests: the full lookup→grad→update loop learns.

Equivalent of the reference's model-level integration tests
(cibuild/model-test.sh + modelzoo/benchmark): train on synthetic data with
planted signal and assert AUC lifts well above chance.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from deeprec_tpu import config as cfg
from deeprec_tpu.data.synthetic import SyntheticCriteo, auc_numpy
from deeprec_tpu.embedding import table as ev
from deeprec_tpu.models import base, nn
from deeprec_tpu.optimizers import sparse
from deeprec_tpu.train.loop import Trainer


def tiny_model(n_cols=4, emb_dim=8):
    cols = base.CATEGORICAL_COLUMNS[:n_cols]

    specs = {c: base.TableSpec(name=c, dim=emb_dim, initial_capacity=2 ** 12)
             for c in cols}

    def init_params(key):
        return {"mlp": nn.mlp_init(key, 13 + emb_dim * n_cols, [64, 1])}

    def forward(params, batch, acts, train=True):
        x = jnp.concatenate([batch["dense"]] + [acts[c] for c in cols], axis=1)
        return nn.mlp_apply(params["mlp"], x)[:, 0]

    return base.RecModel(name="tiny", table_specs=specs,
                         init_params=init_params, forward=forward)


class TinyData(SyntheticCriteo):
    pass


def test_training_learns_synthetic_signal():
    model = tiny_model()
    tables = base.make_tables(model)
    trainer = Trainer(
        model=model,
        tables=tables,
        sparse_optimizer=sparse.adagrad(lr=0.05),
        dense_tx=optax.adagrad(0.05),
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    gen = SyntheticCriteo(batch_size=512, num_ids_per_col=2000, seed=1)
    state = trainer.fit(state, iter(gen), steps=150, log_every=0)
    # eval on fresh data from the same distribution
    eval_gen = SyntheticCriteo(batch_size=512, num_ids_per_col=2000, seed=99)
    m = trainer.evaluate(state, iter(eval_gen), steps=10)
    assert m["auc"] > 0.62, f"AUC too low: {m}"
    # tables actually grew with data
    assert any(int(t.size) > 100 for t in state.tables.values())


def test_training_with_filter_and_eviction():
    """Counter filter + TTL eviction integrated in a real training loop."""

    model = tiny_model(n_cols=2)
    opt = cfg.EmbeddingVariableOption(
        counter_filter=cfg.CounterFilterOption(filter_freq=2),
        global_step_evict=cfg.GlobalStepEvictOption(steps_to_live=1000),
        initial_capacity=2 ** 12,
    )
    tables = base.make_tables(model, option=opt)
    trainer = Trainer(
        model=model,
        tables=tables,
        sparse_optimizer=sparse.adagrad(lr=0.05),
        dense_tx=optax.adagrad(0.05),
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    gen = SyntheticCriteo(batch_size=256, num_ids_per_col=500, seed=2)
    state = trainer.fit(state, iter(gen), steps=30, log_every=0)
    # shrink with a huge step: everything should be evictable
    t0 = state.tables["C1"]
    t_after = ev.shrink(t0, step=10_000)
    assert int(t_after.size) == 0
    # shrink at current step: recent keys survive
    t_keep = ev.shrink(t0, step=30)
    assert int(t_keep.size) > 0


def test_bf16_training_runs():
    model = tiny_model(n_cols=2)
    tables = base.make_tables(model)
    trainer = Trainer(
        model=model, tables=tables,
        sparse_optimizer=sparse.adagrad(lr=0.05),
        dense_tx=optax.adagrad(0.05), bf16=True,
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    gen = SyntheticCriteo(batch_size=128, num_ids_per_col=500, seed=3)
    state = trainer.fit(state, iter(gen), steps=5, log_every=0)
    assert np.isfinite(float(state.auc.n_pos))


def test_bf16_grad_downcast_is_lossless():
    """Under bf16 compute, the cotangent at the gathered boundary is an
    exact upcast of a bf16 value, so forcing the sparse apply's grads down
    to bf16 produces BITWISE-identical tables (the capability the stream
    kernel's native-bf16 layout relies on; default stays f32 — measured
    slower in-step, see PERF.md rejected optimizations)."""

    import jax.numpy as jnp

    def run(downcast):
        model = tiny_model(n_cols=2)
        tables = base.make_tables(model)
        tr = Trainer(model=model, tables=tables,
                     sparse_optimizer=sparse.adagrad(lr=0.05),
                     dense_tx=optax.adagrad(0.05), bf16=True)
        if downcast:
            tr._grad_for_apply = lambda g: g.astype(jnp.bfloat16)
        state = tr.init_state(jax.random.PRNGKey(0))
        gen = SyntheticCriteo(batch_size=128, num_ids_per_col=500, seed=3)
        it = iter(gen)
        for _ in range(6):
            state, _ = tr.train_step(state, next(it))
        return state

    a, b = run(True), run(False)
    for n in a.tables:
        np.testing.assert_array_equal(
            np.asarray(a.tables[n].values), np.asarray(b.tables[n].values),
            err_msg=n)


@pytest.mark.parametrize("model_name", ["dlrm", "wdl", "deepfm"])
def test_model_smoke(model_name):
    """One train step through each real model (shape/compile check)."""

    import importlib

    mod = importlib.import_module(f"deeprec_tpu.models.{model_name}")
    model = mod.MODEL
    specs = {n: dataclasses.replace(s, initial_capacity=2 ** 10)
             for n, s in model.table_specs.items()}
    model = dataclasses.replace(model, table_specs=specs)
    tables = base.make_tables(model)
    trainer = Trainer(
        model=model, tables=tables,
        sparse_optimizer=sparse.adagrad(lr=0.01),
        dense_tx=optax.adagrad(0.01),
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    gen = SyntheticCriteo(batch_size=64, num_ids_per_col=300, seed=4)
    it = iter(gen)
    state, m = trainer.train_step(state, next(it))
    assert np.isfinite(float(m["loss"]))
    logits, loss = trainer.eval_step(state, next(it))
    assert logits.shape == (64,)


def test_weighted_sparse_combine():
    """SparseFeature.weights (sparse_weights in embedding_lookup_sparse)."""

    import jax.numpy as jnp
    from deeprec_tpu import config as cfg
    from deeprec_tpu.embedding import lookup as lkp
    from deeprec_tpu.embedding import table as evt

    t = evt.create("t", dim=4, capacity=64,
                   option=cfg.EmbeddingVariableOption(
                       init=cfg.InitializerOption(initializer="constant",
                                                  constant=1.0)))
    ids = jnp.array([[1, 2], [3, evt.empty_key(jnp.int32)]], jnp.int32)
    w = jnp.array([[2.0, 3.0], [4.0, 9.9]], jnp.float32)
    t, lk = evt.lookup_phase(t, ids.reshape(-1))
    g = evt.collect(t, lk)
    feat = lkp.SparseFeature(ids=ids, weights=w)
    out_sum = lkp.combine(g, lk.inverse, feat, t.empty, cfg.Combiner.SUM)
    np.testing.assert_allclose(np.asarray(out_sum[0]), [5, 5, 5, 5])
    np.testing.assert_allclose(np.asarray(out_sum[1]), [4, 4, 4, 4])  # pad masked
    out_mean = lkp.combine(g, lk.inverse, feat, t.empty, cfg.Combiner.MEAN)
    np.testing.assert_allclose(np.asarray(out_mean[0]), [1, 1, 1, 1])
    out_sqrtn = lkp.combine(g, lk.inverse, feat, t.empty, cfg.Combiner.SQRTN)
    np.testing.assert_allclose(np.asarray(out_sqrtn[1]),
                               np.full(4, 4.0 / 4.0), rtol=1e-6)


def test_fused_multi_step_matches_per_step():
    """make_multi_step (K steps per dispatch, the production loop shape)
    must be bit-identical to K separate train_step dispatches."""

    import jax.numpy as jnp

    model = tiny_model(n_cols=2)
    gen_it = iter(SyntheticCriteo(batch_size=128, num_ids_per_col=400, seed=8))
    batches = [next(gen_it) for _ in range(8)]

    def build():
        tables = base.make_tables(model)
        tr = Trainer(model=model, tables=tables,
                     sparse_optimizer=sparse.adagrad(lr=0.05),
                     dense_tx=optax.adagrad(0.05))
        return tr, tr.init_state(jax.random.PRNGKey(0))

    tr1, s1 = build()
    for b in batches:
        s1, m = tr1.train_step(s1, b)

    tr2, s2 = build()
    multi = tr2.make_multi_step(4)
    for i in range(2):
        stacked = jax.tree.map(lambda *xs: np.stack(xs), *batches[i*4:(i+1)*4])
        s2, losses = multi(s2, stacked)
        assert losses.shape == (4,)

    b = batches[0]
    l1, _ = tr1.eval_step(s1, b)
    l2, _ = tr2.eval_step(s2, b)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    assert int(s1.step) == int(s2.step) == 8


def test_fit_fused_dispatch():
    """fit(steps_per_dispatch=K) trains and learns like plain fit."""

    model = tiny_model()
    tables = base.make_tables(model)
    tr = Trainer(model=model, tables=tables,
                 sparse_optimizer=sparse.adagrad(lr=0.05),
                 dense_tx=optax.adagrad(0.05))
    state = tr.init_state(jax.random.PRNGKey(0))
    state = tr.fit(state, SyntheticCriteo(batch_size=512, seed=3), 60,
                   steps_per_dispatch=4, log_every=0)
    assert int(state.step) == 60
    m = tr.evaluate(state, SyntheticCriteo(batch_size=512, seed=9), 10)
    assert m["auc"] > 0.6, m

def test_combine_small_weight_sums_divide_truly():
    """Round-4 review fix: MEAN/SQRTN divide by the TRUE weight sum — a
    clamp-to-1 denominator silently shrank activations whenever an
    example's combiner weights summed below 1 (embedding_lookup_sparse
    divides exactly)."""

    import jax.numpy as jnp
    from deeprec_tpu import config as cfg
    from deeprec_tpu.embedding import lookup as lkp
    from deeprec_tpu.embedding import table as evt

    t = evt.create("t", dim=4, capacity=64,
                   option=cfg.EmbeddingVariableOption(
                       init=cfg.InitializerOption(initializer="constant",
                                                  constant=1.0)))
    emp = evt.empty_key(jnp.int32)
    ids = jnp.array([[1, 2], [3, emp], [emp, emp]], jnp.int32)
    w = jnp.array([[0.2, 0.3], [0.5, 7.7], [1.0, 1.0]], jnp.float32)
    t, lk = evt.lookup_phase(t, ids.reshape(-1))
    g = evt.collect(t, lk)
    feat = lkp.SparseFeature(ids=ids, weights=w)
    out_mean = lkp.combine(g, lk.inverse, feat, t.empty, cfg.Combiner.MEAN)
    # (0.2*1 + 0.3*1) / 0.5 = 1.0, NOT /1 = 0.5
    np.testing.assert_allclose(np.asarray(out_mean[0]), np.ones(4), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out_mean[1]), np.ones(4), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out_mean[2]), np.zeros(4))  # all-pad
    out_sq = lkp.combine(g, lk.inverse, feat, t.empty, cfg.Combiner.SQRTN)
    # sqrt(0.04+0.09)=0.3606 -> 0.5/0.3606
    np.testing.assert_allclose(np.asarray(out_sq[0]),
                               np.full(4, 0.5 / np.sqrt(0.13)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_sq[2]), np.zeros(4))
