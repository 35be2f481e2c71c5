"""Model-zoo coverage: every registered model trains one step and learns on
its synthetic dataset family (the cibuild/model-test.sh role)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from deeprec_tpu import config as cfg
from deeprec_tpu.data.behavior import SyntheticBehavior, SyntheticMultiTask
from deeprec_tpu.data.synthetic import SyntheticCriteo
from deeprec_tpu.models import MODEL_NAMES, get_model
from deeprec_tpu.models import base
from deeprec_tpu.optimizers import sparse
from deeprec_tpu.train.loop import Trainer

SEQ_MODELS = {"din", "dien", "bst"}
MT_MODELS = {"mmoe", "esmm", "ple", "dbmtl", "simplemultitask"}


def data_for(name, batch_size=64, seed=0):
    if name in SEQ_MODELS:
        return SyntheticBehavior(batch_size=batch_size, num_items=2000,
                                 num_categories=50, seq_len=10, seed=seed)
    if name in MT_MODELS:
        return SyntheticMultiTask(batch_size=batch_size, num_ids_per_col=300,
                                  seed=seed)
    return SyntheticCriteo(batch_size=batch_size, num_ids_per_col=300,
                           seed=seed)


def small_model(name):
    model = get_model(name)
    specs = {n: dataclasses.replace(s, initial_capacity=2 ** 10)
             for n, s in model.table_specs.items()}
    return dataclasses.replace(model, table_specs=specs)


@pytest.mark.parametrize("name", MODEL_NAMES)
def test_model_trains_one_step(name):
    model = small_model(name)
    tables = base.make_tables(model)
    tr = Trainer(model=model, tables=tables,
                 sparse_optimizer=sparse.adagrad(lr=0.01),
                 dense_tx=optax.adagrad(0.01))
    state = tr.init_state(jax.random.PRNGKey(0))
    # dense dim mismatch: behavior data has dense [B,1]; criteo [B,13]
    it = iter(data_for(name))
    b = next(it)
    state, m = tr.train_step(state, b)
    assert np.isfinite(float(m["loss"])), name
    logits, loss = tr.eval_step(state, next(it))
    assert np.isfinite(float(loss)), name


def test_din_learns_cluster_signal():
    """Attention model recovers the planted cluster preference."""

    model = small_model("din")
    tables = base.make_tables(model)
    tr = Trainer(model=model, tables=tables,
                 sparse_optimizer=sparse.adagrad(lr=0.1),
                 dense_tx=optax.adam(1e-3))
    state = tr.init_state(jax.random.PRNGKey(0))
    gen = SyntheticBehavior(batch_size=256, num_items=1000, num_categories=40,
                            num_clusters=16, seq_len=10, seed=1)
    state = tr.fit(state, iter(gen), steps=300, log_every=0)
    eval_gen = SyntheticBehavior(batch_size=256, num_items=1000,
                                 num_categories=40, num_clusters=16,
                                 seq_len=10, seed=77)
    m = tr.evaluate(state, iter(eval_gen), steps=8)
    assert m["auc"] > 0.65, m


def test_esmm_ctcvr_bounded_by_ctr():
    """ESMM structural property: pCTCVR <= pCTR for every example."""

    model = small_model("esmm")
    tables = base.make_tables(model)
    tr = Trainer(model=model, tables=tables,
                 sparse_optimizer=sparse.adagrad(lr=0.05),
                 dense_tx=optax.adagrad(0.05))
    state = tr.init_state(jax.random.PRNGKey(0))
    gen = SyntheticMultiTask(batch_size=128, num_ids_per_col=300, seed=2)
    it = iter(gen)
    for _ in range(5):
        state, _ = tr.train_step(state, next(it))
    # run forward manually to get both heads
    from deeprec_tpu.train.loop import make_features
    b = next(it)
    feats = make_features(model, b)
    tables2, lks, gathered, handles = tr._grouped_lookup(
        state.tables, feats, state.step, False)
    acts = tr._make_acts(gathered, lks, handles, feats, tables2)
    out = model.forward(state.params, b, acts, False)
    p_ctr = jax.nn.sigmoid(out["ctr"].astype(jnp.float32))
    p_ctcvr = jax.nn.sigmoid(out["ctcvr"].astype(jnp.float32))
    assert bool(jnp.all(p_ctcvr <= p_ctr + 1e-6))


@pytest.mark.parametrize("name", ["dien", "bst"])
def test_sequence_models_learn(name):
    """DIEN (GRU+AUGRU) and BST (transformer) recover the planted cluster
    preference, like DIN."""

    model = small_model(name)
    tables = base.make_tables(model)
    tr = Trainer(model=model, tables=tables,
                 sparse_optimizer=sparse.adagrad(lr=0.1),
                 dense_tx=optax.adam(1e-3))
    state = tr.init_state(jax.random.PRNGKey(0))
    gen = SyntheticBehavior(batch_size=256, num_items=1000, num_categories=40,
                            num_clusters=16, seq_len=10, seed=1)
    state = tr.fit(state, iter(gen), steps=200, log_every=0)
    ev = SyntheticBehavior(batch_size=256, num_items=1000, num_categories=40,
                           num_clusters=16, seq_len=10, seed=9)
    m = tr.evaluate(state, iter(ev), 8)
    assert m["auc"] > 0.65, (name, m)


@pytest.mark.parametrize("name", ["wdl", "dlrm", "deepfm", "dcn", "dcnv2",
                                  "masknet", "dssm", "mmoe", "esmm", "ple",
                                  "dbmtl", "simplemultitask"])
def test_every_model_learns(name):
    """Every non-sequence model lifts eval AUC well above chance on the
    planted-signal generators (the modelzoo benchmark's AUC check role)."""

    model = small_model(name)
    tr = Trainer(model=model, tables=base.make_tables(model),
                 sparse_optimizer=sparse.adagrad(lr=0.05),
                 dense_tx=optax.adagrad(0.02))
    state = tr.init_state(jax.random.PRNGKey(0))
    if model.tasks:
        gen = SyntheticMultiTask(batch_size=256, num_ids_per_col=800, seed=1)
        egen = SyntheticMultiTask(batch_size=256, num_ids_per_col=800, seed=9)
    else:
        gen = SyntheticCriteo(batch_size=256, num_ids_per_col=800, seed=1)
        egen = SyntheticCriteo(batch_size=256, num_ids_per_col=800, seed=9)
    state = tr.fit(state, iter(gen), steps=150, log_every=0)
    m = tr.evaluate(state, iter(egen), 8)
    assert m["auc"] > 0.62, (name, m)


def test_gru_hoist_matches_naive_recurrence():
    """The input-projection-hoisted GRU/AUGRU (one big MXU matmul for the x
    half of every gate) is numerically the naive concat-matmul recurrence."""

    from deeprec_tpu.models import nn

    key = jax.random.PRNGKey(3)
    b, l, d, h = 4, 7, 6, 5
    p = nn.gru_init(key, d, h)
    xs = jax.random.normal(jax.random.PRNGKey(4), (b, l, d))
    mask = jnp.arange(l)[None, :] < jnp.array([[7], [3], [5], [1]])
    att = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(5), (b, l)))

    def naive(p, xs, mask, att=None):
        hs = jnp.zeros((b, h))
        outs = []
        for t in range(l):
            x = xs[:, t]
            xi = jnp.concatenate([x, hs], axis=-1)
            z = jax.nn.sigmoid(xi @ p["wz"] + p["bz"])
            r = jax.nn.sigmoid(xi @ p["wr"] + p["br"])
            xh = jnp.concatenate([x, r * hs], axis=-1)
            hh = jnp.tanh(xh @ p["wh"] + p["bh"])
            zz = z if att is None else att[:, t, None] * z
            h_new = (1 - zz) * hs + zz * hh
            hs = jnp.where(mask[:, t, None], h_new, hs)
            outs.append(hs)
        return jnp.stack(outs, axis=1), hs

    want_o, want_f = naive(p, xs, mask)
    got_o, got_f = nn.gru_apply(p, xs, mask)
    np.testing.assert_allclose(got_o, want_o, atol=1e-5)
    np.testing.assert_allclose(got_f, want_f, atol=1e-5)

    want_o, want_f = naive(p, xs, mask, att)
    got_o, got_f = nn.augru_apply(p, xs, att, mask)
    np.testing.assert_allclose(got_o, want_o, atol=1e-5)
    np.testing.assert_allclose(got_f, want_f, atol=1e-5)
