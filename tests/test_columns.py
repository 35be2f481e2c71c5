"""Feature-column transform tests: crossed / bucketized / weighted columns
(tf.feature_column parity — feature_column_v2.py crossed_column,
bucketized_column, weighted_categorical_column), resolved declaratively by
TableSpec + models/columns.py on both the device (jnp) and host (np) paths.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from deeprec_tpu.data.synthetic import SyntheticCriteo
from deeprec_tpu.models import base, columns, nn
from deeprec_tpu.optimizers import sparse
from deeprec_tpu.train.loop import Trainer, make_features

EMPTY32 = np.iinfo(np.int32).min


def _batch(b=64, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "dense": rng.randn(b, 13).astype(np.float32),
        "cat": {
            "C1": rng.randint(0, 500, b).astype(np.int32),
            "C2": rng.randint(0, 500, b).astype(np.int32),
            "C3": rng.randint(0, 500, b).astype(np.int32),
        },
        "label": (rng.rand(b) > 0.5).astype(np.float32),
    }


def test_crossed_device_matches_host_and_range():
    spec = base.TableSpec(name="X", dim=8, cross=("C1", "C2"),
                          cross_buckets=1 << 14)
    b = _batch()
    host = columns.feature_ids(spec, None, b, np)
    dev = np.asarray(jax.jit(
        lambda bb: columns.feature_ids(spec, None, bb, jnp))(b))
    np.testing.assert_array_equal(host, dev)
    assert host.dtype == np.int32
    assert (host >= 0).all() and (host < 1 << 14).all()
    # crossing is sensitive to EVERY component
    b2 = {"cat": dict(b["cat"])}
    b2["cat"]["C2"] = b["cat"]["C2"] + 1
    assert (columns.feature_ids(spec, None, b2, np) != host).any()
    # ... and not symmetric in its components (ordered cross)
    b3 = {"cat": {"C1": b["cat"]["C2"], "C2": b["cat"]["C1"]}}
    assert (columns.feature_ids(spec, None, b3, np) != host).any()


def test_crossed_empty_propagates():
    spec = base.TableSpec(name="X", dim=8, cross=("C1", "C2"),
                          cross_buckets=1024)
    b = _batch()
    b["cat"]["C1"][3] = EMPTY32
    b["cat"]["C2"][7] = EMPTY32
    ids = columns.feature_ids(spec, None, b, np)
    assert ids[3] == EMPTY32 and ids[7] == EMPTY32
    assert (ids[:3] != EMPTY32).all()


def test_bucketized_semantics():
    spec = base.TableSpec(name="B", dim=4, numeric_feature=2,
                          bucket_boundaries=(0.0, 1.0, 2.5))
    b = _batch(b=6)
    b["dense"][:, 2] = [-1.0, 0.0, 0.5, 1.0, 2.5, 99.0]
    ids = columns.feature_ids(spec, None, b, np)
    # boundaries[i-1] <= x < boundaries[i] -> bucket i (TF bucketized_column)
    np.testing.assert_array_equal(ids, [0, 1, 1, 2, 3, 3])
    dev = np.asarray(jax.jit(
        lambda bb: columns.feature_ids(spec, None, bb, jnp))(b))
    np.testing.assert_array_equal(dev, ids)


def test_spec_validation():
    with pytest.raises(ValueError):
        base.TableSpec(name="x", dim=4, cross=("C1",), cross_buckets=8)
    with pytest.raises(ValueError):
        base.TableSpec(name="x", dim=4, cross=("C1", "C2"))
    with pytest.raises(ValueError):
        base.TableSpec(name="x", dim=4, bucket_boundaries=(1.0, 0.0),
                       numeric_feature=0)
    with pytest.raises(ValueError):
        base.TableSpec(name="x", dim=4, bucket_boundaries=(1.0,))


def test_weighted_column_scales_combine():
    """weighted_categorical_column: per-id weights flow into the combiner —
    doubling a position's weight changes the SUM-combined activation."""

    spec = base.TableSpec(name="C1", dim=4, combiner=base.cfg.Combiner.SUM,
                          seq_len=3, multivalent=True,
                          weight_feature="C1_w")
    model = _linear_model({"C1": spec}, seq=True)
    tables = base.make_tables(model, capacity=2 ** 10)
    tr = Trainer(model=model, tables=tables,
                 sparse_optimizer=sparse.adagrad(lr=0.0),
                 dense_tx=optax.adagrad(0.0))
    state = tr.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    ids = rng.randint(0, 50, (16, 3)).astype(np.int32)
    base_b = {"dense": np.zeros((16, 13), np.float32),
              "cat": {"C1": ids},
              "weights": {"C1_w": np.ones((16, 3), np.float32)},
              "label": np.zeros((16,), np.float32)}
    # train once so rows are non-default... actually insert via one step
    state, _ = tr.train_step(state, base_b)
    l1, _ = tr.eval_step(state, base_b)
    b2 = dict(base_b)
    b2["weights"] = {"C1_w": 2.0 * np.ones((16, 3), np.float32)}
    l2, _ = tr.eval_step(state, b2)
    # SUM combine is linear in the weights; the linear head keeps it visible
    assert np.abs(np.asarray(l1)).max() > 0
    np.testing.assert_allclose(np.asarray(l2), 2.0 * np.asarray(l1),
                               rtol=1e-5)


def _linear_model(specs, seq=False):
    cols = list(specs)

    def init_params(key):
        d = sum(s.dim for s in specs.values())
        return {"w": jax.random.normal(key, (d,), jnp.float32) * 0.1}

    def forward(params, batch, acts, train=True):
        x = jnp.concatenate([acts[c] for c in cols], axis=1)
        return x @ params["w"]

    return base.RecModel(name="colmodel", table_specs=specs,
                         init_params=init_params, forward=forward)


def test_crossed_and_bucketized_train_end_to_end():
    """A model whose label is a function of the C1xC2 cross learns it only
    through the crossed column (the classic crossed-column XOR case)."""

    specs = {
        "X": base.TableSpec(name="X", dim=8, cross=("C1", "C2"),
                            cross_buckets=1 << 12,
                            initial_capacity=2 ** 12),
        "B": base.TableSpec(name="B", dim=4, numeric_feature=0,
                            bucket_boundaries=(-0.5, 0.0, 0.5),
                            initial_capacity=2 ** 6),
    }
    cols = list(specs)

    def init_params(key):
        return {"mlp": nn.mlp_init(key, 12, [32, 1])}

    def forward(params, batch, acts, train=True):
        x = jnp.concatenate([acts[c] for c in cols], axis=1)
        return nn.mlp_apply(params["mlp"], x)[:, 0]

    model = base.RecModel(name="crossmodel", table_specs=specs,
                          init_params=init_params, forward=forward)
    tables = base.make_tables(model)
    tr = Trainer(model=model, tables=tables,
                 sparse_optimizer=sparse.adagrad(lr=0.1),
                 dense_tx=optax.adagrad(0.05))
    state = tr.init_state(jax.random.PRNGKey(0))

    def gen(seed, steps):
        rng = np.random.RandomState(seed)
        for _ in range(steps):
            b = 256
            c1 = rng.randint(0, 16, b).astype(np.int32)
            c2 = rng.randint(0, 16, b).astype(np.int32)
            # label depends on the JOINT (c1, c2) id — neither column alone
            # carries signal, only the cross does
            label = (((c1 * 31 + c2) % 7) < 3).astype(np.float32)
            yield {"dense": rng.randn(b, 13).astype(np.float32),
                   "cat": {"C1": c1, "C2": c2,
                           "C3": rng.randint(0, 16, b).astype(np.int32)},
                   "label": label}

    state = tr.fit(state, gen(1, 200), steps=200, log_every=0)
    m = tr.evaluate(state, gen(99, 8), steps=8)
    assert m["auc"] > 0.9, f"crossed column failed to learn joint signal: {m}"
    # the cross's physical table holds at most 16*16 live cross ids
    assert 0 < int(state.tables["X"].size) <= 256


def test_host_group_keys_covers_derived_columns():
    """The tiered-prefetch host twin must compose the SAME ids the device
    lookup will ask for (bit-identical hashing both sides)."""

    from deeprec_tpu.embedding import group as grp
    from deeprec_tpu.train.loop import host_group_keys

    specs = {
        "X": base.TableSpec(name="X", dim=8, cross=("C1", "C2"),
                            cross_buckets=1 << 12),
        "B": base.TableSpec(name="B", dim=4, numeric_feature=1,
                            bucket_boundaries=(0.0,)),
    }
    model = base.RecModel(name="m", table_specs=specs,
                          init_params=lambda k: {},
                          forward=lambda p, b, a, train=True: 0)
    plan = grp.plan_groups(specs)
    b = _batch()
    gk = host_group_keys(model, plan, b, EMPTY32)
    want_x = columns.feature_ids(specs["X"], None, b, np)
    want_b = columns.feature_ids(specs["B"], None, b, np)
    got = np.concatenate(list(gk.values()))
    all_ids = np.concatenate([want_x, want_b])
    assert set(all_ids.tolist()) <= set(got.tolist())


def test_derived_spec_with_shared_extras_host_ids_raw():
    """A crossed/bucketized spec that also declares shared_features must
    feed the extras' RAW batch ids on the host path (ADVICE r3: the device
    path always did; a derived extra would de-sync the tiered prefetch)."""

    spec = base.TableSpec(name="X", dim=4, cross=("C1", "C2"),
                          cross_buckets=1 << 12, shared_features=("C3",))
    b = {"dense": np.zeros((16, 13), np.float32),
         "cat": {c: np.arange(16, dtype=np.int32) * (i + 1)
                 for i, c in enumerate(["C1", "C2", "C3"])}}
    raw = columns.feature_ids(spec, "C3", b, np)
    np.testing.assert_array_equal(raw, b["cat"]["C3"])
    dev = np.asarray(columns.feature_ids(spec, "C3", b, jnp))
    np.testing.assert_array_equal(dev, raw)


def test_crossed_requires_int32_keys():
    """Crossed columns emit the int32 EMPTY sentinel; int64-keyed tables
    would turn padded cross positions into real ids (ADVICE r3)."""

    spec = base.TableSpec(name="X", dim=4, cross=("C1", "C2"),
                          cross_buckets=1 << 12)
    model = _linear_model({"X": spec})
    with pytest.raises(ValueError, match="int32"):
        base.make_tables(model, key_dtype=jnp.int64)
