"""Length-bucketed varlen sequences (data/bucketing.py): exactness +
training parity — the TPU-native answer to the reference's SparseTensor
varlen sequence columns (python/ops/embedding_ops.py;
docs_en/Embedding-Variable.md sequence columns)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deeprec_tpu.data.behavior import SyntheticBehavior
from deeprec_tpu.data.bucketing import EMPTY, LengthBucketedStream, _lengths
from deeprec_tpu.models import base, get_model
from deeprec_tpu.optimizers import sparse
from deeprec_tpu.train.loop import Trainer


def _take(it, n):
    out = []
    for b in it:
        out.append(b)
        if len(out) == n:
            break
    return out


def test_single_bucket_is_bitexact_passthrough():
    """One bucket == the generator's padded length: every batch passes
    through whole, in order, bit for bit."""

    gen = SyntheticBehavior(batch_size=128, seq_len=16, seed=3, steps=6)
    plain = _take(iter(gen), 6)
    bucketed = _take(iter(LengthBucketedStream(
        iter(SyntheticBehavior(batch_size=128, seq_len=16, seed=3, steps=6)),
        buckets=(16,))), 6)
    assert len(bucketed) == 6
    for a, b in zip(plain, bucketed):
        np.testing.assert_array_equal(a["label"], b["label"])
        np.testing.assert_array_equal(a["dense"], b["dense"])
        for k in a["cat"]:
            np.testing.assert_array_equal(np.asarray(a["cat"][k]),
                                          np.asarray(b["cat"][k]))


def test_buckets_are_homogeneous_and_lossless():
    """Skewed lengths split across buckets: every emitted batch is exactly
    batch_size, its sequence width equals its bucket, all its samples fit
    the bucket, and (with drop_remainder=False) no sample is lost or
    altered across the re-batch."""

    gen = SyntheticBehavior(batch_size=256, seq_len=50, median_len=8,
                            seed=5, steps=8)
    src = _take(iter(gen), 8)
    stream = LengthBucketedStream(iter(src), buckets=(8, 32, 50),
                                  drop_remainder=False)
    got = list(stream)
    widths = {b["cat"]["hist_item"].shape[1] for b in got}
    assert widths <= {8, 32, 50} and len(widths) > 1
    n_src = sum(len(b["label"]) for b in src)
    n_got = sum(len(b["label"]) for b in got)
    assert n_got == n_src

    def sig(batches, truncate):
        rows = []
        for b in batches:
            hist = np.asarray(b["cat"]["hist_item"])
            ln = (hist != EMPTY).sum(1)
            for i in range(len(ln)):
                rows.append((int(b["cat"]["item"][i]),
                             float(b["label"][i]), int(ln[i]),
                             tuple(hist[i, :ln[i]].tolist())))
        return sorted(rows)

    assert sig(got, True) == sig(src, False)
    for b in got:
        w = b["cat"]["hist_item"].shape[1]
        ln = _lengths(b, ("hist_item", "hist_category"))
        assert ln.max() <= w
        if w > 8:  # no sample that fits a smaller bucket rides a bigger one
            assert ln.min() > {32: 8, 50: 32}[w]


def test_bucketed_training_parity_and_learning():
    """(a) Fixed-width data through the bucketer trains bit-identically to
    the plain path; (b) skewed-length data through 3 buckets learns the
    planted signal with per-bucket compiled steps (varying L through one
    Trainer)."""

    model = get_model("din")
    specs = {n: dataclasses.replace(s, seq_len=16, initial_capacity=2 ** 12)
             for n, s in model.table_specs.items()}
    model = dataclasses.replace(model, table_specs=specs)

    def make_tr():
        tr = Trainer(model=model, tables=base.make_tables(model),
                     sparse_optimizer=sparse.adagrad(lr=0.1),
                     dense_tx=optax.adam(1e-3))
        return tr, tr.init_state(jax.random.PRNGKey(0))

    def gen(**kw):
        return SyntheticBehavior(batch_size=128, seq_len=16, num_items=1000,
                                 num_categories=40, seed=7, steps=10, **kw)

    losses = {}
    for mode in ("plain", "bucketed"):
        tr, state = make_tr()
        it = iter(gen()) if mode == "plain" else iter(
            LengthBucketedStream(iter(gen()), buckets=(16,)))
        ls = []
        for b in it:
            state, m = tr.train_step(state, b)
            ls.append(float(m["loss"]))
        losses[mode] = ls
    np.testing.assert_array_equal(losses["plain"], losses["bucketed"])

    # skewed lengths across 3 buckets: the engine takes [B, 4], [B, 8] and
    # [B, 16] shapes through the same Trainer and still learns
    tr, state = make_tr()
    sk = SyntheticBehavior(batch_size=128, seq_len=16, num_items=1000,
                           num_categories=40, median_len=4, seed=8,
                           steps=240)
    stream = LengthBucketedStream(iter(sk), buckets=(4, 8, 16))
    widths = set()
    for b in stream:
        widths.add(b["cat"]["hist_item"].shape[1])
        state, m = tr.train_step(state, b)
    assert len(widths) >= 2
    ev = SyntheticBehavior(batch_size=256, seq_len=16, num_items=1000,
                           num_categories=40, median_len=4, seed=9)
    res = tr.evaluate(state, iter(ev), 8)
    assert res["auc"] > 0.6, res

def _mini_seq_batch(B=8, L=6):
    rng = np.random.RandomState(0)
    hist = rng.randint(0, 50, size=(B, L)).astype(np.int32)
    lens = np.array([1, 2, 2, 3, 5, 6, 6, 4])
    for i, ln in enumerate(lens):
        hist[i, ln:] = EMPTY
    return {
        "label": np.zeros((B,), np.float32),
        "dense": np.zeros((B, 1), np.float32),
        "cat": {"item": rng.randint(0, 9, size=(B,)).astype(np.int32),
                "hist_item": hist,
                "hist_w": rng.rand(B, L).astype(np.float32)},
        "weights": {"hw2": rng.rand(B, L).astype(np.float32)},
    }, lens


def test_weight_columns_truncate_with_their_ids():
    """Round-4 review fix: per-position combiner weights (float columns in
    'cat' or in the 'weights' dict, same padded width as the ids) must be
    (a) excluded from length voting and (b) truncated alongside the id
    column, keeping positions aligned."""

    batch, lens = _mini_seq_batch()
    out = _take(iter(LengthBucketedStream(
        iter([batch] * 12), buckets=(2, 6), batch_size=4,
        drop_remainder=False)), 6)
    assert out, "stream emitted nothing"
    for b in out:
        w_id = np.asarray(b["cat"]["hist_item"]).shape[1]
        assert b["cat"]["hist_w"].shape[1] == w_id
        assert b["weights"]["hw2"].shape[1] == w_id
        assert w_id in (2, 6)
    # float column did not pin lengths: the short samples landed in bucket 2
    assert any(np.asarray(b["cat"]["hist_item"]).shape[1] == 2 for b in out)


def test_interior_empty_keeps_trailing_ids():
    """_lengths must use 1 + last-non-EMPTY, not the count: a multivalent
    bag [5, EMPTY, 7] is length 3, and truncating it to a 2-bucket would
    drop the live trailing id."""

    arr = np.full((3, 4), EMPTY, np.int32)
    arr[0, :2] = [5, 6]          # plain prefix -> 2
    arr[1, 0] = 5
    arr[1, 2] = 7                # interior EMPTY -> 3, not 2
    # arr[2] all EMPTY -> 0
    batch = {"label": np.zeros((3,), np.float32),
             "dense": np.zeros((3, 1), np.float32),
             "cat": {"hist_item": arr}}
    ln = _lengths(batch, ("hist_item",))
    np.testing.assert_array_equal(ln, [2, 3, 0])
    out = _take(iter(LengthBucketedStream(
        iter([batch] * 4), buckets=(2, 4), batch_size=2,
        drop_remainder=False)), 8)
    for b in out:
        h = np.asarray(b["cat"]["hist_item"])
        # no live id was dropped: every emitted row's ids appear intact
        for row in h:
            live = row[row != EMPTY]
            assert live.size in (0, 1, 2)
            if live.size == 2 and h.shape[1] == 4:
                np.testing.assert_array_equal(live, [5, 7])
