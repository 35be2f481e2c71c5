"""Input pipeline tests: native Criteo parser, TSV/Parquet readers,
prefetch staging, WorkQueue (prefetch_test.py / work_queue_test.py roles)."""

import os

import numpy as np
import pytest

from deeprec_tpu.data import native
from deeprec_tpu.data.criteo import CriteoTSV
from deeprec_tpu.data.prefetch import Prefetcher, smart_stage
from deeprec_tpu.data.work_queue import WorkQueue


def _write_tsv(path, rows, seed=0):
    rng = np.random.RandomState(seed)
    with open(path, "w") as f:
        for i in range(rows):
            label = rng.randint(0, 2)
            ints = [str(rng.randint(0, 1000)) if rng.rand() > 0.1 else ""
                    for _ in range(13)]
            cats = ["%08x" % rng.randint(0, 2 ** 31) if rng.rand() > 0.1 else ""
                    for _ in range(26)]
            f.write("\t".join([str(label)] + ints + cats) + "\n")


def test_native_parser_basic():
    line = "1\t" + "\t".join(str(i) for i in range(13)) + "\t" + \
        "\t".join("%x" % (0x10 + i) for i in range(26)) + "\n"
    labels, dense, cats, consumed = native.criteo_parse(line.encode(), 10)
    assert len(labels) == 1
    assert labels[0] == 1.0
    np.testing.assert_allclose(dense[0], np.log1p(np.arange(13)), rtol=1e-6)
    np.testing.assert_array_equal(cats[0], np.arange(0x10, 0x10 + 26))
    assert consumed == len(line)


def test_native_parser_missing_fields():
    line = "0\t\t5\t" + "\t".join([""] * 11) + "\t" + "\t".join([""] * 26) + "\n"
    labels, dense, cats, _ = native.criteo_parse(line.encode(), 10)
    assert labels[0] == 0.0
    assert dense[0, 0] == 0.0 and abs(dense[0, 1] - np.log1p(5)) < 1e-6
    np.testing.assert_array_equal(cats[0], 0)


def test_native_parser_partial_line():
    data = b"1\t2\t3"  # no newline: nothing consumed
    labels, dense, cats, consumed = native.criteo_parse(data, 10)
    assert len(labels) == 0 and consumed == 0


def test_tsv_reader_batches(tmp_path):
    p = str(tmp_path / "a.tsv")
    _write_tsv(p, 1000)
    batches = list(CriteoTSV([p], batch_size=256))
    assert len(batches) == 3  # 1000 // 256
    b = batches[0]
    assert b["dense"].shape == (256, 13)
    assert b["label"].shape == (256,)
    assert set(b["cat"]) == {f"C{i}" for i in range(1, 27)}
    assert b["cat"]["C1"].dtype == np.int32


def test_tsv_reader_throughput(tmp_path):
    """Native parser sustains >1M rows/s (input must not bottleneck TPU)."""

    import time

    p = str(tmp_path / "big.tsv")
    _write_tsv(p, 20000)
    # warm (build lib)
    list(CriteoTSV([p], batch_size=4096))
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        n = sum(len(b["label"]) for b in CriteoTSV([p], batch_size=4096))
        best = max(best, n / (time.perf_counter() - t0))
    assert n >= 16384
    # 2.7M rows/s in isolation; keep slack for CI contention
    assert best > 300_000, f"parser too slow: {best:,.0f} rows/s"


def test_prefetcher_overlaps_and_preserves_order():
    src = [{"x": np.full((4,), i)} for i in range(10)]
    out = list(Prefetcher(iter(src), depth=3, to_device=False))
    assert len(out) == 10
    for i, b in enumerate(out):
        np.testing.assert_array_equal(b["x"], np.full((4,), i))


def test_prefetcher_propagates_errors():
    def gen():
        yield {"x": np.zeros(2)}
        raise RuntimeError("boom")

    it = Prefetcher(gen(), depth=2, to_device=False)
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        next(it)


def test_smart_stage_device_put():
    import jax

    src = [{"x": np.arange(8, dtype=np.float32)} for _ in range(3)]
    out = list(smart_stage(iter(src), depth=2))
    assert len(out) == 3
    assert isinstance(out[0]["x"], jax.Array)


def test_work_queue_dispatch_and_restore():
    q = WorkQueue([f"f{i}" for i in range(6)], num_epochs=2)
    got = [q.take() for _ in range(4)]
    assert got == ["f0", "f1", "f2", "f3"]
    st = q.state()

    q2 = WorkQueue([f"f{i}" for i in range(6)], num_epochs=2)
    q2.restore(st)
    rest = list(q2)
    # remaining: f4 f5 of epoch 0 + all of epoch 1
    assert rest == ["f4", "f5"] + [f"f{i}" for i in range(6)]


def test_work_queue_multithreaded():
    import threading

    q = WorkQueue([str(i) for i in range(100)], num_epochs=1)
    seen = []
    lock = threading.Lock()

    def worker():
        for item in q:
            with lock:
                seen.append(item)

    ts = [threading.Thread(target=worker) for _ in range(4)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert sorted(seen, key=int) == [str(i) for i in range(100)]
    assert len(set(seen)) == 100


def test_work_queue_input_dataset(tmp_path):
    p1, p2 = str(tmp_path / "a.tsv"), str(tmp_path / "b.tsv")
    _write_tsv(p1, 300, seed=1)
    _write_tsv(p2, 300, seed=2)
    q = WorkQueue([p1, p2], num_epochs=1)
    n = sum(len(b["label"])
            for b in q.input_dataset(
                lambda paths: CriteoTSV(paths, batch_size=128)))
    assert n == 2 * 256  # 300//128 = 2 batches per file


def test_parquet_reader(tmp_path):
    """CriteoParquet (the ParquetDataset capability) round-trip via pyarrow."""

    import pyarrow as pa
    import pyarrow.parquet as pq

    from deeprec_tpu.data.criteo import CriteoParquet
    from deeprec_tpu.models import base

    rng = np.random.RandomState(0)
    n = 600
    cols = {base.LABEL_COLUMN: rng.randint(0, 2, n).astype(np.float32)}
    for c in base.CONTINUOUS_COLUMNS:
        cols[c] = rng.randint(0, 100, n).astype(np.int64)
    for c in base.CATEGORICAL_COLUMNS:
        cols[c] = rng.randint(0, 2 ** 31, n).astype(np.int64)
    p = str(tmp_path / "part.parquet")
    pq.write_table(pa.table(cols), p)

    batches = list(CriteoParquet([p], batch_size=256))
    assert len(batches) == 2
    b = batches[0]
    assert b["dense"].shape == (256, 13)
    np.testing.assert_allclose(
        b["dense"][:, 0], np.log1p(cols["I1"][:256].astype(np.float32)),
        rtol=1e-6)
    np.testing.assert_array_equal(
        b["cat"]["C1"], (cols["C1"][:256] & 0x7FFFFFFF).astype(np.int32))
    np.testing.assert_array_equal(b["label"], cols[base.LABEL_COLUMN][:256])


def test_criteo_proxy_calibration():
    """Criteo-Kaggle proxy pins: published cardinalities respected, CTR near
    the Kaggle 25.6%, Bayes ceiling calibrated to ~0.80, TSV export reads
    back through the real CriteoTSV parser path."""

    from deeprec_tpu.data import criteo_proxy as cp
    from deeprec_tpu.models import base as mbase

    p = cp.CriteoKaggleProxy(batch_size=4096, seed=5)
    rng = np.random.RandomState(0)
    b = p.sample(rng)
    assert b["dense"].shape == (4096, 13)
    for ci, col in enumerate(mbase.CATEGORICAL_COLUMNS):
        ids = b["cat"][col]
        assert ids.min() >= 0
        assert ids.max() < cp.KAGGLE_CARDINALITIES[ci]
    ctr = np.mean([p.sample(rng)["label"].mean() for _ in range(8)])
    assert 0.22 < ctr < 0.29, ctr
    bayes = cp.bayes_auc(p, 6)
    assert 0.77 < bayes < 0.84, bayes
    # skew: the top-1% of C3 ids cover a large share of a batch
    c3 = np.concatenate([p.sample(rng)["cat"]["C3"] for _ in range(4)])
    _, counts = np.unique(c3, return_counts=True)
    top = np.sort(counts)[::-1]
    assert top[: max(1, len(top) // 100)].sum() > 0.10 * len(c3)


def test_criteo_proxy_tsv_roundtrip(tmp_path):
    from deeprec_tpu.data.criteo import CriteoTSV
    from deeprec_tpu.data.criteo_proxy import CriteoKaggleProxy

    p = CriteoKaggleProxy(batch_size=256, seed=3)
    f = str(tmp_path / "train.txt")
    p.write_tsv(f, 1000)
    ds = CriteoTSV([f], batch_size=250)
    batches = list(iter(ds))
    n = sum(len(b["label"]) for b in batches)
    assert n == 1000
    b = batches[0]
    assert b["dense"].shape == (250, 13)
    assert set(b["cat"]) == set(
        f"C{i}" for i in range(1, 27))
    assert 0.1 < np.concatenate([x["label"] for x in batches]).mean() < 0.4


def test_device_proxy_matches_host_distribution():
    """DeviceCriteoProxy (on-device jit generation): bit-identical latent
    ground truth to the host path, same CTR/cardinality envelope, and the
    ground-truth scorer's AUC stays at the calibrated Bayes ceiling —
    i.e. a model trained on device batches is scored fairly by the host
    proxy's held-out stream."""

    import jax.numpy as jnp
    from deeprec_tpu.data import criteo_proxy as cp
    from deeprec_tpu.data.synthetic import _latent_weight, auc_numpy

    # 1) latent-effect parity: jnp path == numpy path for arbitrary ids
    ids = np.random.RandomState(0).randint(-2 ** 31, 2 ** 31 - 1,
                                           2048).astype(np.int32)
    for salt, scale in ((7, 0.5), (33, 1.25)):
        want = _latent_weight(ids.astype(np.int64) & 0xFFFFFFFF, salt, scale)
        got = np.asarray(cp._latent_weight_jnp(jnp.asarray(ids), salt, scale))
        np.testing.assert_allclose(got, want, atol=1e-5)

    gen = cp.DeviceCriteoProxy(batch_size=4096, seed=3)
    it = iter(gen)
    labels, logits = [], []
    for _ in range(8):
        b = next(it)
        for ci, (col, card) in enumerate(
                zip([f"C{i}" for i in range(1, 27)],
                    cp.KAGGLE_CARDINALITIES)):
            ids = np.asarray(b["cat"][col])
            assert ids.min() >= 0 and ids.max() < card
        labels.append(np.asarray(b["label"]))
        logits.append(np.asarray(b["_true_logit"]))
    labels = np.concatenate(labels)
    logits = np.concatenate(logits)
    # 2) CTR calibration carried over from the host intercept
    assert abs(labels.mean() - cp.CTR) < 0.02
    # 3) ground-truth scorer stays at the Bayes ceiling
    auc = auc_numpy(logits, labels)
    host_bayes = cp.bayes_auc(cp.CriteoKaggleProxy(batch_size=4096), 8)
    assert abs(auc - host_bayes) < 0.02

def test_parquet_row_group_boundaries_and_nulls(tmp_path):
    """Round-4 review fixes: (a) pyarrow batches never span row groups, so
    short boundary batches must be stitched, not dropped; (b) parquet
    nulls map to 0 like the TSV parser's missing fields."""

    import pyarrow as pa
    import pyarrow.parquet as pq

    from deeprec_tpu.data.criteo import CriteoParquet
    from deeprec_tpu.models import base

    rng = np.random.RandomState(1)
    n = 500
    cols = {base.LABEL_COLUMN: rng.randint(0, 2, n).astype(np.float32)}
    for c in base.CONTINUOUS_COLUMNS:
        v = rng.randint(0, 100, n).astype(np.float64).tolist()
        v[3] = None  # missing dense field
        cols[c] = pa.array(v, pa.float64())
    for c in base.CATEGORICAL_COLUMNS:
        v = rng.randint(0, 2 ** 31, n).astype(np.int64).tolist()
        v[7] = None  # missing categorical
        cols[c] = pa.array(v, pa.int64())
    p = str(tmp_path / "part.parquet")
    # row groups of 150: every group boundary yields a short pyarrow batch
    pq.write_table(pa.table(cols), p, row_group_size=150)

    batches = list(CriteoParquet([p], batch_size=128))
    # 500 rows -> 3 full batches of 128 (the 116-row tail is dropped, as
    # with any fixed-shape reader); the OLD code lost rows at every
    # 150-row group boundary and emitted 0 batches
    assert len(batches) == 3
    total = sum(len(b["label"]) for b in batches)
    assert total == 384
    for b in batches:
        assert np.isfinite(b["dense"]).all()


def test_prefetcher_repeated_stopiteration_and_close():
    """Round-4 review fixes: next() after exhaustion raises StopIteration
    again (never deadlocks), and close() releases the producer."""

    from deeprec_tpu.data.prefetch import Prefetcher

    p = Prefetcher(iter([{"a": 1}, {"a": 2}]), depth=2, to_device=False)
    assert len(list(p)) == 2
    import pytest

    with pytest.raises(StopIteration):
        next(p)
    with pytest.raises(StopIteration):
        next(p)

    def infinite():
        i = 0
        while True:
            yield {"i": i}
            i += 1

    p2 = Prefetcher(infinite(), depth=2, to_device=False)
    assert next(p2)["i"] == 0
    p2.close()
    p2._thread.join(timeout=5)
    assert not p2._thread.is_alive()


def test_tailstream_waits_for_file_to_appear(tmp_path):
    """Round-5 review fix: the ODL consumer may start before the producer's
    first write — a missing file counts as idle, not FileNotFoundError."""

    import threading
    import time as _time

    from deeprec_tpu.data.kafka import TailStream

    p = str(tmp_path / "notyet.txt")
    # 1) never appears: the idle timeout ends the stream cleanly
    got = list(TailStream(p, batch_size=4, stop_after_idle_secs=0.3))
    assert got == []

    # 2) appears late: rows stream once the producer writes
    def writer():
        _time.sleep(0.3)
        with open(p, "w") as f:
            for i in range(8):
                f.write("1\t" + "\t".join(["1"] * 13)
                        + "\t" + "\t".join(["a"] * 26) + "\n")

    t = threading.Thread(target=writer)
    t.start()
    n = sum(len(b["label"]) for b in
            TailStream(p, batch_size=4, stop_after_idle_secs=1.0))
    t.join()
    assert n == 8


def test_prefetcher_close_does_not_hang_on_blocked_source(tmp_path):
    """Round-5 review fix: close() must return even when the producer is
    blocked INSIDE the upstream iterator (idle tail/poll loop)."""

    import time as _time

    from deeprec_tpu.data.prefetch import Prefetcher

    def blocked():
        yield {"x": 1}
        _time.sleep(60)     # producer stuck in the source
        yield {"x": 2}

    pf = Prefetcher(blocked(), depth=2, to_device=False)
    _ = next(iter(pf))
    t0 = _time.monotonic()
    pf.close(timeout=0.5)
    assert _time.monotonic() - t0 < 5.0  # returned promptly


def test_criteo_parser_skips_blank_and_truncated_lines():
    """Round-5 review: blank/truncated lines must be SKIPPED, not parsed
    as phantom label-0 examples with all-id-0 categoricals."""

    from deeprec_tpu.data import native

    good = ("1\t" + "\t".join(["2"] * 13) + "\t"
            + "\t".join(["a1b2c3"] * 26) + "\n")
    bad = "0\t1\t2\n"  # truncated: 3 fields
    buf = ("\n" + good + "\n" + bad + good).encode()
    labels, dense, cats, consumed = native.criteo_parse(buf, 100)
    assert len(labels) == 2            # the two good rows only
    assert consumed == len(buf)
    assert (labels == 1).all()


def _tsv_line(label=1):
    return (f"{label}\t" + "\t".join(["2"] * 13) + "\t"
            + "\t".join(["a1b2c3"] * 26) + "\n")


def test_criteo_tsv_rows_carry_across_file_boundaries(tmp_path):
    """Round-5 review: per-file batch accounting dropped up to
    batch_size-1 trailing rows at EVERY file boundary — 6 shard files of
    5 rows at batch 8 used to yield ZERO batches; rows must flow across
    files (only the stream-final remainder is dropped)."""

    from deeprec_tpu.data.criteo import CriteoTSV

    paths = []
    for i in range(6):
        p = tmp_path / f"shard{i}.tsv"
        p.write_text(_tsv_line() * 5)
        paths.append(str(p))
    batches = list(CriteoTSV(paths=paths, batch_size=8))
    assert len(batches) == 3  # 30 rows -> 3 full batches (was 0)
    assert all(b["label"].shape == (8,) for b in batches)


def test_kafka_stream_survives_malformed_messages():
    """Round-5 review: messages whose rows the parser skips (wrong field
    count) must be TRIMMED from the buffer, not re-parsed forever — valid
    rows arriving later still batch."""

    from deeprec_tpu.data.kafka import FakeKafkaBroker, KafkaStream

    broker = FakeKafkaBroker()
    broker.produce("t", b"garbage\tnot\tcriteo\n" * 50)  # all skipped
    broker.produce("t", (_tsv_line() * 8).encode())
    stream = KafkaStream(topics=["t"], batch_size=8,
                         consumer_factory=broker.consumer,
                         max_empty_polls=3, poll_timeout=0)
    batches = list(stream)
    assert len(batches) == 1 and batches[0]["label"].shape == (8,)
