"""Serving tests: lifecycle, delta ingestion, bucketed prediction, hooks.

Mirrors serving/processor test coverage (model_session_test.cc,
feature_store paths) at the Python surface.
"""

import os
import time

import jax
import numpy as np
import optax
import pytest

from deeprec_tpu.data.synthetic import SyntheticCriteo
from deeprec_tpu.models import base
from deeprec_tpu import config as cfg
from deeprec_tpu.optimizers import sparse
from deeprec_tpu.serve.processor import Processor
from deeprec_tpu.train import saver
from deeprec_tpu.train.hooks import CheckpointSaverHook, LoggingHook
from deeprec_tpu.train.loop import Trainer
from tests.test_train_e2e import tiny_model


def _train_and_save(tmp_path, steps=6, incr=False):
    model = tiny_model(n_cols=2)
    opt = cfg.EmbeddingVariableOption(record_touched=True) if incr else None
    tables = base.make_tables(model, option=opt)
    tr = Trainer(model=model, tables=tables,
                 sparse_optimizer=sparse.adagrad(lr=0.05),
                 dense_tx=optax.adagrad(0.05))
    state = tr.init_state(jax.random.PRNGKey(0))
    gen = SyntheticCriteo(batch_size=128, num_ids_per_col=300, seed=1)
    it = iter(gen)
    for _ in range(steps):
        state, _ = tr.train_step(state, next(it))
    saver.save_checkpoint(str(tmp_path), state)
    return model, tr, state, it


def test_processor_lifecycle_and_predict(tmp_path):
    model, tr, state, it = _train_and_save(tmp_path)
    p = Processor(model, {"session_num": 1, "bucket_sizes": [32, 128],
                          "warmup": False})
    p.initialize(str(tmp_path))
    info = p.get_serving_model_info()
    assert info["version"].startswith("step_")

    b = next(it)
    scores = p.predict({"dense": b["dense"][:50],
                        "cat": {k: v[:50] for k, v in b["cat"].items()}})
    assert scores.shape == (50,)
    assert np.all((scores >= 0) & (scores <= 1))
    # parity with the trainer's own eval on the same rows
    logits, _ = tr.eval_step(state, b)
    want = 1 / (1 + np.exp(-np.asarray(logits[:50], np.float64)))
    np.testing.assert_allclose(scores, want, rtol=1e-4, atol=1e-5)
    p.shutdown()


def test_processor_async_sessions(tmp_path):
    model, tr, state, it = _train_and_save(tmp_path)
    p = Processor(model, {"session_num": 3, "bucket_sizes": [64],
                          "warmup": False})
    p.initialize(str(tmp_path))
    b = next(it)
    req = {"dense": b["dense"][:10], "cat": {k: v[:10] for k, v in b["cat"].items()}}
    queues = [p.process(req) for _ in range(8)]
    results = [q.get(timeout=30) for q in queues]
    for r in results:
        assert not isinstance(r, Exception)
        assert r.shape == (10,)
    p.shutdown()


def test_delta_ingestion_updates_scores(tmp_path):
    """The full online-update loop: train → full ckpt → serve → train more →
    incremental delta → poller ingests → scores change to match."""

    model = tiny_model(n_cols=2)
    opt = cfg.EmbeddingVariableOption(record_touched=True)
    tables = base.make_tables(model, option=opt)
    tr = Trainer(model=model, tables=tables,
                 sparse_optimizer=sparse.adagrad(lr=0.5),
                 dense_tx=optax.set_to_zero())  # frozen dense: deltas carry all change
    state = tr.init_state(jax.random.PRNGKey(0))
    gen = SyntheticCriteo(batch_size=128, num_ids_per_col=100, seed=1)
    it = iter(gen)
    for _ in range(3):
        state, _ = tr.train_step(state, next(it))
    saver.save_checkpoint(str(tmp_path), state)

    p = Processor(model, {"session_num": 1, "bucket_sizes": [128],
                          "warmup": False, "version_poll_secs": 0.2})
    p.initialize(str(tmp_path))
    probe = next(it)
    req = {"dense": probe["dense"], "cat": probe["cat"]}
    before = p.predict(req)

    # continue training (sparse-only so the delta captures everything),
    # dump an incremental delta via the hook
    hook = CheckpointSaverHook(str(tmp_path), incremental_save_secs=0.0)
    for _ in range(5):
        state, m = tr.train_step(state, next(it))
    state = hook._save_incr(state, int(state.step))

    # poller should pick it up
    deadline = time.time() + 15
    while time.time() < deadline:
        if p.get_serving_model_info()["deltas_applied"]:
            break
        time.sleep(0.2)
    assert p.get_serving_model_info()["deltas_applied"], "delta not ingested"
    after = p.predict(req)
    assert not np.allclose(before, after), "scores unchanged after delta"
    # parity with the live trainer state
    logits, _ = tr.eval_step(state, probe)
    want = 1 / (1 + np.exp(-np.asarray(logits, np.float64)))
    np.testing.assert_allclose(after, want, rtol=1e-4, atol=1e-5)
    p.shutdown()


def test_checkpoint_hook_cadence(tmp_path):
    model = tiny_model(n_cols=2)
    tables = base.make_tables(
        model, option=cfg.EmbeddingVariableOption(record_touched=True))
    tr = Trainer(model=model, tables=tables,
                 sparse_optimizer=sparse.adagrad(lr=0.05),
                 dense_tx=optax.adagrad(0.05))
    state = tr.init_state(jax.random.PRNGKey(0))
    gen = SyntheticCriteo(batch_size=64, num_ids_per_col=200, seed=2)
    hook = CheckpointSaverHook(str(tmp_path), save_steps=4)
    state = tr.fit(state, iter(gen), steps=9, log_every=0, hooks=[hook])
    entries = sorted(os.listdir(str(tmp_path)))
    assert "step_4" in entries and "step_8" in entries and "step_9" in entries


def test_http_server_roundtrip(tmp_path):
    """JSON-over-HTTP surface: /v1/model and /v1/predict."""

    import json
    import urllib.request

    from deeprec_tpu.serve.http_server import ServingServer

    model, tr, state, it = _train_and_save(tmp_path)
    p = Processor(model, {"session_num": 1, "bucket_sizes": [32],
                          "warmup": False})
    p.initialize(str(tmp_path))
    srv = ServingServer(p, port=0).start()
    try:
        base_url = f"http://127.0.0.1:{srv.port}"
        info = json.loads(urllib.request.urlopen(
            base_url + "/v1/model", timeout=30).read())
        assert info["model"] == model.name

        b = next(it)
        payload = json.dumps({
            "dense": b["dense"][:5].tolist(),
            "cat": {k: v[:5].tolist() for k, v in b["cat"].items()},
        }).encode()
        req = urllib.request.Request(base_url + "/v1/predict", data=payload,
                                     headers={"Content-Type": "application/json"})
        out = json.loads(urllib.request.urlopen(req, timeout=60).read())
        assert len(out["scores"]) == 5
        assert all(0.0 <= s <= 1.0 for s in out["scores"])

        # probe: malformed body -> clean 400
        bad = urllib.request.Request(base_url + "/v1/predict", data=b"not json",
                                     headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(bad, timeout=30)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.stop()
        p.shutdown()
