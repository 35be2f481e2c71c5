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


# ---------------------------------------------------------------------------
# Serving depth (round 2): self-describing restore, multi-model, model
# store, session policies, tiered (bounded-HBM) serving.


def test_from_saved_self_describing(tmp_path):
    """Processor built from the artifact alone: model_meta.json carries the
    registry model name + exact table schema (SavedModel+config role)."""

    from deeprec_tpu.models import get_model

    model = get_model("wdl")
    tr = Trainer(model=model, tables=base.make_tables(model, capacity=2 ** 12),
                 sparse_optimizer=sparse.adagrad(lr=0.05),
                 dense_tx=optax.adagrad(0.05))
    state = tr.init_state(jax.random.PRNGKey(0))
    gen = SyntheticCriteo(batch_size=128, num_ids_per_col=300, seed=1)
    it = iter(gen)
    for _ in range(4):
        state, _ = tr.train_step(state, next(it))
    saver.save_checkpoint(str(tmp_path), state, model_name="wdl")

    p = Processor.from_saved(str(tmp_path),
                             config={"warmup": False, "session_num": 1})
    b = next(it)
    scores = p.predict({"dense": b["dense"][:20],
                        "cat": {k: v[:20] for k, v in b["cat"].items()}})
    logits, _ = tr.eval_step(state, b)
    want = 1 / (1 + np.exp(-np.asarray(logits[:20], np.float64)))
    np.testing.assert_allclose(scores, want, rtol=1e-4, atol=1e-5)
    p.shutdown()


def test_from_saved_requires_name_or_model(tmp_path):
    model, tr, state, it = _train_and_save(tmp_path)  # no model_name
    with pytest.raises(ValueError):
        Processor.from_saved(str(tmp_path))
    # explicit model still works, schema comes from model_meta.json
    p = Processor.from_saved(str(tmp_path), model=model,
                             config={"warmup": False})
    b = next(it)
    s = p.predict({"dense": b["dense"][:8],
                   "cat": {k: v[:8] for k, v in b["cat"].items()}})
    assert s.shape == (8,)
    p.shutdown()


def test_multi_model_http(tmp_path):
    """Two models behind one frontend: /v1/models + routed predicts."""

    import json as _json
    import urllib.request

    from deeprec_tpu.serve.http_server import ServingServer
    from deeprec_tpu.serve.multi import ModelManager

    model_a, tr_a, state_a, it = _train_and_save(tmp_path / "a")
    model_b, tr_b, state_b, _ = _train_and_save(tmp_path / "b", steps=3)
    mgr = ModelManager()
    mgr.add("ctr", Processor.from_saved(str(tmp_path / "a"), model=model_a,
                                        config={"warmup": False}))
    mgr.add("cvr", Processor.from_saved(str(tmp_path / "b"), model=model_b,
                                        config={"warmup": False}))
    srv = ServingServer(mgr).start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/v1/models") as r:
            info = _json.load(r)
        assert set(info) == {"ctr", "cvr"}
        b = next(it)
        payload = _json.dumps({
            "dense": b["dense"][:4].tolist(),
            "cat": {k: v[:4].tolist() for k, v in b["cat"].items()},
        }).encode()
        scores = {}
        for name in ("ctr", "cvr"):
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}/v1/models/{name}:predict",
                data=payload, headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req) as r:
                scores[name] = _json.load(r)["scores"]
        assert len(scores["ctr"]) == 4
        # distinct checkpoints -> distinct scores
        assert not np.allclose(scores["ctr"], scores["cvr"])
        # unknown model -> 404
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/models/nope:predict",
            data=payload)
        try:
            urllib.request.urlopen(req)
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.stop()
        mgr.shutdown()


def test_mirrored_model_store(tmp_path):
    """The OSS/HDFS-pull mechanism: new versions + deltas mirrored into the
    local cache, marker published last."""

    from deeprec_tpu.serve.model_store import MirroredModelStore

    src, cache = tmp_path / "remote", tmp_path / "cache"
    model, tr, state, it = _train_and_save(src)
    store = MirroredModelStore(str(src), str(cache), poll_secs=0.2)
    assert store.sync() is True
    p = Processor.from_saved(str(cache), model=model,
                             config={"warmup": False})
    assert p.get_serving_model_info()["version"].startswith("step_")

    # publish a delta upstream; sync mirrors it
    os.makedirs(src / "incr_99")
    with open(src / "incr_99" / "meta.json", "w") as f:
        f.write('{"step": 99, "tables": {}}')
    with open(src / "incr_99" / "DONE", "w") as f:
        f.write("99")
    assert store.sync() is True
    assert os.path.exists(cache / "incr_99" / "DONE")
    assert store.sync() is False  # idempotent
    p.shutdown()
    store.stop()


def test_session_policies_and_warmup_file(tmp_path):
    model, tr, state, it = _train_and_save(tmp_path)
    b = next(it)
    req = {"dense": b["dense"][:6],
           "cat": {k: v[:6] for k, v in b["cat"].items()}}
    wf = tmp_path / "warmup.jsonl"
    import json as _json

    with open(wf, "w") as f:
        f.write(_json.dumps({"dense": req["dense"].tolist(),
                             "cat": {k: v.tolist()
                                     for k, v in req["cat"].items()}}) + "\n")
    p = Processor(model, {"session_num": 2, "warmup": False,
                          "warmup_file_name": str(wf),
                          "select_session_policy": "round_robin"})
    p.initialize(str(tmp_path))
    qs = [p.process(req) for _ in range(6)]
    res = [q.get(timeout=30) for q in qs]
    for r in res:
        assert not isinstance(r, Exception) and r.shape == (6,)
    info = p.get_serving_model_info()
    assert info["select_session_policy"] == "round_robin"
    p.shutdown()


def test_ev_storage_tiered_serving(tmp_path):
    """Bounded-HBM serving: a checkpoint with a cold tier restores into a
    serving-side TieredTable; cold ids score identically via read-through."""

    from deeprec_tpu.embedding import table as ev
    from deeprec_tpu.embedding.tiered import TieredTable

    model = tiny_model(n_cols=2, emb_dim=4)
    tables = {n: ev.create(n, t.dim, option=t.option, capacity=256)
              for n, t in base.make_tables(model).items()}
    o = sparse.adagrad(lr=0.05)
    tables = {n: o.init(t) for n, t in tables.items()}
    tiers = {n: TieredTable(t, evict_fraction=0.5, hot_watermark=0.5)
             for n, t in tables.items()}
    tr = Trainer(model=model, tables=tables, sparse_optimizer=o,
                 dense_tx=optax.adagrad(0.05), tiers=tiers)
    state = tr.init_state(jax.random.PRNGKey(0))
    batches = [next(iter(SyntheticCriteo(batch_size=128, num_ids_per_col=600,
                                         seed=s))) for s in range(1, 9)]
    for i, b in enumerate(batches):
        state, _ = tr.train_step(state, b)
        if (i + 1) % 2 == 0:
            state = tr.maybe_grow(state)  # demotion runs here under tiers
    assert any(t.cold.size > 0 for t in tiers.values())
    saver.save_checkpoint(str(tmp_path), state, tiers=tiers)

    p = Processor(model, {"warmup": False, "session_num": 1,
                          "ev_storage": {"dram_rows": -1}})
    p.initialize(str(tmp_path))
    for b in batches[:3]:
        scores = p.predict({"dense": b["dense"], "cat": b["cat"]})
        logits, _ = tr.eval_step(state, b)
        want = 1 / (1 + np.exp(-np.asarray(logits, np.float64)))
        np.testing.assert_allclose(scores, want, rtol=1e-4, atol=1e-5)
    p.shutdown()


def test_kserve_v2_inference_protocol(tmp_path):
    """Open Inference Protocol v2 (the Triton HTTP API role): health,
    metadata, and infer round-trip matching /v1/predict scores."""

    import json
    import urllib.request

    from deeprec_tpu.serve.http_server import ServingServer

    model, tr, state, it = _train_and_save(tmp_path)
    p = Processor(model, {"session_num": 1, "bucket_sizes": [32],
                          "warmup": False})
    p.initialize(str(tmp_path))
    srv = ServingServer(p, port=0).start()
    try:
        base = f"http://127.0.0.1:{srv.port}"

        def get(path):
            return json.loads(urllib.request.urlopen(base + path,
                                                     timeout=30).read())

        get("/v2/health/live")
        get("/v2/health/ready")
        meta = get(f"/v2/models/{model.name}")
        assert meta["name"] == model.name
        in_names = {i["name"] for i in meta["inputs"]}
        assert "dense" in in_names
        assert meta["outputs"][0]["name"] == "scores"
        get(f"/v2/models/{model.name}/ready")

        b = next(it)
        n = 5
        inputs = [{"name": "dense", "datatype": "FP32",
                   "shape": [n, b["dense"].shape[1]],
                   "data": b["dense"][:n].reshape(-1).tolist()}]
        for col, v in b["cat"].items():
            inputs.append({"name": col, "datatype": "INT32",
                           "shape": list(v[:n].shape),
                           "data": v[:n].reshape(-1).tolist()})
        req = urllib.request.Request(
            f"{base}/v2/models/{model.name}/infer",
            data=json.dumps({"id": "req-1", "inputs": inputs}).encode(),
            headers={"Content-Type": "application/json"})
        out = json.loads(urllib.request.urlopen(req, timeout=60).read())
        assert out["model_name"] == model.name and out["id"] == "req-1"
        scores = out["outputs"][0]["data"]
        assert len(scores) == n

        # must match the v1 surface bit-for-bit
        v1req = urllib.request.Request(
            base + "/v1/predict",
            data=json.dumps({"dense": b["dense"][:n].tolist(),
                             "cat": {k: v[:n].tolist()
                                     for k, v in b["cat"].items()}}).encode())
        v1 = json.loads(urllib.request.urlopen(v1req, timeout=60).read())
        np.testing.assert_allclose(scores, v1["scores"], rtol=1e-6)

        # unknown model -> 404
        try:
            urllib.request.urlopen(base + "/v2/models/nope", timeout=30)
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.stop()
        p.shutdown()


def test_sharded_serving_group_bit_identical(tmp_path):
    """Cross-instance embedding sharding (graph_optimizer.h:132-147): a
    2-instance ShardedServingGroup scores bit-identically to one unsharded
    Processor, each instance holding only ~half the table rows."""

    from deeprec_tpu.serve.multi import ShardedServingGroup

    model, tr, state, it = _train_and_save(tmp_path, steps=8)
    cfgd = {"session_num": 1, "bucket_sizes": [128], "warmup": False,
            "version_poll_secs": 60.0}

    single = Processor(model, dict(cfgd))
    single.initialize(str(tmp_path))
    group = ShardedServingGroup(str(tmp_path), num_instances=2, model=model,
                                config=dict(cfgd))

    # each instance holds a strict subset of the rows
    total = {n: int(t.size) for n, t in single._state.tables.items()}
    for p in group.procs:
        for n, t in p._state.tables.items():
            assert 0 < int(t.size) < total[n]
    for n in total:
        assert sum(int(p._state.tables[n].size) for p in group.procs) \
            == total[n]

    for _ in range(3):  # rotate the fronting instance (round robin)
        b = next(it)
        req = {"dense": b["dense"][:64],
               "cat": {k: v[:64] for k, v in b["cat"].items()}}
        want = single.predict(req)
        got = group.predict(req)
        np.testing.assert_array_equal(got, want)
    single.shutdown()
    group.shutdown()


def test_sharded_serving_delta_ingestion(tmp_path):
    """Each shard instance applies only ITS slice of a delta dump."""

    from deeprec_tpu.serve.multi import ShardedServingGroup

    model, tr, state, it = _train_and_save(tmp_path, steps=6, incr=True)
    cfgd = {"session_num": 1, "bucket_sizes": [128], "warmup": False,
            "version_poll_secs": 60.0}
    group = ShardedServingGroup(str(tmp_path), num_instances=2, model=model,
                                config=dict(cfgd))
    single = Processor(model, dict(cfgd))
    single.initialize(str(tmp_path))

    # train on, dump a delta, let both ingest it
    for _ in range(4):
        state, _ = tr.train_step(state, next(it))
    import json

    d = os.path.join(str(tmp_path), "incr_10")
    os.makedirs(d)
    meta = {"tables": {}}
    tables = dict(state.tables)
    for name, t in tables.items():
        fname = f"delta_{name}.npz"
        tables[name] = saver.save_table_delta(os.path.join(d, fname), t)
        meta["tables"][name] = fname
    with open(os.path.join(d, "meta.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(d, "DONE"), "w") as f:
        f.write("ok")

    assert single._apply_new_deltas() == 1
    for p in group.procs:
        assert p._apply_new_deltas() == 1
    b = next(it)
    req = {"dense": b["dense"][:64],
           "cat": {k: v[:64] for k, v in b["cat"].items()}}
    np.testing.assert_array_equal(group.predict(req), single.predict(req))
    single.shutdown()
    group.shutdown()


def test_weighted_column_serving(tmp_path):
    """Weighted feature columns through the full serving surface (ADVICE r3):
    Processor construction with warmup=True must not crash, _v2_metadata
    must declare the weight input as FP32, and FP32-typed cat inputs must
    reach the combiner un-truncated (doubling weights doubles a SUM-combined
    linear score)."""

    import jax.numpy as jnp

    from deeprec_tpu.serve.http_server import (_v2_metadata,
                                               _v2_request_to_batch)

    spec = base.TableSpec(name="C1", dim=4, combiner=cfg.Combiner.SUM,
                          seq_len=3, multivalent=True,
                          weight_feature="C1_w", initial_capacity=2 ** 10)

    def init_params(key):
        return {"w": jax.random.normal(key, (4,), jnp.float32) * 0.1}

    def forward(params, batch, acts, train=True):
        import jax.numpy as jnp
        return jnp.sum(acts["C1"] * params["w"], axis=1)

    model = base.RecModel(name="wtiny", table_specs={"C1": spec},
                          init_params=init_params, forward=forward)
    tables = base.make_tables(model)
    tr = Trainer(model=model, tables=tables,
                 sparse_optimizer=sparse.adagrad(lr=0.05),
                 dense_tx=optax.adagrad(0.05))
    state = tr.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    b = {"dense": np.zeros((32, 0), np.float32),
         "cat": {"C1": rng.randint(0, 50, (32, 3)).astype(np.int32)},
         "weights": {"C1_w": np.ones((32, 3), np.float32)},
         "label": rng.randint(0, 2, 32).astype(np.float32)}
    for _ in range(3):
        state, _ = tr.train_step(state, b)
    saver.save_checkpoint(str(tmp_path), state)

    # warmup=True exercised the crash: fake batch must include the weight col
    p = Processor(model, {"session_num": 1, "bucket_sizes": [32],
                          "warmup": True})
    p.initialize(str(tmp_path))

    meta = _v2_metadata(p)
    by_name = {i["name"]: i for i in meta["inputs"]}
    assert by_name["C1_w"]["datatype"] == "FP32"
    assert by_name["C1"]["datatype"] == "INT32"

    # FP32 weights through the v2 decoder: no int truncation
    ids = rng.randint(0, 50, (8, 3)).astype(np.int32)
    def req(wscale):
        return {"inputs": [
            {"name": "dense", "datatype": "FP32", "shape": [8, 0],
             "data": []},
            {"name": "C1", "datatype": "INT32", "shape": [8, 3],
             "data": ids.reshape(-1).tolist()},
            {"name": "C1_w", "datatype": "FP32", "shape": [8, 3],
             "data": (wscale * np.ones(24)).tolist()},
        ]}
    batch1 = _v2_request_to_batch(req(0.5))
    assert batch1["cat"]["C1_w"].dtype == np.float32
    assert float(batch1["cat"]["C1_w"][0, 0]) == 0.5
    s1 = p.predict(batch1)
    s2 = p.predict(_v2_request_to_batch(req(1.0)))
    # SUM combine is linear in weights; sigmoid(logit) differs unless all 0
    logit1 = np.log(s1 / (1 - s1))
    logit2 = np.log(s2 / (1 - s2))
    np.testing.assert_allclose(logit2, 2.0 * logit1, rtol=1e-3, atol=1e-5)
    p.shutdown()

def test_predict_accepts_truncated_sequence_widths(tmp_path):
    """Ragged serving (round 4): a client may send behavior histories at
    their NATIVE width (e.g. [B, 5] instead of the model's padded [B, 16])
    — the engine derives sequence length from array shapes and EMPTY
    masks, so scores are bit-identical to the padded request and each
    width compiles once via jit's shape cache (the serving twin of
    data/bucketing.py's training-side length buckets)."""

    import dataclasses

    from deeprec_tpu.data.behavior import SyntheticBehavior
    from deeprec_tpu.models import get_model

    model = get_model("din")
    specs = {n: dataclasses.replace(s, seq_len=16)
             for n, s in model.table_specs.items()}
    model = dataclasses.replace(model, table_specs=specs)
    gen = SyntheticBehavior(batch_size=64, seq_len=16, num_items=2000,
                            num_categories=50, seed=1)
    tr = Trainer(model=model, tables=base.make_tables(model),
                 sparse_optimizer=sparse.adagrad(0.05),
                 dense_tx=optax.adagrad(0.05))
    state = tr.init_state(jax.random.PRNGKey(0))
    state = tr.fit(state, iter(gen), steps=15)
    saver.save_checkpoint(str(tmp_path), state)

    p = Processor(model, {"session_num": 1, "bucket_sizes": [64],
                          "warmup": False})
    p.initialize(str(tmp_path))
    rng = np.random.RandomState(3)
    b = gen.sample(rng)
    EMPTY = np.int32(np.iinfo(np.int32).min)
    for k in ("hist_item", "hist_category"):
        b["cat"][k][:, 5:] = EMPTY
    full = p.predict({"dense": b["dense"], "cat": b["cat"]})
    cat5 = dict(b["cat"])
    for k in ("hist_item", "hist_category"):
        cat5[k] = b["cat"][k][:, :5]
    short = p.predict({"dense": b["dense"], "cat": cat5})
    np.testing.assert_array_equal(np.asarray(full), np.asarray(short))
    p.shutdown()

def test_feature_store_redis_serving_mode(tmp_path):
    """Round-4 review fix: feature_store_type='redis' is WIRED — ids
    missing from the local tables are fetched from the shared Redis store
    per request (redis_feature_store.cc role), so an instance holding only
    hot rows scores identically to one holding everything."""

    import jax.numpy as jnp

    from deeprec_tpu.embedding import table as evt
    from deeprec_tpu.serve.feature_store import RedisFeatureStore
    from deeprec_tpu.serve.resp import MiniRedisServer

    model, tr, state, it = _train_and_save(tmp_path)
    full = Processor(model, {"session_num": 1, "bucket_sizes": [128],
                             "warmup": False})
    full.initialize(str(tmp_path))

    srv = MiniRedisServer().start()
    try:
        # publish EVERY table's live rows to redis, then serve from a
        # processor whose local tables had half their keys REMOVED
        fs = RedisFeatureStore(url=srv.url)
        part_dir = str(tmp_path / "partial")
        import jax as _jax

        tables = dict(state.tables)
        for name, t in tables.items():
            keys, values, _, _, live = (np.asarray(_jax.device_get(x))
                                        if x is not None else None
                                        for x in evt.export_live(t))
            live = live.astype(bool)
            fs.publish_table(name, keys[live].astype(np.int64), values[live])
            drop = keys[live][::2]          # remove every other key
            tables[name] = evt.remove(t, jnp.asarray(drop, t.key_dtype))
        saver.save_checkpoint(part_dir, state.replace(tables=tables))

        p = Processor(model, {"session_num": 1, "bucket_sizes": [128],
                              "warmup": False,
                              "feature_store_type": "redis",
                              "feature_store_url": srv.url})
        p.initialize(part_dir)
        b = next(it)
        req = {"dense": b["dense"][:64],
               "cat": {k: v[:64] for k, v in b["cat"].items()}}
        want = full.predict(req)
        got = p.predict(req)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
        fs.close()
        p.shutdown()
        full.shutdown()
    finally:
        srv.stop()


def test_poller_tolerates_non_integer_incr_entries(tmp_path):
    """Round-5 review fix: MirroredModelStore stages copies as
    'incr_N.tmp' inside the polled dir — the delta scan must skip them
    (int('7.tmp') used to crash initialize / silently kill the poller)."""

    model, tr, state, it = _train_and_save(tmp_path)
    os.makedirs(str(tmp_path / "incr_7.tmp"))
    p = Processor(model, {"session_num": 1, "bucket_sizes": [128],
                          "warmup": False})
    p.initialize(str(tmp_path))       # used to raise ValueError here
    try:
        assert p._apply_new_deltas() == 0
        b = next(it)
        scores = p.predict({"dense": b["dense"][:16],
                            "cat": {k: v[:16] for k, v in b["cat"].items()}})
        assert scores.shape == (16,)
    finally:
        p.shutdown()


def test_cast_cat_preserves_64bit_ids():
    """Round-5 review fix: int64/uint64/uint32 wire ids must not be
    truncated to int32 (models with key_dtype=int64 serve ids >= 2^31)."""

    from deeprec_tpu.serve.processor import cast_cat

    big = cast_cat(np.array([5_000_000_000], np.int64))
    assert big.dtype == np.int64 and big[0] == 5_000_000_000
    u32 = cast_cat(np.array([3_000_000_000], np.uint32))
    assert u32.dtype == np.int64 and u32[0] == 3_000_000_000
    small = cast_cat(np.array([7], np.int16))
    assert small.dtype == np.int32
    w = cast_cat(np.array([0.5], np.float64))
    assert w.dtype == np.float32


def test_feature_store_wrong_length_value_is_missing():
    """Round-5 review fix: a stored value whose byte length does not match
    the requested dim (stale publish after a dim change) must read as
    MISSING, not raise a broadcast error inside predict."""

    from deeprec_tpu.serve.feature_store import RedisFeatureStore
    from deeprec_tpu.serve.resp import MiniRedisServer

    srv = MiniRedisServer().start()
    try:
        fs = RedisFeatureStore(url=srv.url)
        fs.publish_table("t", np.array([1, 2], np.int64),
                         np.ones((2, 4), np.float32))
        # poison key 2 with a wrong-layout value (8 floats, dim is 4)
        fs._r.set("ev:t:2", np.ones((8,), np.float32).tobytes())
        rows, found = fs.lookup("t", np.array([1, 2, 3], np.int64), dim=4)
        assert found.tolist() == [True, False, False]
        np.testing.assert_allclose(rows[0], 1.0)
        fs.close()
    finally:
        srv.stop()


def test_request_schema_shared_feature_seq_len_is_wide():
    """Round-5 review: a shared feature of a spec declaring seq_len > 1 is
    sequence-shaped on the wire even without the 'hist' name prefix; the
    spec's primary column stays scalar."""

    import dataclasses

    from deeprec_tpu.models import get_model
    from deeprec_tpu.serve.processor import request_schema

    din = get_model("din")
    schema = request_schema(din)
    assert schema["item"][1] is None            # target: scalar
    assert schema["hist_item"][1] == 30         # history: wide

    # rename the shared feature away from the 'hist' prefix: still wide
    specs = {n: (dataclasses.replace(s, shared_features=("clicks",))
                 if n == "item" else s)
             for n, s in din.table_specs.items()}
    model2 = dataclasses.replace(din, table_specs=specs)
    assert request_schema(model2)["clicks"][1] == 30
