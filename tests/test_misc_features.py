"""Tests: dense DeepRec optimizers, MicroBatch, TailStream ODL, elastic
re-scale."""

import os
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh

from deeprec_tpu.data.kafka import TailStream
from deeprec_tpu.data.synthetic import SyntheticCriteo
from deeprec_tpu.models import base
from deeprec_tpu.optimizers import dense as dense_opt
from deeprec_tpu.optimizers import sparse
from deeprec_tpu.parallel.elastic import ElasticController
from deeprec_tpu.parallel.trainer import DistributedTrainer
from deeprec_tpu.train.loop import Trainer
from tests.test_train_e2e import tiny_model


def test_dense_adagrad_decay_matches_manual():
    tx = dense_opt.adagrad_decay(learning_rate=0.1,
                                 initial_accumulator_value=0.1,
                                 accumulator_decay_step=2,
                                 accumulator_decay_rate=0.5)
    p = {"w": jnp.ones((3,))}
    s = tx.init(p)
    g = {"w": jnp.full((3,), 2.0)}
    acc = np.full(3, 0.1)
    w = np.ones(3)
    for step in range(1, 5):
        upd, s = tx.update(g, s, p)
        p = optax.apply_updates(p, upd)
        if step % 2 == 0:
            acc = np.maximum(acc * 0.5, 1e-7)
        acc = acc + 4.0
        w = w - 0.1 * 2.0 / np.sqrt(acc + 1e-10)
    np.testing.assert_allclose(np.asarray(p["w"]), w, rtol=1e-5)


def test_dense_adam_async_runs():
    tx = dense_opt.adam_async(learning_rate=0.01)
    p = {"w": jnp.ones((4,))}
    s = tx.init(p)
    for _ in range(3):
        upd, s = tx.update({"w": jnp.ones((4,))}, s, p)
        p = optax.apply_updates(p, upd)
    assert np.all(np.asarray(p["w"]) < 1.0)
    assert abs(float(s.beta1_power) - 0.9 ** 3) < 1e-6


def test_micro_batch_matches_full_batch_dense():
    """micro_batch_num=2 must match full-batch on the dense update when the
    sparse side is frozen (grad accumulation semantics)."""

    model = tiny_model(n_cols=2)
    gen = SyntheticCriteo(batch_size=128, num_ids_per_col=300, seed=1)
    batch = next(iter(gen))

    def run(m):
        tables = base.make_tables(model)
        tr = Trainer(model=model, tables=tables,
                     sparse_optimizer=sparse.sgd(0.0),
                     dense_tx=optax.sgd(0.1), micro_batch_num=m)
        state = tr.init_state(jax.random.PRNGKey(0))
        state, mtr = tr.train_step(state, batch)
        return state

    s1 = run(1)
    s2 = run(2)
    w1 = jax.tree.leaves(s1.params)
    w2 = jax.tree.leaves(s2.params)
    for a, b in zip(w1, w2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_tail_stream_odl(tmp_path):
    """Producer appends rows while the consumer trains — online learning."""

    from tests.test_data import _write_tsv

    p = str(tmp_path / "stream.tsv")
    _write_tsv(p, 300, seed=1)

    def producer():
        time.sleep(0.3)
        with open(p, "a") as f:
            for i in range(300):
                f.write("1\t" + "\t".join(["1"] * 13) + "\t"
                        + "\t".join(["ab"] * 26) + "\n")

    t = threading.Thread(target=producer)
    t.start()
    got = 0
    for b in TailStream(p, batch_size=128, stop_after_idle_secs=1.0):
        got += len(b["label"])
    t.join()
    assert got >= 512  # 600 rows -> 4 full batches


def test_elastic_rescale_8_to_4():
    model = tiny_model(n_cols=2)

    def make_trainer(mesh):
        return DistributedTrainer(
            model=model, mesh=mesh,
            sparse_optimizer=sparse.adagrad(lr=0.05),
            dense_tx=optax.adagrad(0.05), per_shard_capacity=2 ** 10)

    mesh8 = Mesh(np.asarray(jax.devices()), ("data",))
    tr = make_trainer(mesh8)
    state = tr.init_state(jax.random.PRNGKey(0))
    gen = SyntheticCriteo(batch_size=256, num_ids_per_col=500, seed=3)
    it = iter(gen)
    for _ in range(4):
        state, _ = tr.train_step(state, next(it))

    ctl = ElasticController(make_trainer=make_trainer)
    assert ctl.is_ready_scaling(tr, state)
    ctl.ready_to_update(4)
    tr2, state2 = ctl.update(tr, state)
    assert tr2.num_shards == 4
    # default path is device-to-device via host RAM: no checkpoint cut
    assert os.listdir(ctl.ckpt_dir) == []
    # predictions preserved across the re-scale
    b = next(it)
    l1, _ = tr.eval_step(state, b)
    l2, _ = tr2.eval_step(state2, b)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1),
                               rtol=1e-4, atol=1e-5)
    # continues training on the smaller mesh
    state2, m2 = tr2.train_step(state2, next(it))
    assert np.isfinite(float(m2["loss"]))

    # grow back 4 -> 8 in memory; still bit-consistent
    ctl.ready_to_update(8)
    tr3, state3 = ctl.update(tr2, state2)
    assert tr3.num_shards == 8
    b2 = next(it)
    l2b, _ = tr2.eval_step(state2, b2)
    l3, _ = tr3.eval_step(state3, b2)
    np.testing.assert_allclose(np.asarray(l3), np.asarray(l2b),
                               rtol=1e-4, atol=1e-5)

    # via_disk=True cuts a recovery checkpoint and matches too
    ctl_disk = ElasticController(make_trainer=make_trainer, via_disk=True)
    ctl_disk.ready_to_update(4)
    tr4, state4 = ctl_disk.update(tr3, state3)
    assert any(f.startswith("step_") for f in os.listdir(ctl_disk.ckpt_dir))
    l4, _ = tr4.eval_step(state4, b2)
    np.testing.assert_allclose(np.asarray(l4), np.asarray(l3),
                               rtol=1e-4, atol=1e-5)


def test_bf16_table_storage():
    """bf16 value storage (HBM halving) trains and reads back finite."""

    import jax.numpy as jnp
    from deeprec_tpu.embedding import table as ev

    t = ev.create("t", dim=8, capacity=128, value_dtype=jnp.bfloat16)
    o = sparse.adagrad(lr=0.1)
    t = o.init(t)
    ids = jnp.arange(10, dtype=jnp.int32)
    t, lk = ev.lookup_phase(t, ids, step=0)
    t = o.apply(t, lk, jnp.ones((lk.uids.shape[0], 8)), step=0)
    emb = ev.lookup(t, ids)
    assert t.values.dtype == jnp.bfloat16
    assert bool(jnp.all(jnp.isfinite(emb.astype(jnp.float32))))


def test_feature_stores():
    import jax.numpy as jnp
    from deeprec_tpu.embedding import table as ev
    from deeprec_tpu.serve.feature_store import (MemoryFeatureStore,
                                                 RedisFeatureStore)

    t = ev.create("t", dim=4, capacity=64)
    t, _ = ev.lookup_phase(t, jnp.arange(5, dtype=jnp.int32))
    fs = MemoryFeatureStore({"t": t})
    rows, found = fs.lookup("t", np.array([0, 99], np.int32))
    assert rows.shape == (2, 4)
    assert found.tolist() == [True, False]


def test_redis_feature_store_roundtrip():
    """RedisFeatureStore over the stdlib RESP client against an in-process
    RESP server — publish a table, mixed-hit lookup, found mask correct."""
    from deeprec_tpu.serve.feature_store import RedisFeatureStore
    from deeprec_tpu.serve.resp import MiniRedisServer

    srv = MiniRedisServer().start()
    try:
        fs = RedisFeatureStore(url=srv.url, prefix="ev")
        keys = np.arange(100, dtype=np.int64)
        rows = np.random.default_rng(0).normal(size=(100, 8)).astype(np.float32)
        fs.publish_table("user", keys, rows)
        got, found = fs.lookup("user", np.array([3, 999, 77], np.int64), dim=8)
        assert found.tolist() == [True, False, True]
        np.testing.assert_array_equal(got[0], rows[3])
        np.testing.assert_array_equal(got[2], rows[77])
        assert np.all(got[1] == 0)
        # second table under the same prefix does not collide
        fs.publish_table("item", keys[:5], rows[:5] + 1)
        got2, f2 = fs.lookup("item", np.array([3], np.int64), dim=8)
        assert f2[0] and np.allclose(got2[0], rows[3] + 1)
        fs.close()
    finally:
        srv.stop()


def test_kafka_stream_with_fake_broker():
    """KafkaStream's real poll/parse/batch loop over the in-memory broker."""
    from deeprec_tpu.data.kafka import FakeKafkaBroker, KafkaStream
    from deeprec_tpu.data.synthetic import SyntheticCriteo

    gen = SyntheticCriteo(batch_size=64, num_ids_per_col=50, seed=3)
    broker = FakeKafkaBroker()
    # producer: 10 messages of 16 criteo TSV rows each = 160 rows
    it = iter(gen)
    total_rows = []
    for _ in range(10):
        b = next(it)
        lines = []
        for r in range(16):
            cols = ([str(int(b["label"][r]))]
                    + [f"{x:.4f}" for x in np.asarray(b["dense"][r])]
                    + [format(int(v[r]) & 0xFFFFFFFF, "x")
                       for v in b["cat"].values()])
            lines.append("\t".join(cols))
            total_rows.append(int(b["label"][r]))
        broker.produce("clicks", "\n".join(lines).encode())

    stream = KafkaStream(topics=["clicks"], batch_size=50,
                         consumer_factory=broker.consumer,
                         max_empty_polls=3, poll_timeout=0)
    batches = list(stream)
    assert len(batches) == 3  # 160 rows -> 3 full batches of 50
    for b in batches:
        assert b["label"].shape == (50,)
        assert b["dense"].shape[0] == 50
        assert all(v.shape[0] == 50 for v in b["cat"].values())


# ---------------------------------------------------------------------------
# Delayed-gradient (bounded staleness) mode — the async-PS / async-embedding
# -stage capability (config.proto:328).


def _stale_trainer(model, k):
    tables = base.make_tables(model)
    return Trainer(model=model, tables=tables,
                   sparse_optimizer=sparse.adagrad(lr=0.05),
                   dense_tx=optax.adagrad(0.05), staleness=k)


def test_staleness_delays_sparse_apply_by_k():
    """With staleness=k and a constant batch + frozen dense params, the
    sparse update landing at step k+1 is exactly the gradient computed at
    step 0 (delayed-apply semantics; lookup-time inserts are unaffected)."""

    model = tiny_model(n_cols=2)
    gen = SyntheticCriteo(batch_size=64, num_ids_per_col=100, seed=3)
    batch = next(iter(gen))

    def run(k, steps, lr=0.05):
        tables = base.make_tables(model)
        tr = Trainer(model=model, tables=tables,
                     sparse_optimizer=sparse.adagrad(lr=lr),
                     dense_tx=optax.sgd(0.0), staleness=k)
        state = tr.init_state(jax.random.PRNGKey(0))
        for _ in range(steps):
            state, _ = tr.train_step(state, batch)
        return state

    # within the first k steps nothing is applied: values equal a run whose
    # apply is a no-op (inserts + default-value init still happen)
    s_stale = run(k=2, steps=2)
    s_noop = run(k=0, steps=2, lr=0.0)
    for n in s_stale.tables:
        np.testing.assert_allclose(np.asarray(s_stale.tables[n].values),
                                   np.asarray(s_noop.tables[n].values))
    # at step k+1 exactly the step-0 gradient lands: both runs computed it
    # against the freshly-initialized table, so values match a 1-step sync run
    s_stale = run(k=2, steps=3)
    s_sync1 = run(k=0, steps=1)
    for n in s_stale.tables:
        np.testing.assert_allclose(np.asarray(s_stale.tables[n].values),
                                   np.asarray(s_sync1.tables[n].values),
                                   rtol=1e-5, atol=1e-6)


def test_staleness_still_learns():
    model = tiny_model(n_cols=2)
    tr = _stale_trainer(model, k=2)
    state = tr.init_state(jax.random.PRNGKey(0))
    gen = SyntheticCriteo(batch_size=512, num_ids_per_col=2000, seed=1)
    state = tr.fit(state, iter(gen), steps=120, log_every=0)
    eval_gen = SyntheticCriteo(batch_size=512, num_ids_per_col=2000, seed=99)
    m = tr.evaluate(state, iter(eval_gen), steps=8)
    assert m["auc"] > 0.60, f"stale training AUC too low: {m}"


def test_staleness_survives_growth():
    """maybe_grow drops the in-flight window and the loop re-primes."""

    model = tiny_model(n_cols=2)
    tables = base.make_tables(model)
    tr = Trainer(model=model, tables=tables,
                 sparse_optimizer=sparse.adagrad(lr=0.05),
                 dense_tx=optax.adagrad(0.05), staleness=1)
    state = tr.init_state(jax.random.PRNGKey(0))
    gen = SyntheticCriteo(batch_size=256, num_ids_per_col=5000, seed=2)
    state = tr.fit(state, iter(gen), steps=30, grow_every=5, log_every=0)
    assert int(state.step) == 30


def test_elastic_service_http_endpoint():
    """External-controller surface: stage a rescale over HTTP, host loop
    applies it between steps (ElasticGrpcServer / elastic_training.proto
    role)."""

    import json
    import urllib.request

    from deeprec_tpu.parallel.elastic import ElasticController, ElasticService

    model = tiny_model(n_cols=2)

    def make_trainer(mesh):
        return DistributedTrainer(
            model=model, mesh=mesh,
            sparse_optimizer=sparse.adagrad(lr=0.05),
            dense_tx=optax.adagrad(0.05), per_shard_capacity=2 ** 10)

    mesh8 = Mesh(np.asarray(jax.devices()), ("data",))
    tr = make_trainer(mesh8)
    state = tr.init_state(jax.random.PRNGKey(0))
    gen = SyntheticCriteo(batch_size=256, num_ids_per_col=500, seed=3)
    it = iter(gen)
    state, _ = tr.train_step(state, next(it))

    svc = ElasticService(ElasticController(make_trainer=make_trainer))
    try:
        base_url = f"http://127.0.0.1:{svc.port}/elastic/v1"

        def post(path, payload):
            req = urllib.request.Request(
                f"{base_url}/{path}", data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req) as r:
                return json.loads(r.read())

        # not ready until the host loop reports a consistent state
        assert post("is_ready_scaling", {})["code"] == "NOT_READY"
        svc.report(tr, state)
        assert post("is_ready_scaling", {})["code"] == "OK"

        # nothing staged: maybe_update is a no-op
        tr2, state2 = svc.maybe_update(tr, state)
        assert tr2 is tr

        assert post("ready_to_update", {"num_devices": 4})["code"] == "OK"
        with urllib.request.urlopen(f"{base_url}/status") as r:
            st = json.loads(r.read())
        assert st["pending"] == 4 and st["num_shards"] == 8

        tr2, state2 = svc.maybe_update(tr, state)
        assert tr2.num_shards == 4
        with urllib.request.urlopen(f"{base_url}/status") as r:
            assert json.loads(r.read())["num_shards"] == 4

        # predictions preserved across the HTTP-driven rescale
        b = next(it)
        l1, _ = tr.eval_step(state, b)
        l2, _ = tr2.eval_step(state2, b)
        np.testing.assert_allclose(np.asarray(l2), np.asarray(l1),
                                   rtol=1e-4, atol=1e-5)

        # over-subscription rejected with 400
        req = urllib.request.Request(
            f"{base_url}/ready_to_update",
            data=json.dumps({"num_devices": 64}).encode())
        try:
            urllib.request.urlopen(req)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        svc.close()


def test_cluster_redis_feature_store():
    """ClusterRedis (redis_feature_store.h:85): CRC16 slot routing over a
    3-node in-process cluster, MOVED redirect recovery, per-node MGET
    grouping — the feature-store surface is identical to single-node."""
    from deeprec_tpu.serve.feature_store import RedisFeatureStore
    from deeprec_tpu.serve.resp import (ClusterRespClient, MiniRedisCluster,
                                        key_slot)

    cluster = MiniRedisCluster(n_nodes=3).start()
    try:
        fs = RedisFeatureStore(url=cluster.url, prefix="ev", cluster=True)
        keys = np.arange(200, dtype=np.int64)
        rows = np.random.default_rng(1).normal(size=(200, 8)).astype(np.float32)
        fs.publish_table("user", keys, rows)
        # keys actually spread over all 3 nodes
        per_node = [len(n._data) for n in cluster.nodes]
        assert all(c > 0 for c in per_node), per_node
        probe = np.array([3, 999, 77, 150, 42], np.int64)
        got, found = fs.lookup("user", probe, dim=8)
        assert found.tolist() == [True, False, True, True, True]
        np.testing.assert_array_equal(got[0], rows[3])
        np.testing.assert_array_equal(got[3], rows[150])
        fs.close()

        # MOVED redirect: a client with a deliberately stale slot map
        c = ClusterRespClient(cluster.seeds)
        k = "ev:user:3"
        wrong = [n for i, n in enumerate(cluster.nodes)
                 if (n._slot_range[0] <= key_slot(k) <= n._slot_range[1])
                 is False][0]
        c._slot_map[key_slot(k)] = (wrong.host, wrong.port)
        assert c.get(k) is not None  # follows -MOVED and self-corrects
        assert c._slot_map[key_slot(k)] != (wrong.host, wrong.port)
        c.close()
    finally:
        cluster.stop()


def test_key_slot_reference_vectors():
    """CRC16/keyslot agree with redis-cli published values."""
    from deeprec_tpu.serve.resp import crc16, key_slot

    # CRC16-CCITT (XMODEM) reference vector ("123456789" -> 0x31C3) is the
    # one the Redis Cluster spec cites; hash tags route by the tag only.
    assert crc16(b"123456789") == 0x31C3
    assert key_slot("foo") == 12182          # redis-cli CLUSTER KEYSLOT foo
    assert key_slot("{foo}bar") == 12182     # hash tag
    assert key_slot("") == 0

def test_kafka_jumbo_message_and_trailing_newlines():
    """Round-4 review fixes: one jumbo message carrying several batches
    drains them ALL (the old loop parsed only on message arrival and
    stalled), and newline-terminated producer values do not inject
    phantom all-missing rows."""

    from deeprec_tpu.data.kafka import FakeKafkaBroker, KafkaStream
    from deeprec_tpu.data.synthetic import SyntheticCriteo

    gen = SyntheticCriteo(batch_size=96, num_ids_per_col=50, seed=5)
    b = next(iter(gen))
    lines = []
    for r in range(96):
        cols = ([str(int(b["label"][r]))]
                + [f"{x:.4f}" for x in np.asarray(b["dense"][r])]
                + [format(int(v[r]) & 0xFFFFFFFF, "x")
                   for v in b["cat"].values()])
        lines.append("\t".join(cols))
    broker = FakeKafkaBroker()
    # ONE message holding 3 full batches, already newline-terminated
    broker.produce("clicks", ("\n".join(lines) + "\n").encode())

    stream = KafkaStream(topics=["clicks"], batch_size=32,
                         consumer_factory=broker.consumer,
                         max_empty_polls=3, poll_timeout=0)
    batches = list(stream)
    assert len(batches) == 3
    got_labels = np.concatenate([bb["label"] for bb in batches])
    np.testing.assert_array_equal(got_labels, b["label"])  # no phantom rows


# ---------------------------------------------------------------------------
# Fail-fast HBM budgeting (round-5 verdict #8)


def test_budget_growth_peak_fails_fast():
    """Insert pressure that wants a 2x rebuild must raise a clear
    MemoryBudgetError when the rebuild PEAK (old + new resident) exceeds
    budget_bytes — not OOM mid-rebuild."""

    from deeprec_tpu.utils.budget import MemoryBudgetError, table_state_bytes

    model = tiny_model(n_cols=2)
    tables = base.make_tables(model, capacity=256)
    tr = Trainer(model=model, tables=tables,
                 sparse_optimizer=sparse.adagrad(lr=0.05),
                 dense_tx=optax.adagrad(0.05),
                 budget_bytes=sum(
                     table_state_bytes(t) for t in tables.values()) + 1024)
    state = tr.init_state(jax.random.PRNGKey(0))
    it = iter(SyntheticCriteo(batch_size=256, num_ids_per_col=5000, seed=1))
    with pytest.raises(MemoryBudgetError, match="rebuild|grow"):
        for _ in range(8):
            state, _ = tr.train_step(state, next(it))
            state = tr.maybe_grow(state)

    # a generous budget trains through the same pressure without raising
    tables2 = base.make_tables(model, capacity=256)
    tr2 = Trainer(model=model, tables=tables2,
                  sparse_optimizer=sparse.adagrad(lr=0.05),
                  dense_tx=optax.adagrad(0.05), budget_bytes=1 << 30)
    s2 = tr2.init_state(jax.random.PRNGKey(0))
    it = iter(SyntheticCriteo(batch_size=256, num_ids_per_col=5000, seed=1))
    for _ in range(8):
        s2, _ = tr2.train_step(s2, next(it))
        s2 = tr2.maybe_grow(s2)
    assert any(t.capacity > 256 for t in s2.tables.values())


def test_budget_staleness_fifo_fails_fast_before_allocation():
    """The FIFO budget check fires at priming time, BEFORE any FIFO buffer
    is allocated, and names the staleness knob in the error."""

    from deeprec_tpu.utils.budget import MemoryBudgetError, tables_state_bytes

    model = tiny_model(n_cols=2)
    tables = base.make_tables(model)
    tr = Trainer(model=model, tables=tables,
                 sparse_optimizer=sparse.adagrad(lr=0.05),
                 dense_tx=optax.adagrad(0.05), staleness=2,
                 budget_bytes=tables_state_bytes(tables) + 64)
    state = tr.init_state(jax.random.PRNGKey(0))
    b = next(iter(SyntheticCriteo(batch_size=4096, num_ids_per_col=500,
                                  seed=1)))
    with pytest.raises(MemoryBudgetError, match="staleness"):
        tr.train_step(state, b)


def test_budget_distributed_growth_and_fifo():
    """Same two checks on the sharded trainer (per-DEVICE accounting)."""

    from deeprec_tpu.utils.budget import MemoryBudgetError

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    model = tiny_model(n_cols=2)

    def make(**kw):
        return DistributedTrainer(model=model, mesh=mesh,
                                  sparse_optimizer=sparse.adagrad(lr=0.05),
                                  dense_tx=optax.adagrad(0.05),
                                  per_shard_capacity=256, **kw)

    tr = make(budget_bytes=200_000)
    state = tr.init_state(jax.random.PRNGKey(0))
    it = iter(SyntheticCriteo(batch_size=512, num_ids_per_col=50_000, seed=1))
    with pytest.raises(MemoryBudgetError, match="grow"):
        for _ in range(10):
            state, _ = tr.train_step(state, next(it))
            state = tr.maybe_grow(state)

    tr2 = make(budget_bytes=300_000, staleness=2)
    s2 = tr2.init_state(jax.random.PRNGKey(0))
    b = next(iter(SyntheticCriteo(batch_size=4096, num_ids_per_col=500,
                                  seed=1)))
    with pytest.raises(MemoryBudgetError, match="staleness"):
        tr2.train_step(s2, b)


def test_budget_growth_check_counts_resident_fifo():
    """Round-5 review: the growth-peak check must count the resident
    staleness FIFO — a budget that fits tables+new-copy but not
    tables+FIFO+new-copy must still raise, and maybe_grow must feed the
    live pending bytes into the check."""

    from deeprec_tpu.utils import budget as B

    model = tiny_model(n_cols=2)
    tables = base.make_tables(model, capacity=256)
    name = next(iter(tables))
    now = B.tables_state_bytes(tables)
    new = B.table_state_bytes(tables[name], 512)
    fifo = 2 * sum(B.fifo_entry_bytes(t, 2048) for t in tables.values())
    tight = now + new + fifo // 2  # fits without the FIFO, not with it
    B.check_growth(tables, name, 512, tight)  # no FIFO: passes
    with pytest.raises(B.MemoryBudgetError, match="FIFO|intermediate"):
        B.check_growth(tables, name, 512, tight, extra_bytes=fifo)

    # integration: a staleness trainer under growth pressure routes its
    # LIVE pending bytes into the check
    seen = []
    real = B.check_growth

    def spy(tabs, n, cap, bb, extra_bytes=0):
        seen.append(extra_bytes)
        return real(tabs, n, cap, bb, extra_bytes=extra_bytes)

    import unittest.mock as mock

    tr = Trainer(model=model, tables=base.make_tables(model, capacity=256),
                 sparse_optimizer=sparse.adagrad(lr=0.05),
                 dense_tx=optax.adagrad(0.05), staleness=2,
                 budget_bytes=1 << 30)
    state = tr.init_state(jax.random.PRNGKey(0))
    it = iter(SyntheticCriteo(batch_size=2048, num_ids_per_col=5000, seed=1))
    with mock.patch.object(B, "check_growth", side_effect=spy):
        for _ in range(3):
            state, _ = tr.train_step(state, next(it))
            state = tr.maybe_grow(state)
    assert seen and max(seen) > 0  # pending bytes reached the check
