"""Multi-tier storage tests: HBM-hot / host-cold with promote/demote cycling.

Mirrors the reference's multi-tier EV coverage (multi_tier_storage tests):
values must be bit-identical through demote→promote round trips, and training
under a tight HBM budget must match unbounded-capacity training.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from deeprec_tpu import config as cfg
from deeprec_tpu.data.native import HostKV
from deeprec_tpu.data.synthetic import SyntheticCriteo
from deeprec_tpu.embedding import table as ev
from deeprec_tpu.embedding.tiered import TieredTable
from deeprec_tpu.models import base
from deeprec_tpu.optimizers import sparse
from deeprec_tpu.train.loop import Trainer
from tests.test_train_e2e import tiny_model


def test_host_kv_roundtrip():
    kv = HostKV(row_floats=8, capacity_hint=64)
    keys = np.arange(500, dtype=np.int64)
    rows = np.random.RandomState(0).randn(500, 8).astype(np.float32)
    kv.upsert(keys, rows)
    got, _, found = kv.lookup(keys)
    assert found.all()
    np.testing.assert_array_equal(got, rows)


def test_host_kv_ssd_spill_and_compact(tmp_path):
    kv = HostKV(row_floats=4, capacity_hint=64)
    kv.enable_ssd(str(tmp_path / "log.bin"), max_dram_rows=50)
    keys = np.arange(1000, dtype=np.int64)
    rows = np.tile(np.arange(1000, dtype=np.float32)[:, None], (1, 4))
    kv.upsert(keys, rows)
    assert kv.dram_rows <= 50
    assert kv.log_bytes > 0
    got, _, found = kv.lookup(keys)
    assert found.all()
    np.testing.assert_array_equal(got, rows)
    # overwrite half -> dead log entries -> compaction reclaims
    kv.upsert(keys[:500], rows[:500])
    reclaimed = kv.compact()
    assert reclaimed >= 0
    got, _, found = kv.lookup(keys[700:900])
    assert found.all()
    np.testing.assert_array_equal(got, rows[700:900])


def test_host_kv_erase_reinsert_cycles_reclaim_tombstones():
    """The tiered training pattern — promote (lookup erase=1) then demote
    (re-upsert) every key, repeatedly.  Before tombstone accounting this
    leaked one dead slot per key cycle and eventually hung probe() in an
    unbounded loop; now erased slots are reused and rehashes purge them."""

    kv = HostKV(row_floats=4, capacity_hint=64)
    keys = np.arange(100, dtype=np.int64)
    rows = np.random.RandomState(1).randn(100, 4).astype(np.float32)
    for cycle in range(200):  # far beyond the index capacity
        kv.upsert(keys, rows)
        got, _, found = kv.lookup(keys, erase=True)
        assert found.all()
        np.testing.assert_array_equal(got, rows)
    assert kv.size == 0


def test_host_kv_extreme_keys():
    """INT64_MIN / INT64_MIN+1 used to alias the empty/tombstone sentinels;
    the explicit slot-state byte makes every int64 a legal key."""

    kv = HostKV(row_floats=2, capacity_hint=16)
    keys = np.array([np.iinfo(np.int64).min, np.iinfo(np.int64).min + 1,
                     0, -1, np.iinfo(np.int64).max], np.int64)
    rows = np.arange(10, dtype=np.float32).reshape(5, 2)
    kv.upsert(keys, rows)
    got, _, found = kv.lookup(keys)
    assert found.all()
    np.testing.assert_array_equal(got, rows)
    # erase one extreme key; the others must stay reachable
    kv.lookup(keys[:1], erase=True)
    _, _, found = kv.lookup(keys)
    assert list(found) == [False, True, True, True, True]


def test_demote_promote_roundtrip():
    t = ev.create("t", dim=4, capacity=256,
                  option=cfg.EmbeddingVariableOption())
    o = sparse.adagrad(lr=0.1)
    t = o.init(t)
    ids = jnp.arange(100, dtype=jnp.int32)
    t, lk = ev.lookup_phase(t, ids, step=1)
    t = o.apply(t, lk, jnp.ones((lk.uids.shape[0], 4)), step=1)
    before_vals = np.asarray(ev.lookup(t, ids))
    before_acc = np.asarray(t.slots["accumulator"]).copy()

    tier = TieredTable(t, evict_fraction=0.5)
    t2 = tier.demote(t)
    n_cold = tier.cold.size
    assert n_cold > 0
    assert int(t2.size) == 100 - n_cold

    # promote everything back via prepare (as the prefetch would)
    payload = tier.prepare(np.asarray(ids), t2.empty)
    assert payload is not None
    t3 = tier.promote(t2, payload)
    assert int(t3.size) == 100
    assert tier.cold.size == 0
    after_vals = np.asarray(ev.lookup(t3, ids))
    np.testing.assert_array_equal(after_vals, before_vals)
    # optimizer slots and versions survive the round trip
    f = np.asarray(ev.get_version(t3, ids))
    np.testing.assert_array_equal(f, np.full(100, 1))


def test_training_with_tight_hbm_budget_matches_unbounded():
    """Tiered training (tiny hot tier + demote/promote churn) must produce
    the same final predictions as unbounded-capacity training."""

    model = tiny_model(n_cols=2, emb_dim=4)
    gen = SyntheticCriteo(batch_size=128, num_ids_per_col=600, seed=3)
    batches = [next(iter(SyntheticCriteo(batch_size=128, num_ids_per_col=600,
                                         seed=3, steps=1)))]
    gen_it = iter(gen)
    batches = [next(gen_it) for _ in range(12)]

    def run(tiered: bool):
        tables = base.make_tables(model)
        tiers = None
        if tiered:
            # hot tier holds only 1024 rows; ~1200 keys stream through.
            # (headroom per step must cover the batch's unique ids, else
            # mid-step inserts overflow — same invariant as the reference's
            # cache capacity vs batch size)
            tables = {n: ev.create(n, t.dim, option=t.option, capacity=1024)
                      for n, t in tables.items()}
            tiers = {}
        tr = Trainer(model=model, tables=tables,
                     sparse_optimizer=sparse.adagrad(lr=0.05),
                     dense_tx=optax.adagrad(0.05), tiers=tiers)
        state = tr.init_state(jax.random.PRNGKey(0))
        if tiered:
            for n, t in state.tables.items():
                tiers[n] = TieredTable(t, evict_fraction=0.5,
                                       hot_watermark=0.7)
        for i, b in enumerate(batches):
            state, m = tr.train_step(state, b)
            state = tr.maybe_grow(state)
        logits, _ = tr.eval_step(state, batches[0])
        return np.asarray(logits), state

    want, ws = run(False)
    got, gs = run(True)
    # tiered hot tables stayed within budget
    for n, t in gs.tables.items():
        assert t.capacity == 1024
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_tiered_eval_cold_rows_read_default():
    """Eval on ids that are cold (demoted) without promotion reads the
    no-permission default — and promotion restores them."""

    t = ev.create("t", dim=4, capacity=64)
    t, lk = ev.lookup_phase(t, jnp.arange(20, dtype=jnp.int32), step=0)
    tier = TieredTable(t, evict_fraction=0.9)
    t2 = tier.demote(t)
    cold_ids = np.setdiff1d(np.arange(20),
                            np.asarray(ev.export_live(t2)[0]))
    assert len(cold_ids) > 0
    got = np.asarray(ev.lookup(t2, jnp.asarray(cold_ids, jnp.int32)))
    np.testing.assert_array_equal(got, 0.0)


def test_staged_tiered_fit_matches_inline_stepping():
    """Trainer.fit with the TierStager (promotion prepared on a background
    thread, VERDICT r1 item 4) must produce exactly the state the inline
    per-step promotion produces — including across demotions that
    invalidate staged payloads."""

    model = tiny_model(n_cols=2, emb_dim=4)
    gen_it = iter(SyntheticCriteo(batch_size=128, num_ids_per_col=600, seed=3))
    batches = [next(gen_it) for _ in range(12)]

    def run(staged: bool):
        tables = {n: ev.create(n, t.dim, option=t.option, capacity=256)
                  for n, t in base.make_tables(model).items()}
        o = sparse.adagrad(lr=0.05)
        tables = {n: o.init(t) for n, t in tables.items()}
        tiers = {n: TieredTable(t, evict_fraction=0.5, hot_watermark=0.5)
                 for n, t in tables.items()}
        tr = Trainer(model=model, tables=tables, sparse_optimizer=o,
                     dense_tx=optax.adagrad(0.05), tiers=tiers)
        state = tr.init_state(jax.random.PRNGKey(0))
        if staged:
            state = tr.fit(state, iter(batches), len(batches),
                           grow_every=3, log_every=0)
        else:
            for i, b in enumerate(batches):
                state, _ = tr.train_step(state, b)
                if (i + 1) % 3 == 0:
                    state = tr.maybe_grow(state)
        assert any(t.cold.size > 0 for t in tiers.values())
        logits, _ = tr.eval_step(state, batches[0])
        return np.asarray(logits)

    want = run(False)
    got = run(True)
    np.testing.assert_array_equal(got, want)


def test_lru_demotion_scores_by_recency_not_frequency():
    """CacheStrategy.LRU demotes least-recently-touched rows even when they
    are the most frequent; LFU demotes least-frequent (cache.h:133 vs :272)."""

    def build(strategy):
        opt = cfg.EmbeddingVariableOption(
            storage=cfg.StorageOption(cache_strategy=strategy))
        t = ev.create("t", dim=4, capacity=256, option=opt)
        o = sparse.adagrad(lr=0.1)
        t = o.init(t)
        old = jnp.arange(0, 50, dtype=jnp.int32)
        new = jnp.arange(100, 150, dtype=jnp.int32)
        # old ids: touched many times, but only at step 1 (hot by freq)
        for _ in range(5):
            t, lk = ev.lookup_phase(t, old, step=1)
            t = o.apply(t, lk, jnp.ones((lk.uids.shape[0], 4)), step=1)
        # new ids: touched once, at step 10 (recent, low freq)
        t, lk = ev.lookup_phase(t, new, step=10)
        t = o.apply(t, lk, jnp.ones((lk.uids.shape[0], 4)), step=10)
        tier = TieredTable(t, evict_fraction=50 / 256)
        t2 = tier.demote(t)
        cold_keys = set(tier.cold.export()[0].tolist())
        return cold_keys

    lru_cold = build(cfg.CacheStrategy.LRU)
    lfu_cold = build(cfg.CacheStrategy.LFU)
    # LRU evicts the stale-but-frequent old ids
    assert lru_cold and all(k < 50 for k in lru_cold), lru_cold
    # LFU evicts the recent-but-rare new ids
    assert lfu_cold and all(k >= 100 for k in lfu_cold), lfu_cold


def test_two_phase_background_demotion():
    """begin_demote snapshots victims + starts the async export; training
    touches between begin and finish disqualify a victim (its exported row
    is stale); finish_demote commits only untouched victims bit-exactly."""

    t = ev.create("t", dim=4, capacity=256,
                  option=cfg.EmbeddingVariableOption())
    o = sparse.adagrad(lr=0.1)
    t = o.init(t)
    ids = jnp.arange(100, dtype=jnp.int32)
    t, lk = ev.lookup_phase(t, ids, step=1)
    t = o.apply(t, lk, jnp.ones((lk.uids.shape[0], 4)), step=1)

    tier = TieredTable(t, evict_fraction=0.5)
    assert not tier.has_pending_demote
    tier.begin_demote(t)
    assert tier.has_pending_demote
    # second begin is a no-op while one is pending
    tier.begin_demote(t)

    # between begin and finish: training touches ids 0..9 (they may or may
    # not be in the victim set; any that are must NOT be demoted)
    touched = jnp.arange(10, dtype=jnp.int32)
    t, lk2 = ev.lookup_phase(t, touched, step=2)
    t = o.apply(t, lk2, jnp.full((10, 4), 2.0), step=2)
    touched_vals = np.asarray(ev.lookup(t, touched)).copy()

    t2 = tier.finish_demote(t)
    assert not tier.has_pending_demote
    # round 3: the cold-store upsert runs on the background lane — join
    # before inspecting the store directly (prepare() does this implicitly
    # via its read barrier)
    tier._join_inflight()
    n_cold = tier.cold.size
    assert n_cold > 0
    assert int(t2.size) == 100 - n_cold
    # every touched id is still hot with its post-touch value
    assert bool(np.asarray(ev.contains(t2, touched)).all())
    np.testing.assert_array_equal(np.asarray(ev.lookup(t2, touched)),
                                  touched_vals)
    # demoted rows promote back bit-exactly
    before = np.asarray(ev.lookup(t, ids))
    payload = tier.prepare(np.asarray(ids), t2.empty)
    t3 = tier.promote(t2, payload)
    np.testing.assert_array_equal(np.asarray(ev.lookup(t3, ids)), before)


def test_two_phase_demotion_in_trainer_loop():
    """Trainer.maybe_grow drives begin/finish across windows; tiered
    training with background demotion still learns and loses nothing."""

    import dataclasses
    import optax
    from deeprec_tpu.data.synthetic import SyntheticCriteo
    from deeprec_tpu.models import base
    from deeprec_tpu.models import wdl
    from deeprec_tpu.train.loop import Trainer

    model = wdl.MODEL
    specs = {n: dataclasses.replace(s, initial_capacity=2 ** 10)
             for n, s in model.table_specs.items()}
    model = dataclasses.replace(model, table_specs=specs)
    tables = base.make_tables(model, capacity=2 ** 10)
    tiers = {n: TieredTable(t, hot_watermark=0.5, evict_fraction=0.4)
             for n, t in ((n, sparse.adagrad(lr=0.05).init(t))
                          for n, t in tables.items())}
    tr = Trainer(model=model, tables=tables,
                 sparse_optimizer=sparse.adagrad(lr=0.05),
                 dense_tx=optax.adagrad(0.05), tiers=tiers)
    state = tr.init_state(jax.random.PRNGKey(0))
    gen = SyntheticCriteo(batch_size=128, num_ids_per_col=3000, seed=4)
    state = tr.fit(state, iter(gen), steps=60, grow_every=5, log_every=0)
    # demotions happened (cold tier populated) and training stayed sane
    assert any(t.cold.size > 0 for t in tiers.values())
    m = tr.evaluate(state, iter(SyntheticCriteo(batch_size=128,
                                                num_ids_per_col=3000,
                                                seed=9)), 4)
    assert np.isfinite(m["loss"]) and m["auc"] > 0.55, m


def test_concurrent_demotion_read_barrier():
    """finish_demote returns before the cold-store upsert lands (the
    EvictionManager-thread overlap, eviction_manager.h:39); a prepare()
    that asks for an in-flight victim blocks on the read barrier and still
    gets the row — no window where a victim is neither hot nor cold."""

    import threading
    import time as _time

    t = ev.create("t", dim=4, capacity=256,
                  option=cfg.EmbeddingVariableOption())
    o = sparse.adagrad(lr=0.1)
    t = o.init(t)
    ids = jnp.arange(100, dtype=jnp.int32)
    t, lk = ev.lookup_phase(t, ids, step=1)
    t = o.apply(t, lk, jnp.ones((lk.uids.shape[0], 4)), step=1)
    before = np.asarray(ev.lookup(t, ids)).copy()

    tier = TieredTable(t, evict_fraction=0.5)
    # stall the background lane so the upsert provably hasn't landed when
    # prepare() runs; release it shortly after from a timer thread
    gate = threading.Event()
    tier._bg.submit(gate.wait)
    tier.begin_demote(t)
    t2 = tier.finish_demote(t)
    with tier._inflight_mu:
        assert tier._inflight is not None
    assert tier.cold.size == 0          # upsert genuinely pending
    threading.Timer(0.2, gate.set).start()
    t0 = _time.time()
    payload = tier.prepare(np.asarray(ids), t2.empty)
    assert _time.time() - t0 >= 0.15    # the barrier actually waited
    assert payload is not None
    t3 = tier.promote(t2, payload)
    np.testing.assert_array_equal(np.asarray(ev.lookup(t3, ids)), before)

def test_promote_into_full_table_restores_cold_rows():
    """Round-4 review fix: prepare(erase=True) removes rows from the cold
    store BEFORE the hot insert is known to succeed.  When the hot table
    cannot take them (full), promote must put the failed rows back (and
    bump growth_hint) — previously the learned rows vanished from both
    tiers."""

    from deeprec_tpu.optimizers import sparse as sp

    # table A: 100 trained rows, demote half into the cold store
    t = ev.create("t", dim=4, capacity=256)
    t = sp.adagrad().init(t)
    ids = jnp.arange(100, dtype=jnp.int32)
    t, lk = ev.lookup_phase(t, ids, step=1)
    t = sp.adagrad(lr=0.5).apply(t, lk, jnp.ones((100, 4)), step=1)
    tier = TieredTable(t, evict_fraction=0.5)
    t = tier.demote(t)
    n_cold = tier.cold.size
    assert n_cold > 0
    cold_keys = np.array(
        [k for k in range(100)
         if not bool(ev.contains(t, jnp.array([k], jnp.int32))[0])],
        np.int64)
    want_rows = {int(k): tier.cold.lookup(np.array([k]))[0][0].copy()
                 for k in cold_keys}

    # fill the hot table COMPLETELY with other ids -> inserts must fail
    filler = jnp.arange(1000, 1000 + 256, dtype=jnp.int32)
    while True:
        t, _ = ev.lookup_phase(t, filler, step=2)
        if int(jax.device_get(t.size)) >= t.capacity:
            break

    payload = tier.prepare(np.asarray(cold_keys, np.int32), t.empty)
    assert payload is not None
    assert tier.cold.size == 0          # erase semantics took the rows
    t2 = tier.promote(t, payload)
    # nothing could land; every row must be BACK in the cold store
    assert tier.cold.size == len(cold_keys)
    assert int(jax.device_get(t2.growth_hint)) >= len(cold_keys)
    for k in cold_keys:
        rows, _, found = tier.cold.lookup(np.array([k], np.int64))
        assert found[0]
        np.testing.assert_array_equal(rows[0], want_rows[int(k)])


def test_checkpoint_includes_inflight_stager_payloads(tmp_path):
    """Round-5 review: TierStager.prepare MOVES rows out of the cold store
    into queued payloads — a full checkpoint cut while payloads are queued
    must still contain those rows (CheckpointSaverHook(stager=...) folds
    them into the cold dump); without the stager wiring they are silently
    lost."""

    import time

    from deeprec_tpu.train import saver
    from deeprec_tpu.train.hooks import CheckpointSaverHook
    from deeprec_tpu.train.stager import TierStager

    model = tiny_model(n_cols=2, emb_dim=4)
    gen_it = iter(SyntheticCriteo(batch_size=128, num_ids_per_col=600, seed=3))
    batches = [next(gen_it) for _ in range(10)]

    def build():
        tables = {n: ev.create(n, t.dim, option=t.option, capacity=256)
                  for n, t in base.make_tables(model).items()}
        o = sparse.adagrad(lr=0.05)
        tables = {n: o.init(t) for n, t in tables.items()}
        tiers = {n: TieredTable(t, evict_fraction=0.5, hot_watermark=0.5)
                 for n, t in tables.items()}
        tr = Trainer(model=model, tables=tables, sparse_optimizer=o,
                     dense_tx=optax.adagrad(0.05), tiers=tiers)
        return tr, tiers, tr.init_state(jax.random.PRNGKey(0))

    tr, tiers, state = build()
    for i, b in enumerate(batches[:8]):
        state, _ = tr.train_step(state, b)
        if (i + 1) % 2 == 0:
            state = tr.maybe_grow(state)
    assert any(t.cold.size > 0 for t in tiers.values())

    def live_union():
        out = {}
        for n, t in state.tables.items():
            keys = np.asarray(jax.device_get(t.keys))
            dev = set(keys[keys != t.empty].tolist())
            ck, _, _ = tiers[n].export_cold()
            out[n] = dev | set(np.asarray(ck).tolist())
        return out

    want = live_union()

    # queue promotion payloads for upcoming batches: rows leave the cold
    # store into the stager queue
    stager = TierStager(tr, iter(batches[8:]), max_steps=2, depth=2)
    deadline = time.time() + 10
    while time.time() < deadline:
        with stager._cv:
            if len(stager._items) >= 2 or stager._done:
                break
        time.sleep(0.01)
    queued = stager.queued_payloads()
    moved = sum(len(pl[n]["keys"]) for pl in queued for n in pl)
    assert moved > 0, "no payload rows moved — test setup failed"

    # full save WHILE payloads are queued, stager-aware
    hook = CheckpointSaverHook(str(tmp_path), save_steps=1, tiers=tiers,
                               stager=stager)
    state = hook.after_step(state, {}, step=0)

    # restore tier-complete into a fresh trainer: no key may be lost
    tr2, tiers2, template = build()
    restored = saver.restore_checkpoint(
        saver.latest_checkpoint(str(tmp_path)), template, tiers=tiers2)
    got = {}
    for n, t in restored.tables.items():
        keys = np.asarray(jax.device_get(t.keys))
        dev = set(keys[keys != t.empty].tolist())
        ck, _, _ = tiers2[n].export_cold()
        got[n] = dev | set(np.asarray(ck).tolist())
    for n in want:
        missing = want[n] - got[n]
        assert not missing, (n, sorted(missing)[:10])

    # negative control: the same save WITHOUT stager wiring loses exactly
    # the queued payload rows (proves the bug this guards against)
    hook2 = CheckpointSaverHook(str(tmp_path / "naive"), save_steps=1,
                                tiers=tiers)
    hook2.after_step(state, {}, step=0)
    tr3, tiers3, template3 = build()
    saver.restore_checkpoint(
        saver.latest_checkpoint(str(tmp_path / "naive")), template3,
        tiers=tiers3)
    lost = 0
    # count payload keys absent from the naive checkpoint's cold dump
    for pl in queued:
        for n, payload in pl.items():
            ck, _, _ = tiers3[n].export_cold()
            cold_keys = set(np.asarray(ck).tolist())
            lost += sum(1 for k in np.asarray(payload["keys"]).tolist()
                        if k not in cold_keys)
    assert lost == moved  # every in-flight row missing without the wiring


def test_stager_producer_error_propagates_from_fit():
    """Round-5 review: an exception in the stager's producer thread must
    surface from fit(), not silently truncate training."""

    model = tiny_model(n_cols=2, emb_dim=4)
    tables = {n: ev.create(n, t.dim, option=t.option, capacity=1024)
              for n, t in base.make_tables(model).items()}
    o = sparse.adagrad(lr=0.05)
    tables = {n: o.init(t) for n, t in tables.items()}
    tiers = {n: TieredTable(t, evict_fraction=0.5, hot_watermark=0.9)
             for n, t in tables.items()}
    tr = Trainer(model=model, tables=tables, sparse_optimizer=o,
                 dense_tx=optax.adagrad(0.05), tiers=tiers)
    state = tr.init_state(jax.random.PRNGKey(0))

    def dying_iter():
        gen_it = iter(SyntheticCriteo(batch_size=64, num_ids_per_col=200,
                                      seed=1))
        yield next(gen_it)
        yield next(gen_it)
        raise RuntimeError("data pipeline died")

    with pytest.raises(RuntimeError, match="data pipeline died"):
        tr.fit(state, dying_iter(), steps=50, log_every=0)


def test_promotion_marks_rows_touched_for_incremental_delta():
    """Round-5 review: a promoted row's cold copy is erased (move
    semantics), so the promotion itself must set the touched plane — a
    full+delta restore that misses it would resurrect only the stale
    pre-promotion state."""

    opt = cfg.EmbeddingVariableOption(record_touched=True)
    t = ev.create("t", dim=4, capacity=64, option=opt)
    t = sparse.adagrad(lr=0.05).init(t)
    tier = TieredTable(t, evict_fraction=0.5, hot_watermark=0.5)

    # seed the cold store directly, then promote
    tier.import_cold(np.array([7, 9], np.int64),
                     np.ones((2, tier.row_floats), np.float32),
                     np.array([3, 3], np.uint32))
    payload = tier.prepare(np.array([7, 9], np.int64),
                           empty=int(t.empty), erase=True)
    assert payload is not None
    assert int(np.sum(payload["keys"] != int(t.empty))) == 2  # padded
    t2 = tier.promote(t, payload)
    keys = np.asarray(jax.device_get(t2.keys))
    touched = np.asarray(jax.device_get(t2.touched))
    for k in (7, 9):
        (slot,) = np.nonzero(keys == k)
        assert len(slot) == 1 and touched[slot[0]], k


def test_host_kv_enable_ssd_twice_refused_and_io_errors_zero(tmp_path):
    """Round-5 review: a second enable_ssd must not truncate the live log
    (every SSD-resident row would read back zeroed); healthy stores report
    io_errors == 0."""

    kv = HostKV(row_floats=4, capacity_hint=64)
    kv.enable_ssd(str(tmp_path / "log.bin"), max_dram_rows=10)
    keys = np.arange(100, dtype=np.int64)
    rows = np.tile(np.arange(100, dtype=np.float32)[:, None], (1, 4))
    kv.upsert(keys, rows)
    assert kv.log_bytes > 0
    with pytest.raises(Exception):
        kv.enable_ssd(str(tmp_path / "log2.bin"), max_dram_rows=5)
    got, _, found = kv.lookup(keys)
    assert found.all()
    np.testing.assert_array_equal(got, rows)  # log intact
    assert kv.io_errors == 0
