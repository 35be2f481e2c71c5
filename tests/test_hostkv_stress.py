"""Concurrency stress for native/host_kv.cc (TSAN-style, via real threads).

The native calls release the GIL inside ctypes, so these threads genuinely
contend on the store's mutex (host_kv.cc:42). The reference's multi-tier
storage is exercised by a shared eviction thread pool
(eviction_manager.h:39); this is the equivalent torture test: concurrent
upsert / lookup / erase+reinsert cycles / compaction against one store with
a tiny DRAM budget so CLOCK eviction and tombstone reclamation churn
constantly. Hangs (the r1 tombstone-leak failure mode, ADVICE.md item 1)
are converted into failures via bounded joins.
"""

import os
import threading

import numpy as np
import pytest

from deeprec_tpu.data.native import HostKV

DIM = 8
KEYS_PER_THREAD = 1500
ITERS = 25


def _rows_for(keys: np.ndarray, tag: float) -> np.ndarray:
    out = np.empty((len(keys), DIM), np.float32)
    out[:] = (keys.astype(np.float32) * 10.0 + tag)[:, None]
    return out


def test_hostkv_concurrent_churn(tmp_path):
    kv = HostKV(DIM, capacity_hint=1024)
    # DRAM holds only a third of the working set -> constant SSD spill.
    kv.enable_ssd(str(tmp_path / "log.bin"), max_dram_rows=2048)

    n_threads = 4
    stop = threading.Event()
    errors: list = []

    def writer(tid: int):
        rng = np.random.default_rng(tid)
        base = tid * KEYS_PER_THREAD
        keys = np.arange(base, base + KEYS_PER_THREAD, dtype=np.int64)
        try:
            last_tag = np.zeros(KEYS_PER_THREAD, np.float32)
            for it in range(1, ITERS + 1):
                sel = rng.permutation(KEYS_PER_THREAD)[:600]
                kv.upsert(keys[sel], _rows_for(keys[sel], float(it)))
                last_tag[sel] = float(it)
                # erase+reinsert a slice (the tiered promote/demote cycle)
                ev = sel[:150]
                rows, _, found = kv.lookup(keys[ev], erase=True)
                kv.upsert(keys[ev], _rows_for(keys[ev], float(it)))
                # read-verify a random slice of own keys
                chk = rng.permutation(KEYS_PER_THREAD)[:200]
                rows, _, found = kv.lookup(keys[chk])
                written = last_tag[chk] > 0
                if not np.all(found[written]):
                    raise AssertionError(f"t{tid} it{it}: written key missing")
                got = rows[written][:, 0]
                want = (keys[chk][written] * 10.0 + last_tag[chk][written]
                        ).astype(np.float32)
                if not np.array_equal(got, want):
                    bad = np.flatnonzero(got != want)[:3]
                    raise AssertionError(
                        f"t{tid} it{it}: stale reads at {bad}: "
                        f"{got[bad]} != {want[bad]}")
            # final full verify of the owned range
            rows, _, found = kv.lookup(keys)
            written = last_tag > 0
            assert np.all(found[written])
            np.testing.assert_array_equal(
                rows[written][:, 0],
                (keys[written] * 10.0 + last_tag[written]).astype(np.float32))
        except Exception as e:  # propagate to the main thread
            errors.append((tid, e))
            stop.set()

    def compactor():
        while not stop.is_set():
            kv.compact()
            _ = kv.size
            stop.wait(0.01)

    threads = [threading.Thread(target=writer, args=(t,), daemon=True)
               for t in range(n_threads)]
    cthread = threading.Thread(target=compactor, daemon=True)
    for t in threads:
        t.start()
    cthread.start()
    for t in threads:
        t.join(timeout=120)
        if t.is_alive():
            stop.set()
            pytest.fail("writer thread hung (probe loop regression?)")
    stop.set()
    cthread.join(timeout=30)
    assert not errors, errors

    # store-wide invariants after the storm
    assert kv.size <= n_threads * KEYS_PER_THREAD
    keys, rows, _ = kv.export()
    assert len(np.unique(keys)) == len(keys), "duplicate keys after churn"
    # every exported value is a (key*10 + tag) with tag in [1, ITERS]
    tags = rows[:, 0] - keys.astype(np.float32) * 10.0
    assert np.all((tags >= 1.0) & (tags <= ITERS))


def test_hostkv_erase_reinsert_many_cycles(tmp_path):
    """Single-thread endurance: the exact r1 tombstone-leak loop — erase and
    reinsert the same keys for many cycles with zero net growth; a leak
    regression would exhaust empty slots and hang/grow unboundedly."""
    kv = HostKV(DIM, capacity_hint=256)
    kv.enable_ssd(str(tmp_path / "log.bin"), max_dram_rows=128)
    keys = np.arange(200, dtype=np.int64)
    kv.upsert(keys, _rows_for(keys, 0.5))
    for cycle in range(400):
        rows, _, found = kv.lookup(keys, erase=True)
        assert np.all(found), f"cycle {cycle}: lost keys"
        kv.upsert(keys, rows)
    assert kv.size == 200
    rows, _, found = kv.lookup(keys)
    assert np.all(found)
    np.testing.assert_array_equal(rows, _rows_for(keys, 0.5))
