#!/usr/bin/env python
"""Bisect the BLOCK=64 train-mode probe pathology (TODO perf #3).

Round 3 measured the bucketized probe at BLOCK=64 as 2x faster than
BLOCK=32 in eval (1.8 vs 3.7 ms at the 209k-id DIN shape) but 4x SLOWER
in train mode (22.3 ms) and parked it.  This harness isolates which
train-only component flips the lowering, interleaved in one process:

  find   — _find_or_insert with may_insert all-False (pure probe)
  fins   — _find_or_insert with may_insert=valid, steady state (all ids
           present -> the insert while_loop never runs)
  train  — full lookup_phase(train=True) steady state
  eval   — full lookup_phase(train=False)

Production-like shape: 209k positions, 65k uniques (Zipf multiplicity),
capacity 2^18 prefilled to LF 0.73.  Run on the TPU in background:
  PYTHONPATH=/root/repo:$PYTHONPATH nohup python -u \
      benchmarks/probe_block_ab.py > /tmp/probe_ab.log 2>&1 &
"""

import json
import time

import numpy as np


def make_ids(n_unique=65_536, n_total=209_000, seed=0):
    rng = np.random.RandomState(seed)
    uniq = np.unique(rng.randint(1, 2**31 - 1, size=2 * n_unique,
                                 dtype=np.int64))[:n_unique].astype(np.int32)
    rng.shuffle(uniq)
    # Zipf-ish multiplicities normalized to n_total positions
    w = 1.0 / np.arange(1, n_unique + 1) ** 0.9
    cnt = np.maximum(1, np.round(w / w.sum() * n_total)).astype(np.int64)
    ids = np.repeat(uniq, cnt)[:n_total]
    if len(ids) < n_total:
        ids = np.concatenate([ids, rng.choice(uniq, n_total - len(ids))])
    rng.shuffle(ids)
    return uniq, ids.astype(np.int32)


def build(block):
    import jax
    import jax.numpy as jnp

    from deeprec_tpu import config as cfg
    from deeprec_tpu.embedding import table as tmod

    tmod.BLOCK = block  # trace-time constant

    cap = 2 ** 18
    uniq, ids = make_ids()
    # prefill to LF 0.73 with the uniques + filler keys
    rng = np.random.RandomState(1)
    n_fill = int(0.73 * cap) - len(uniq)
    filler = np.unique(rng.randint(-2**31 + 2, 0, size=2 * n_fill,
                                   dtype=np.int64))[:n_fill].astype(np.int32)
    t = tmod.create(f"b{block}", dim=32, capacity=cap,
                    option=cfg.EmbeddingVariableOption())
    from deeprec_tpu.optimizers import sparse
    t = sparse.adagrad(lr=0.05).init(t)
    prefill = jnp.asarray(np.concatenate([uniq, filler]))
    t, _ = tmod.lookup_phase(t, prefill, step=0, train=True)
    jax.block_until_ready(t.keys)

    ids_d = jax.device_put(jnp.asarray(ids))
    valid = jnp.ones((len(ids),), bool)
    nope = jnp.zeros((len(ids),), bool)

    @jax.jit
    def f_find(keys, ids):
        k, s, i, f = tmod._find_or_insert(keys, ids, nope, valid)
        return jnp.sum(s)  # device-reduce before readback

    @jax.jit
    def f_fins(keys, ids):
        k, s, i, f = tmod._find_or_insert(keys, ids, valid, valid)
        return jnp.sum(s) + jnp.sum(k)

    @jax.jit
    def f_train(t, ids):
        t2, lk = tmod.lookup_phase(t, ids, step=1, train=True)
        return jnp.sum(lk.slot_ids) + jnp.sum(t2.freqs)

    @jax.jit
    def f_eval(t, ids):
        _, lk = tmod.lookup_phase(t, ids, step=1, train=False)
        return jnp.sum(lk.slot_ids)

    fns = {
        "find": lambda: f_find(t.keys, ids_d),
        "fins": lambda: f_fins(t.keys, ids_d),
        "train": lambda: f_train(t, ids_d),
        "eval": lambda: f_eval(t, ids_d),
    }
    for f in fns.values():
        float(f())  # compile
    return fns


def window(f, n):
    t0 = time.perf_counter()
    r = None
    for _ in range(n):
        r = f()
    _ = float(r)
    return time.perf_counter() - t0


def main():
    variants = {32: build(32), 64: build(64)}
    res = {}
    for rep in range(3):
        for block, fns in variants.items():
            for name, f in fns.items():
                est = window(f, 4) / 4
                w1 = max(4, int(0.25 / max(est, 1e-5)))
                t1 = window(f, w1)
                t2 = window(f, 4 * w1)
                per = (t2 - t1) / (3 * w1) * 1e3
                res.setdefault(f"{name}@{block}", []).append(round(per, 3))
    for k in sorted(res):
        v = sorted(res[k])
        print(json.dumps({"case": k, "ms": v, "med": v[1]}), flush=True)


if __name__ == "__main__":
    main()
