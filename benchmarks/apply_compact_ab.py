#!/usr/bin/env python
"""Dense-masked vs touched-set (compact) sparse apply — interleaved A/B.

Round-4 structural question (VERDICT r3 #1): the dense-masked apply
reads+writes every [C, D] state array each step; the compact apply touches
only the batch's live rows (sort + segment-aggregate + chunked
gather/update/scatter, optimizers/sparse._apply_compact).  Shapes measured,
all interleaved in ONE process (CLAUDE.md measurement rules):

  dlrm@2048   — the bench.py headline regime (cap grows to ~2^19, D=16)
  dlrm@16384  — the round-3 regression point (cap 2^21)
  din@2048    — sequence shape (209k ids -> ~65k uniques, D=32)

Run: PYTHONPATH=/root/repo:$PYTHONPATH nohup python -u \
     benchmarks/apply_compact_ab.py > /tmp/apply_compact_ab.log 2>&1 &
"""

import dataclasses
import json
import time

import numpy as np


def make_dlrm(batch, strategy):
    import jax
    import optax

    from deeprec_tpu.data.synthetic import SyntheticCriteo
    from deeprec_tpu.models import base, dlrm
    from deeprec_tpu.optimizers import sparse
    from deeprec_tpu.train.loop import Trainer

    model = dlrm.MODEL
    tables = base.make_tables(model, capacity=2 ** 16)
    tr = Trainer(model=model, tables=tables,
                 sparse_optimizer=sparse.adagrad(lr=0.05),
                 dense_tx=optax.adagrad(0.05), bf16=True,
                 apply_strategy=strategy)
    state = tr.init_state(jax.random.PRNGKey(0))
    gen = SyntheticCriteo(batch_size=batch, num_ids_per_col=1_000_000, seed=1)
    rng = np.random.RandomState(7)
    nb = max(8, min(32, 64 // max(1, batch // 2048)))
    batches = [jax.device_put(gen.sample(rng)) for _ in range(nb)]
    return tr, state, batches


def make_din(batch, strategy):
    import jax
    import optax

    from deeprec_tpu.data.behavior import SyntheticBehavior
    from deeprec_tpu.models import base, get_model
    from deeprec_tpu.optimizers import sparse
    from deeprec_tpu.train.loop import Trainer

    SEQ = 50
    model = get_model("din")
    specs = {n: dataclasses.replace(s, seq_len=SEQ)
             for n, s in model.table_specs.items()}
    model = dataclasses.replace(model, table_specs=specs)
    gen = SyntheticBehavior(batch_size=batch, num_items=200_000,
                            num_categories=1000, seq_len=SEQ, seed=1)
    tables = base.make_tables(model)
    tr = Trainer(model=model, tables=tables,
                 sparse_optimizer=sparse.adagrad(lr=0.05),
                 dense_tx=optax.adagrad(0.05), bf16=True,
                 apply_strategy=strategy)
    state = tr.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(7)
    batches = [jax.device_put(gen.sample(rng)) for _ in range(8)]
    return tr, state, batches


def settle(tr, state, batches, steps=30):
    m = None
    for i in range(steps):
        state, m = tr.train_step(state, batches[i % len(batches)])
        if i % 5 == 4:
            state = tr.maybe_grow(state)
    _ = float(m["loss"])
    return state


def main():
    import jax  # noqa: F401

    cases = {}
    for name, mk, batch in [("dlrm2048", make_dlrm, 2048),
                            ("dlrm16384", make_dlrm, 16384),
                            ("din2048", make_din, 2048)]:
        for strat in ("dense", "compact"):
            tr, state, batches = mk(batch, strat)
            state = settle(tr, state, batches)
            t0 = next(iter(state.tables.values()))
            cases[(name, strat)] = (tr, state, batches, batch)
            print(json.dumps({"case": name, "strategy": strat,
                              "cap": int(t0.keys.shape[0]),
                              "size": int(t0.size)}), flush=True)

    def window(key, n):
        tr, state, batches, batch = cases[key]
        mm = None
        t0 = time.perf_counter()
        for i in range(n):
            state, mm = tr.train_step(state, batches[i % len(batches)])
        _ = float(mm["loss"])
        cases[key] = (tr, state, batches, batch)
        return time.perf_counter() - t0

    res = {}
    for rep in range(3):
        for key in cases:
            est = window(key, 4) / 4
            w1 = max(4, int(0.35 / max(est, 1e-5)))
            t1 = window(key, w1)
            t2 = window(key, 4 * w1)
            ms = (t2 - t1) / (3 * w1) * 1e3
            res.setdefault(key, []).append(round(ms, 3))
            print(json.dumps({"case": key[0], "strategy": key[1], "rep": rep,
                              "ms_per_step": round(ms, 3)}), flush=True)

    print("== summary ==", flush=True)
    for key, v in sorted(res.items()):
        v = sorted(v)
        name, strat = key
        _, _, _, batch = cases[key]
        print(json.dumps({
            "case": name, "strategy": strat, "ms": v, "med_ms": v[1],
            "ex_per_s": round(batch / (v[1] / 1e3), 1)}), flush=True)


if __name__ == "__main__":
    main()
