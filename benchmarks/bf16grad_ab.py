#!/usr/bin/env python
"""Interleaved A/B: bf16 gradients through the stream scatter (round-3c
half-traffic layout) vs the old upcast-to-f32-first formulation.

The downcast at the gathered boundary is LOSSLESS (the cotangent is an
exact upcast of a bf16 value), so this is a pure-performance change —
the win is half the bytes through the grad permute + kernel DMA.

Run: PYTHONPATH=/root/repo:$PYTHONPATH nohup python -u \
     benchmarks/bf16grad_ab.py > /tmp/bf16grad_ab.log 2>&1 &
"""

import dataclasses
import json
import time

import numpy as np


def build(name, bf16_grads):
    import jax
    import optax

    from deeprec_tpu.data.behavior import SyntheticBehavior
    from deeprec_tpu.data.synthetic import SyntheticCriteo
    from deeprec_tpu.models import base, get_model
    from deeprec_tpu.optimizers import sparse
    from deeprec_tpu.train.loop import Trainer

    model = get_model(name)
    if name in ("din", "dien", "bst"):
        specs = {n: dataclasses.replace(s, seq_len=50)
                 for n, s in model.table_specs.items()}
        model = dataclasses.replace(model, table_specs=specs)
        gen = SyntheticBehavior(batch_size=2048, num_items=200_000,
                                num_categories=1000, seq_len=50, seed=1)
    else:
        gen = SyntheticCriteo(batch_size=2048, num_ids_per_col=1_000_000,
                              seed=1)
    tables = base.make_tables(model)
    tr = Trainer(model=model, tables=tables,
                 sparse_optimizer=sparse.adagrad(lr=0.05),
                 dense_tx=optax.adagrad(0.05), bf16=True)
    if not bf16_grads:
        tr._grad_for_apply = lambda g: g  # old path: f32 all the way
    state = tr.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(7)
    batches = [jax.device_put(gen.sample(rng)) for _ in range(8)]
    for i in range(30):
        state, m = tr.train_step(state, batches[i % 8])
        if i % 5 == 4:
            state = tr.maybe_grow(state)
    _ = float(m["loss"])
    return tr, state, batches


def window(tsb, k):
    tr, state, batches = tsb
    m = None
    t0 = time.perf_counter()
    for i in range(k):
        state, m = tr.train_step(state, batches[i % 8])
    _ = float(m["loss"])
    return time.perf_counter() - t0, (tr, state, batches)


def measure(name):
    variants = {"bf16": build(name, True), "f32": build(name, False)}
    res = {}
    for rep in range(3):
        for key in ("bf16", "f32"):
            tsb = variants[key]
            est, tsb = window(tsb, 6)
            w1 = max(6, int(0.8 / max(est / 6, 1e-5)))
            t1, tsb = window(tsb, w1)
            t2, tsb = window(tsb, 4 * w1)
            variants[key] = tsb
            res.setdefault(key, []).append(
                round((t2 - t1) / (3 * w1) * 1e3, 3))
    out = {"model": name}
    for k, v in res.items():
        v = sorted(v)
        out[k + "_ms"], out[k + "_med"] = v, v[1]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    import sys

    for m in (sys.argv[1].split(",") if len(sys.argv) > 1
              else ["din", "dlrm"]):
        measure(m)
