#!/usr/bin/env python
"""In-step interleaved A/B of the gradient-scatter strategy: stream kernel
(round-2d winner) vs plain XLA scatter-add, at today's backend.

apply_ablate.py (round 3c) measured the ISOLATED ops inverting: XLA
scatter 2.66 ms vs stream 3.69 ms at the production DIN distribution
(209k ids -> 65k uniques, [262k, 32] table).  Per the measurement rules
(PERF.md round 2c/2d) a dispatch change needs the IN-STEP interleaved
number, same process, several reps.

Run: PYTHONPATH=/root/repo:$PYTHONPATH nohup python -u \
     benchmarks/scatter_instep_ab.py > /tmp/scatter_ab.log 2>&1 &
"""

import dataclasses
import functools
import json
import time

import numpy as np


def build(name, force):
    """``name`` may carry a batch-size suffix: "dlrm@16384"."""

    import jax
    import optax

    from deeprec_tpu.data.behavior import SyntheticBehavior
    from deeprec_tpu.data.synthetic import SyntheticCriteo
    from deeprec_tpu.models import base, get_model
    from deeprec_tpu.ops import segment_scatter
    from deeprec_tpu.optimizers import sparse
    from deeprec_tpu.train.loop import Trainer

    name, _, bs = name.partition("@")
    batch = int(bs) if bs else 2048
    proxy = name.endswith("_proxy")
    model = get_model(name.removesuffix("_proxy"))
    if proxy:
        # the bench.py regime since round 4: published Kaggle cardinalities
        # + Zipf skew — many more unique scatter destinations than the 1M
        # uniform generator (the regime XLA scatter degraded in at r2d)
        from deeprec_tpu.data.criteo_proxy import CriteoKaggleProxy

        gen = CriteoKaggleProxy(batch_size=batch, seed=1)
    elif name in ("din", "dien", "bst"):
        specs = {n: dataclasses.replace(s, seq_len=50)
                 for n, s in model.table_specs.items()}
        model = dataclasses.replace(model, table_specs=specs)
        gen = SyntheticBehavior(batch_size=batch, num_items=200_000,
                                num_categories=1000, seq_len=50, seed=1)
    else:
        gen = SyntheticCriteo(batch_size=batch, num_ids_per_col=1_000_000,
                              seed=1)
    tables = base.make_tables(model)
    tr = Trainer(model=model, tables=tables,
                 sparse_optimizer=sparse.adagrad(lr=0.05),
                 dense_tx=optax.adagrad(0.05), bf16=True)

    real = segment_scatter.scatter_add_rows
    patched = functools.partial(real, _force=force)
    segment_scatter.scatter_add_rows = patched
    try:
        state = tr.init_state(jax.random.PRNGKey(0))
        rng = np.random.RandomState(7)
        batches = [jax.device_put(gen.sample(rng)) for _ in range(8)]
        for i in range(30):
            state, m = tr.train_step(state, batches[i % 8])
            if i % 5 == 4:
                state = tr.maybe_grow(state)
        _ = float(m["loss"])
    finally:
        segment_scatter.scatter_add_rows = real
    return tr, state, batches, real, force


def window(tsb, k):
    import functools

    from deeprec_tpu.ops import segment_scatter

    tr, state, batches, real, force = tsb
    segment_scatter.scatter_add_rows = functools.partial(real, _force=force)
    try:
        m = None
        t0 = time.perf_counter()
        for i in range(k):
            state, m = tr.train_step(state, batches[i % 8])
        _ = float(m["loss"])
        dt = time.perf_counter() - t0
    finally:
        segment_scatter.scatter_add_rows = real
    return dt, (tr, state, batches, real, force)


def measure(name):
    variants = {"stream": build(name, "stream"), "xla": build(name, "xla")}
    res = {}
    for rep in range(3):
        for key in ("stream", "xla"):
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
        out[k + "_ms"] = v
        out[k + "_med"] = v[1]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    import sys

    for m in (sys.argv[1].split(",") if len(sys.argv) > 1
              else ["din", "dlrm"]):
        measure(m)
