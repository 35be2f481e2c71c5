#!/usr/bin/env python
"""Pad-to-max vs length-bucketed training on skewed behavior histories.

VERDICT r3 #8 done-criterion: DIN-shaped run on skewed lengths (median 8,
max 50) showing >= 1.5x throughput vs pad-only, with parity covered by
tests/test_bucketing.py.  Interleaved same-process A/B (CLAUDE.md
measurement rules): both strategies consume the SAME pre-generated source
batches; time-per-pass is slope-measured between 1x and 3x passes with a
value readback at each window boundary.

Run: PYTHONPATH=/root/repo:$PYTHONPATH nohup python -u \
     benchmarks/ragged_bucket_ab.py > /tmp/ragged_ab.log 2>&1 &
"""

import dataclasses
import json
import time

import numpy as np


def main():
    import jax
    import optax

    from deeprec_tpu.data.behavior import SyntheticBehavior
    from deeprec_tpu.data.bucketing import LengthBucketedStream
    from deeprec_tpu.models import base, get_model
    from deeprec_tpu.optimizers import sparse
    from deeprec_tpu.train.loop import Trainer

    SEQ, BATCH, NSRC = 50, 2048, 24
    model = get_model("din")
    specs = {n: dataclasses.replace(s, seq_len=SEQ)
             for n, s in model.table_specs.items()}
    model = dataclasses.replace(model, table_specs=specs)

    gen = SyntheticBehavior(batch_size=BATCH, seq_len=SEQ, median_len=8,
                            num_items=200_000, num_categories=1000, seed=1)
    rng = np.random.RandomState(7)
    src = [gen.sample(rng) for _ in range(NSRC)]

    def bucketize(batches):
        out = list(LengthBucketedStream(iter(batches), buckets=(8, 16, 32, 50),
                                        drop_remainder=False))
        return out

    variants = {}
    for name, batches in (("pad", src), ("bucketed", bucketize(src))):
        tr = Trainer(model=model, tables=base.make_tables(model),
                     sparse_optimizer=sparse.adagrad(lr=0.05),
                     dense_tx=optax.adagrad(0.05), bf16=True)
        state = tr.init_state(jax.random.PRNGKey(0))
        dev = [jax.device_put(b) for b in batches]
        n_ex = sum(len(b["label"]) for b in batches)
        # warmup: compile every width + settle occupancy/growth
        for _ in range(2):
            m = None
            for b in dev:
                state, m = tr.train_step(state, b)
            state = tr.maybe_grow(state)
        _ = float(m["loss"])
        variants[name] = (tr, state, dev, n_ex)

    def passes(name, k):
        tr, state, dev, n_ex = variants[name]
        m = None
        t0 = time.perf_counter()
        for _ in range(k):
            for b in dev:
                state, m = tr.train_step(state, b)
        _ = float(m["loss"])
        variants[name] = (tr, state, dev, n_ex)
        return time.perf_counter() - t0

    res = {}
    for rep in range(3):
        for name in variants:
            t1 = passes(name, 1)
            t3 = passes(name, 3)
            per_pass = (t3 - t1) / 2
            res.setdefault(name, []).append(
                variants[name][3] / per_pass)
    out = {}
    for name, v in res.items():
        v = sorted(v)
        out[name + "_ex_s"] = [round(x) for x in v]
        out[name + "_med"] = round(v[1])
    out["speedup"] = round(out["bucketed_med"] / out["pad_med"], 3)
    lens = [b["cat"]["hist_item"].shape[1]
            for b in variants["bucketed"][2]]
    out["bucket_batch_widths"] = sorted(set(lens))
    out["n_bucket_batches"] = len(lens)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
