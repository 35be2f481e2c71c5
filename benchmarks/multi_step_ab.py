#!/usr/bin/env python
"""Fused K-step dispatch vs per-step dispatch on the REAL chip, interleaved.

Round-5 verdict #5a: ``Trainer.make_multi_step(k)`` existed but was only
measured on the virtual CPU mesh.  This is the TPU analogue of the
reference's CUDA-graph replay economics (gpu_cuda_graph_mode docs —
capture once, replay K times to amortize per-launch host cost): here the
per-launch cost is the runtime dispatch + tunnel round-trip, and lax.scan
over the jitted step is the replay.

Method: per model (DLRM on the calibrated Criteo proxy, DIN on behavior
logs), measure unfused and fused-k for k in {4, 8} INTERLEAVED in one
process, several reps each, best-of per config (CLAUDE.md measurement
rules).  Timing = value readback + window slope, as bench.py.

Run on the real chip, in background:
  PYTHONPATH=/root/repo nohup python -u benchmarks/multi_step_ab.py > log &
"""

import json
import time

import numpy as np


def build(model_name: str, batch=2048):
    import dataclasses as dc

    import jax
    import optax

    from deeprec_tpu.data.behavior import SyntheticBehavior
    from deeprec_tpu.data.criteo_proxy import CriteoKaggleProxy
    from deeprec_tpu.models import base, get_model
    from deeprec_tpu.optimizers import sparse
    from deeprec_tpu.train.loop import Trainer

    model = get_model(model_name)
    if model_name == "din":
        model = dc.replace(model, table_specs={
            n: dc.replace(s, seq_len=50) for n, s in model.table_specs.items()})
        gen = SyntheticBehavior(batch_size=batch, seq_len=50,
                                num_items=200_000, num_categories=1000,
                                seed=1)
    else:
        gen = CriteoKaggleProxy(batch_size=batch, seed=1)
    trainer = Trainer(model=model, tables=base.make_tables(model,
                                                           capacity=2 ** 16),
                      sparse_optimizer=sparse.adagrad(lr=0.05),
                      dense_tx=optax.adagrad(0.05), bf16=True)
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(7)
    batches = [jax.device_put(gen.sample(rng)) for _ in range(32)]
    m = None
    for i in range(32):
        state, m = trainer.train_step(state, batches[i])
        state = trainer.maybe_grow(state)
    _ = float(m["loss"])
    return trainer, state, batches, batch


def main():
    import jax

    out = {}
    for name in ("dlrm", "din"):
        trainer, state, batches, batch = build(name)

        # unfused window
        def window_unfused(n, box):
            mm = None
            t0 = time.perf_counter()
            for i in range(n):
                box["s"], mm = trainer.train_step(box["s"],
                                                  batches[i % len(batches)])
            _ = float(mm["loss"])
            return time.perf_counter() - t0

        # fused-k windows: pre-stack batches into [k, ...] chunks
        fused = {}
        for k in (4, 8):
            fn = trainer.make_multi_step(k)
            chunks = [jax.tree.map(lambda *xs: jax.numpy.stack(xs),
                                   *batches[i:i + k])
                      for i in range(0, len(batches) - k + 1, k)]
            chunks = [jax.device_put(c) for c in chunks]
            fused[k] = (fn, chunks)

        box = {"s": state}
        # compile fused variants once (state shapes are settled post-grow)
        for k, (fn, chunks) in fused.items():
            box["s"], losses = fn(box["s"], chunks[0])
            _ = float(losses[-1])

        est = window_unfused(8, box) / 8
        w1 = min(2000, max(8, int(0.6 / max(est, 1e-4))))
        w2 = 4 * w1
        res = {"unfused": [], 4: [], 8: []}
        for rep in range(4):
            # skip stall-inverted slopes instead of letting a negative
            # value win the min() best-of (round-5 review: one stalled
            # readback used to poison or ZeroDivision the whole run)
            t1 = window_unfused(w1, box)
            t2 = window_unfused(w2, box)
            p_u = (t2 - t1) / (w2 - w1)
            if p_u > 0:
                res["unfused"].append(p_u)
            for k, (fn, chunks) in fused.items():
                def window_f(n):
                    mm = None
                    t0 = time.perf_counter()
                    for i in range(n):
                        box["s"], mm = fn(box["s"], chunks[i % len(chunks)])
                    _ = float(mm[-1])
                    return time.perf_counter() - t0

                c1 = max(2, w1 // k)
                c2 = 4 * c1
                t1 = window_f(c1)
                t2 = window_f(c2)
                p_f = (t2 - t1) / ((c2 - c1) * k)
                if p_f > 0:
                    res[k].append(p_f)
            print(f"{name} rep {rep}: "
                  + ", ".join(f"{k}: {v[-1]*1e3:.2f} ms/step"
                              for k, v in res.items() if v), flush=True)
        out[name] = {
            "unfused_ms_best": round(min(res["unfused"]) * 1e3, 3),
            "fused4_ms_best": round(min(res[4]) * 1e3, 3),
            "fused8_ms_best": round(min(res[8]) * 1e3, 3),
            "batch": batch,
        }
        o = out[name]
        o["fused8_speedup"] = round(o["unfused_ms_best"]
                                    / o["fused8_ms_best"], 3)
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
