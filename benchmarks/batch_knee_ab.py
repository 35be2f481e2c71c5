#!/usr/bin/env python
"""INTERLEAVED batch-2048 vs batch-4096 proxy A/B (round-5 review).

The round-5 `honest_scaling.py --proxy` rows suggested the knee inverted
(2048 @ settled 2^18 > 4096 @ settled 2^19), but those rows are
sequential single-pass measurements — invalid for an operating-point
claim under this box's ±45% drift (CLAUDE.md measurement rules).  This
script holds BOTH configurations resident in one process and alternates
slope measurements, several reps each, best-of per leg.

Run on the real chip, in background:
  PYTHONPATH=/root/repo nohup python -u benchmarks/batch_knee_ab.py > log &
"""

import json
import time

import numpy as np


def build(batch: int, n_batches: int = 16):
    import jax
    import optax

    from deeprec_tpu.data.criteo_proxy import CriteoKaggleProxy
    from deeprec_tpu.models import base, dlrm
    from deeprec_tpu.optimizers import sparse
    from deeprec_tpu.train.loop import Trainer

    tables = base.make_tables(dlrm.MODEL, capacity=2 ** 16)
    trainer = Trainer(model=dlrm.MODEL, tables=tables,
                      sparse_optimizer=sparse.adagrad(lr=0.05),
                      dense_tx=optax.adagrad(0.05), bf16=True)
    state = trainer.init_state(jax.random.PRNGKey(0))
    gen = CriteoKaggleProxy(batch_size=batch, seed=1)
    rng = np.random.RandomState(7)
    batches = [jax.device_put(gen.sample(rng)) for _ in range(n_batches)]
    m = None
    for i in range(n_batches):
        state, m = trainer.train_step(state, batches[i % n_batches])
        state = trainer.maybe_grow(state)
    _ = float(m["loss"])
    cap = int(state.tables[list(state.tables)[0]].capacity)
    return {"tr": trainer, "state": state, "batches": batches,
            "batch": batch, "cap": cap}


def slope(leg, w1, w2):
    tr, batches = leg["tr"], leg["batches"]

    def window(n):
        mm = None
        t0 = time.perf_counter()
        for i in range(n):
            leg["state"], mm = tr.train_step(leg["state"],
                                             batches[i % len(batches)])
        _ = float(mm["loss"])
        return time.perf_counter() - t0

    from benchmarks._slope import slope_per_step

    per_step = slope_per_step(window, w1, w2)
    return None if per_step is None else leg["batch"] / per_step


def main():
    legs = {b: build(b) for b in (2048, 4096)}
    for b, leg in legs.items():
        print(f"batch {b}: settled capacity 2^{leg['cap'].bit_length()-1}",
              flush=True)
    est = slope(legs[4096], 4, 16)
    per = 4096 / est if est else 1e-3
    w1 = min(2000, max(10, int(0.8 / max(per, 1e-4))))
    reps = {b: [] for b in legs}
    for r in range(5):
        for b, leg in legs.items():
            v = slope(leg, w1, 4 * w1)
            if v is None:
                print(f"rep {r} batch {b}: stall-inverted, skipped",
                      flush=True)
                continue
            reps[b].append(round(v, 1))
            print(f"rep {r} batch {b}: {v/1e3:.1f}k ex/s", flush=True)
    out = {f"b{b}_reps": v for b, v in reps.items()}
    out.update({f"b{b}_best": max(v) for b, v in reps.items()})
    out["b2048_over_b4096"] = round(out["b2048_best"] / out["b4096_best"], 4)
    out["caps"] = {b: legs[b]["cap"] for b in legs}
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
