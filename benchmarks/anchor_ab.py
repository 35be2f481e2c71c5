#!/usr/bin/env python
"""INTERLEAVED uniform-vs-proxy anchor A/B for the bench.py headline.

Round-5 verdict #1b: BENCH_r04 (373.4k, proxy anchor) vs BENCH_r03 (626k,
uniform anchor) confounds two effects — the round-4 re-anchor onto the
calibrated Criteo-Kaggle proxy (real, permanent) and the box's measured
±45% drift (noise).  This script decomposes them the only valid way on
this machine (CLAUDE.md measurement rules): BOTH legs run in ONE process,
alternating slope measurements, several reps each.

Leg U = round-3 bench distribution: SyntheticCriteo, uniform ids over
        1M/column (the r3 BENCH config verbatim).
Leg P = round-4+ bench distribution: CriteoKaggleProxy (published
        cardinalities incl. the 10.1M-row columns, ~Zipf(1) skew, Kaggle
        missing rates).

Each leg keeps its own trainer/state (occupancy and table capacity settle
per distribution, exactly like the respective BENCH runs).  Timing is the
bench.py slope method (value readback at window boundaries).

Run on the real chip, in background:
  PYTHONPATH=/root/repo nohup python -u benchmarks/anchor_ab.py > log &
"""

import json
import time

import numpy as np


def build(kind: str, batch=2048, n_batches=64):
    import jax
    import optax

    from deeprec_tpu.data.criteo_proxy import CriteoKaggleProxy
    from deeprec_tpu.data.synthetic import SyntheticCriteo
    from deeprec_tpu.models import base, dlrm
    from deeprec_tpu.optimizers import sparse
    from deeprec_tpu.train.loop import Trainer

    tables = base.make_tables(dlrm.MODEL, capacity=2 ** 16)
    trainer = Trainer(model=dlrm.MODEL, tables=tables,
                      sparse_optimizer=sparse.adagrad(lr=0.05),
                      dense_tx=optax.adagrad(0.05), bf16=True)
    state = trainer.init_state(jax.random.PRNGKey(0))
    if kind == "uniform":
        gen = SyntheticCriteo(batch_size=batch, num_ids_per_col=1_000_000,
                              seed=1)
    else:
        gen = CriteoKaggleProxy(batch_size=batch, seed=1)
    rng = np.random.RandomState(7)
    batches = [jax.device_put(gen.sample(rng)) for _ in range(n_batches)]
    m = None
    for i in range(n_batches):
        state, m = trainer.train_step(state, batches[i % n_batches])
        state = trainer.maybe_grow(state)
    _ = float(m["loss"])
    return {"tr": trainer, "state": state, "batches": batches,
            "batch": batch}


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
    if per_step is None:
        return None  # stall-inverted rep: caller skips it
    return leg["batch"] / per_step


def main():
    print("building legs (uniform then proxy)...", flush=True)
    legs = {"uniform": build("uniform"), "proxy": build("proxy")}

    # window sizing from a quick probe on the (slower) proxy leg —
    # CAPPED (benchmarks/_slope.probe_w1 rationale): a stall-corrupted
    # probe must not blow the window into a multi-hour run
    est = slope(legs["proxy"], 4, 16)
    per = 2048 / est if est else 1e-3
    w1 = min(2000, max(10, int(0.8 / max(per, 1e-4))))
    w2 = 4 * w1
    print(f"windows: w1={w1} w2={w2}", flush=True)

    reps = {"uniform": [], "proxy": []}
    for r in range(5):
        for name in ("uniform", "proxy"):
            v = slope(legs[name], w1, w2)
            if v is None:
                print(f"rep {r} {name}: stall-inverted, skipped", flush=True)
                continue
            reps[name].append(round(v, 1))
            print(f"rep {r} {name}: {v/1e3:.1f}k ex/s", flush=True)
    best_u = max(reps["uniform"])
    best_p = max(reps["proxy"])
    print(json.dumps({
        "uniform_reps": reps["uniform"], "proxy_reps": reps["proxy"],
        "uniform_best": best_u, "proxy_best": best_p,
        "proxy_over_uniform": round(best_p / best_u, 4),
        "note": ("interleaved one-process A/B; the ratio is the PERMANENT "
                 "re-anchor cost, anything else in BENCH_r03->r04 was box "
                 "phase"),
    }, indent=1), flush=True)


if __name__ == "__main__":
    main()
