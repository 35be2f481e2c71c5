#!/usr/bin/env python
"""Per-model training-throughput harness — the modelzoo/benchmark role.

Mirrors the reference's benchmark config (modelzoo/benchmark/cpu/config.yaml:
all 15 models at batch 2048) with the same honest slope-timing method as
bench.py: device-resident batches, value readback at window boundaries,
throughput from the slope between two window sizes.

Reference single-node CPU baselines (examples/s, Xeon 8475B 16 vCPU; see
BASELINE.md / SURVEY.md §6) are attached where published; models without a
published number report absolute throughput only.

Usage:
  python benchmarks/modelzoo_bench.py [--models dien,bst] [--batch 2048]
      [--out /tmp/modelzoo_bench.jsonl]
Run on the TPU in background (compiles are ~20-40s per model through the
tunnel): nohup python benchmarks/modelzoo_bench.py > /tmp/mzb.log 2>&1 &
"""

import argparse
import dataclasses
import json
import time

import numpy as np

# DeepRec's best published single-node number per model (BF16 where
# published, else FP32): modelzoo/<model>/README.md perf tables.
REF_BASELINES = {
    "wdl": 82485.0,      # BF16 (wide_and_deep/README.md:169-216)
    "dlrm": 141266.06,   # BF16 (dlrm/README.md:164-197)
    "deepfm": 74380.0,   # FP32 (deepfm/README.md)
    "din": 59161.0,      # (din/README.md)
    "dien": 10094.0,     # (dien/README.md)
}

SEQ_MODELS = {"din", "dien", "bst"}
MT_MODELS = {"mmoe", "esmm", "ple", "dbmtl", "simplemultitask"}
SEQ_LEN = 50  # MAX_SEQ_LENGTH in reference din/dien/bst train.py:47


def bench_model(name: str, batch: int, measure: int = 32,
                n_batches: int = 16):
    import jax
    import optax

    from deeprec_tpu.data.behavior import SyntheticBehavior, SyntheticMultiTask
    from deeprec_tpu.data.synthetic import SyntheticCriteo
    from deeprec_tpu.models import base, get_model
    from deeprec_tpu.optimizers import sparse
    from deeprec_tpu.train.loop import Trainer

    model = get_model(name)
    if name in SEQ_MODELS:
        specs = {n: dataclasses.replace(s, seq_len=SEQ_LEN)
                 for n, s in model.table_specs.items()}
        model = dataclasses.replace(model, table_specs=specs)
        gen = SyntheticBehavior(batch_size=batch, num_items=200_000,
                                num_categories=1000, seq_len=SEQ_LEN, seed=1)
    elif name in MT_MODELS:
        gen = SyntheticMultiTask(batch_size=batch, num_ids_per_col=1_000_000,
                                 seed=1)
    else:
        gen = SyntheticCriteo(batch_size=batch, num_ids_per_col=1_000_000,
                              seed=1)

    tables = base.make_tables(model, capacity=2 ** 16)
    trainer = Trainer(model=model, tables=tables,
                      sparse_optimizer=sparse.adagrad(lr=0.05),
                      dense_tx=optax.adagrad(0.05), bf16=True)
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(7)
    batches = [jax.device_put(gen.sample(rng)) for _ in range(n_batches)]

    m = None
    for i in range(max(10, n_batches)):
        state, m = trainer.train_step(state, batches[i % n_batches])
        state = trainer.maybe_grow(state)
    _ = float(m["loss"])

    def window(n):
        nonlocal state
        mm = None
        t0 = time.perf_counter()
        for i in range(n):
            state, mm = trainer.train_step(state, batches[i % n_batches])
        _ = float(mm["loss"])
        return time.perf_counter() - t0

    # Slope windows must span enough device time that the window difference
    # dwarfs the ~30 ms tunnel round-trip noise; size them from a probe so
    # fast models (sub-ms steps) don't produce garbage slopes.
    est = window(8) / 8                       # upper bound incl. readback
    w1 = min(2000, max(measure // 4, int(0.8 / max(est, 1e-5))))
    w2 = 4 * w1
    best = 0.0
    for _ in range(2):
        t1 = window(w1)
        t2 = window(w2)
        per_step = max((t2 - t1) / (w2 - w1), 1e-9)
        best = max(best, batch / per_step)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default=None,
                    help="comma list; default: all registered")
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--measure", type=int, default=32)
    ap.add_argument("--out", default="/tmp/modelzoo_bench.jsonl")
    args = ap.parse_args()

    from deeprec_tpu.models import MODEL_NAMES

    names = (args.models.split(",") if args.models
             else [n for n in MODEL_NAMES if n != "dlrm_mlperf"])
    rows = []
    for name in names:
        t0 = time.time()
        try:
            value = bench_model(name, args.batch, args.measure)
        except Exception as e:  # keep the sweep alive past one bad model
            print(f"{name}: FAILED {e!r}", flush=True)
            continue
        ref = REF_BASELINES.get(name)
        row = {"model": name, "examples_per_sec": round(value, 1),
               "batch": args.batch,
               "vs_reference": round(value / ref, 2) if ref else None,
               "reference_cpu": ref, "wall_s": round(time.time() - t0, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(row) + "\n")

    print("\n| model | ex/s (1 TPU chip) | reference CPU best | ratio |")
    print("|---|---|---|---|")
    for r in rows:
        ref = f"{r['reference_cpu']:,.0f}" if r["reference_cpu"] else "—"
        ratio = f"{r['vs_reference']}x" if r["vs_reference"] else "—"
        print(f"| {r['model']} | {r['examples_per_sec']:,.0f} | {ref} | {ratio} |")


if __name__ == "__main__":
    main()
