#!/usr/bin/env python
"""Device-side serving-step latency via slope timing (round-5 verdict #6).

PERF.md's serving table measures wall-clock HTTP round trips through the
dev tunnel (30 ms p50) — transfer-bound, so the "~1-3 ms co-located" claim
was an extrapolation.  This bench measures the serving COMPUTE step
honestly on the real chip: the frozen-eval forward that Processor.predict
dispatches (bucketed batch, inference lookup path, no table mutation),
timed with the value-readback window-slope method that cancels the tunnel
round-trip (the same method bench.py uses for training).

Buckets follow the Processor default config (1, 64, 256, 1024).  Tables
are populated to the calibrated Criteo-proxy occupancy first, as a loaded
serving instance would be.

Run on the real chip, in background:
  PYTHONPATH=/root/repo nohup python -u benchmarks/serving_device_lat.py > log &
"""

import json
import time

import numpy as np


def main():
    import jax
    import optax

    from deeprec_tpu.data.criteo_proxy import CriteoKaggleProxy
    from deeprec_tpu.models import base, dlrm
    from deeprec_tpu.optimizers import sparse
    from deeprec_tpu.train.loop import Trainer

    # populate tables like a loaded serving instance (same regime as the
    # training bench: proxy ids, settled capacity)
    model = dlrm.MODEL
    trainer = Trainer(model=model,
                      tables=base.make_tables(model, capacity=2 ** 16),
                      sparse_optimizer=sparse.adagrad(lr=0.05),
                      dense_tx=optax.adagrad(0.05), bf16=True)
    state = trainer.init_state(jax.random.PRNGKey(0))
    gen = CriteoKaggleProxy(batch_size=2048, seed=1)
    rng = np.random.RandomState(7)
    warm = [jax.device_put(gen.sample(rng)) for _ in range(32)]
    m = None
    for b in warm:
        state, m = trainer.train_step(state, b)
        state = trainer.maybe_grow(state)
    _ = float(m["loss"])
    print("tables populated; measuring eval (serving) step", flush=True)

    out = {}
    for B in (1, 64, 256, 1024):
        egen = CriteoKaggleProxy(batch_size=B, seed=9)
        batches = [jax.device_put(egen.sample(rng)) for _ in range(16)]

        def window(n):
            loss = None
            t0 = time.perf_counter()
            for i in range(n):
                _, loss = trainer.eval_step(state, batches[i % 16])
            _ = float(loss)  # scalar readback drains the queue
            return time.perf_counter() - t0

        window(4)  # compile this bucket
        est = window(8) / 8
        w1 = min(4000, max(8, int(0.5 / max(est, 1e-4))))
        w2 = 4 * w1
        best = float("inf")
        for _ in range(3):
            t1 = window(w1)
            t2 = window(w2)
            p_s = (t2 - t1) / (w2 - w1)
            if p_s > 0:  # skip stall-inverted reps (round-5 review)
                best = min(best, p_s)
        out[f"batch_{B}_ms"] = round(best * 1e3, 3)
        print(f"batch {B}: {best*1e3:.3f} ms/step device compute", flush=True)
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
