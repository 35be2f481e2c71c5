"""Honest batch-size and capacity scaling for the DLRM train step.

Timing method matches bench.py: forced VALUE readback at each window
boundary, slope between two window sizes (cancels the readback round-trip).
On this runtime ``block_until_ready`` can return before remote execution
completes, so naive timing measures dispatch, not compute.
"""
import time
import numpy as np
import jax, optax

from deeprec_tpu.data.synthetic import SyntheticCriteo
from deeprec_tpu.models import base, dlrm
from deeprec_tpu.optimizers import sparse
from deeprec_tpu.train.loop import Trainer

N_BATCHES = 16


def measure(batch, grow=True, capacity=2 ** 16, measure_steps=32,
            proxy=False):
    model = dlrm.MODEL
    tables = base.make_tables(model, capacity=capacity)
    trainer = Trainer(model=model, tables=tables,
                      sparse_optimizer=sparse.adagrad(lr=0.05),
                      dense_tx=optax.adagrad(0.05), bf16=True)
    state = trainer.init_state(jax.random.PRNGKey(0))
    if proxy:
        # round-5: the bench anchor moved to the calibrated Kaggle proxy
        # (round-4 re-anchor) — the batch-knee table must be re-read in
        # the same id regime (verdict #5b)
        from deeprec_tpu.data.criteo_proxy import CriteoKaggleProxy

        gen = CriteoKaggleProxy(batch_size=batch, seed=1)
    else:
        gen = SyntheticCriteo(batch_size=batch, num_ids_per_col=1_000_000,
                              seed=1)
    rng = np.random.RandomState(7)
    batches = [jax.device_put(gen.sample(rng)) for _ in range(N_BATCHES)]
    m = None
    for i in range(max(10, N_BATCHES)):
        state, m = trainer.train_step(state, batches[i % N_BATCHES])
        if grow:
            state = trainer.maybe_grow(state)
    _ = float(m["loss"])
    cap = state.tables[list(state.tables)[0]].capacity

    def window(n):
        nonlocal state
        mm = None
        t0 = time.perf_counter()
        for i in range(n):
            state, mm = trainer.train_step(state, batches[i % N_BATCHES])
        _ = float(mm["loss"])
        return time.perf_counter() - t0

    w1, w2 = measure_steps // 4, measure_steps
    best = 0.0
    for _ in range(3):
        t1 = window(w1)
        t2 = window(w2)
        per_step = (t2 - t1) / (w2 - w1)
        if per_step <= 0:
            continue  # stall-inverted rep: skip, never clamp into best-of
        best = max(best, batch / per_step)
    print(f"batch={batch:6d} cap=2^{cap.bit_length()-1:2d} "
          f"-> {best/1e3:9.1f}k ex/s ({1e3*batch/best:7.2f} ms/step)",
          flush=True)
    return best


if __name__ == "__main__":
    import sys

    proxy = "--proxy" in sys.argv
    for b in (2048, 4096, 8192, 16384):
        measure(b, proxy=proxy)
    # capacity scaling at fixed batch (no growth: fixed 2^22 then 2^24)
    for cap in (2 ** 22, 2 ** 24):
        measure(2048, grow=False, capacity=cap, proxy=proxy)
