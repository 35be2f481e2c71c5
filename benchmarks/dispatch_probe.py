"""Where does the batch-2048 step time go? Dispatch vs device compute.

Measures: (a) pipelined per-step dispatch (the bench number), (b) K-step
unrolled jit (one dispatch per K steps), (c) lax.scan over K steps.
"""
import time, json
import numpy as np
import jax, jax.numpy as jnp, optax
from deeprec_tpu.data.synthetic import SyntheticCriteo
from deeprec_tpu.models import base, dlrm
from deeprec_tpu.optimizers import sparse
from deeprec_tpu.train.loop import Trainer

BATCH = 2048
N = 32

model = dlrm.MODEL
tables = base.make_tables(model, capacity=2 ** 22)
trainer = Trainer(model=model, tables=tables,
                  sparse_optimizer=sparse.adagrad(lr=0.05),
                  dense_tx=optax.adagrad(0.05), bf16=True)
state = trainer.init_state(jax.random.PRNGKey(0))
gen = SyntheticCriteo(batch_size=BATCH, num_ids_per_col=1_000_000, seed=1)
rng = np.random.RandomState(7)
batches = [jax.device_put(gen.sample(rng)) for _ in range(N)]

# settle occupancy: one pass over all batches
for i in range(N):
    state, _ = trainer.train_step(state, batches[i])
jax.block_until_ready(state.step)

def timeit(fn, steps_per_call, calls, label):
    best = None
    for w in range(3):
        t0 = time.perf_counter()
        fn(calls)
        dt = time.perf_counter() - t0
        v = BATCH * steps_per_call * calls / dt
        best = v if best is None else max(best, v)
    print(f"{label}: {best/1e6:.2f}M ex/s  ({1e6*BATCH*steps_per_call*calls/best/ (steps_per_call*calls):.0f} us/step)", flush=True)
    return best

# (a) per-step dispatch
def run_a(calls):
    global state
    for i in range(calls):
        state, _ = trainer.train_step(state, batches[i % N])
    jax.block_until_ready(state.step)
timeit(run_a, 1, 200, "per-step dispatch")

# (b) K-step unrolled jit
K = 8
def k_step(state, bs):
    for i in range(K):
        b = jax.tree.map(lambda x: x[i], bs)
        state, m = trainer._train_step_impl(state, b)
    return state, m
k_jit = jax.jit(k_step, donate_argnums=(0,))
stacked = [jax.tree.map(lambda *xs: jnp.stack(xs), *batches[i*K:(i+1)*K]) for i in range(N // K)]
state, _ = k_jit(state, stacked[0])  # compile
jax.block_until_ready(state.step)
def run_b(calls):
    global state
    for i in range(calls):
        state, _ = k_jit(state, stacked[i % len(stacked)])
    jax.block_until_ready(state.step)
timeit(run_b, K, 25, "8-step unrolled jit")

# (c) lax.scan over K steps
def scan_step(state, b):
    state, m = trainer._train_step_impl(state, b)
    return state, m["loss"]
def scan_k(state, bs):
    return jax.lax.scan(scan_step, state, bs)
scan_jit = jax.jit(scan_k, donate_argnums=(0,))
state, _ = scan_jit(state, stacked[0])
jax.block_until_ready(state.step)
def run_c(calls):
    global state
    for i in range(calls):
        state, _ = scan_jit(state, stacked[i % len(stacked)])
    jax.block_until_ready(state.step)
timeit(run_c, K, 25, "8-step lax.scan")
print("done", flush=True)
