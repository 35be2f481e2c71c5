"""Checkpoint write-path benchmark: monolithic vs sharded-bundle saves.

Fabricates a large half-full table directly (the save path only walks live
rows), then times:
  * monolithic save_table (r1 path: one thread, one npz)
  * bundled save_table (num_bundles=8: parallel permute+write)
  * AsyncCheckpointer blocking time (what the training thread actually pays)

Run on the CPU backend: `JAX_PLATFORMS=cpu python benchmarks/ckpt_bench.py`.
Results recorded in PERF.md.
"""

import os
import shutil
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

from deeprec_tpu import config as cfg
from deeprec_tpu.embedding import table as ev
from deeprec_tpu.optimizers import sparse
from deeprec_tpu.train import saver

CAP = 2 ** 24          # 16.8M slots (scale chosen to keep a run ~5 min; ratios are scale-free)
FILL = 0.5             # 16.8M live rows
DIM = 16
OUT = "/tmp/ckpt_bench"


def build_table():
    t = ev.create("big", dim=DIM, capacity=CAP,
                  option=cfg.EmbeddingVariableOption())
    t = sparse.adagrad(lr=0.1).init(t)
    rng = np.random.RandomState(0)
    live = rng.rand(CAP) < FILL
    keys = np.where(live, rng.randint(1, 2 ** 31, CAP), int(t.empty))
    t = t.replace(
        keys=jnp.asarray(keys, t.key_dtype),
        values=jnp.asarray(rng.rand(CAP, DIM).astype(np.float32)),
        slots={"accum": jnp.asarray(rng.rand(CAP, DIM).astype(np.float32))},
        size=jnp.asarray(int(live.sum()), jnp.int32),
    )
    return t, int(live.sum())


def main():
    t, n_live = build_table()
    print(f"table: {n_live/1e6:.1f}M live rows of {CAP/1e6:.1f}M slots, "
          f"dim {DIM} + adagrad slot", flush=True)
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT)

    def timed(label, fn):
        os.sync()           # no pollution from the previous run's dirty pages
        t0 = time.perf_counter()
        fn()
        t_cpu = time.perf_counter() - t0   # export+permute+serialize+write()
        os.sync()
        t_dur = time.perf_counter() - t0   # ...through to durable on disk
        print(f"{label}: cpu+write {t_cpu:.1f}s, durable {t_dur:.1f}s",
              flush=True)
        return t_cpu, t_dur

    t_mono = min(timed("monolithic save",
                       lambda: saver.save_table(
                           os.path.join(OUT, "mono.npz"), t))[0]
                 for _ in range(2))
    sz = os.path.getsize(os.path.join(OUT, "mono.npz")) / 2 ** 30
    print(f"  ({sz:.2f} GiB)", flush=True)

    for nb in (4, 8, 16):
        dt = min(timed(f"bundled save (nb={nb})",
                       lambda nb=nb: saver.save_table(
                           os.path.join(OUT, f"bund{nb}.npz"), t,
                           num_bundles=nb))[0]
                 for _ in range(2))
        print(f"  cpu-side speedup {t_mono/dt:.2f}x", flush=True)

    # async: what does the TRAINING THREAD pay?
    class FakeState:
        pass

    import dataclasses

    @jax.tree_util.register_pytree_node_class
    class S:
        def __init__(self, tables, params, opt_state, auc, step):
            self.tables, self.params = tables, params
            self.opt_state, self.auc, self.step = opt_state, auc, step

        def tree_flatten(self):
            return ((self.tables, self.params, self.opt_state, self.auc,
                     self.step), None)

        @classmethod
        def tree_unflatten(cls, aux, ch):
            return cls(*ch)

    st = S({"big": t}, {}, {}, {}, jnp.asarray(7, jnp.int32))
    ac = saver.AsyncCheckpointer()
    t0 = time.perf_counter()
    fut = ac.save(os.path.join(OUT, "async"), st, num_bundles=8)
    t_block = time.perf_counter() - t0
    t0 = time.perf_counter()
    fut.result()
    t_bg = time.perf_counter() - t0
    ac.close()
    print(f"async save: training thread blocked {t_block:.2f}s "
          f"(snapshot copy); background completed in {t_bg:.1f}s", flush=True)
    shutil.rmtree(OUT, ignore_errors=True)


if __name__ == "__main__":
    main()
