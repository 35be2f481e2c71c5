#!/usr/bin/env python
"""Decompose the dense apply's capacity-proportional cost (round 4).

The compact (touched-set) apply LOST 2.5-3.5x everywhere in
apply_compact_ab.py — per-row gather/scatter issue costs dominate.  This
harness asks what the dense apply actually pays at the batch-16384
regression point, interleaved in one process:

  * scatter (stream vs xla) at N=426k, cap 2^21
  * dense update+mask pass alone at cap 2^21 vs cap 2^20 (same N)
  * full dlrm train_step at batch 16384 with capacity forced 2^20 vs 2^21
  * small-batch/huge-table regime: batch 512 on a 2^22-cap table,
    dense vs compact (the only regime compact might win)

Run: PYTHONPATH=/root/repo:$PYTHONPATH nohup python -u \
     benchmarks/apply_dense_ablate.py > /tmp/apply_dense_ablate.log 2>&1 &
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from deeprec_tpu.data.synthetic import SyntheticCriteo
    from deeprec_tpu.models import base, dlrm
    from deeprec_tpu.ops import segment_scatter
    from deeprec_tpu.optimizers import sparse
    from deeprec_tpu.train.loop import Trainer

    D = 16
    rng = np.random.RandomState(7)

    def window_fn(f, reps=3):
        _ = float(f())
        out = []
        for _r in range(reps):
            t0 = time.perf_counter()
            r = None
            k = 4
            for _ in range(k):
                r = f()
            _ = float(r)
            est = (time.perf_counter() - t0) / k
            w1 = max(4, int(0.3 / max(est, 1e-5)))

            def win(n):
                t0 = time.perf_counter()
                rr = None
                for _ in range(n):
                    rr = f()
                _ = float(rr)
                return time.perf_counter() - t0

            t1 = win(w1)
            t2 = win(4 * w1)
            out.append(round((t2 - t1) / (3 * w1) * 1e3, 3))
        return sorted(out)

    # ---- isolated pieces at N=426k ids, caps 2^20/2^21 --------------------
    N = 16384 * 26
    for cap_log in (20, 21):
        cap = 1 << cap_log
        # production-like dst: ~62% live slot density (matches the settled
        # dlrm16384 table), uniform random unique pattern
        dst = jnp.asarray(rng.randint(0, int(cap * 0.62), size=N), jnp.int32)
        rows = jnp.asarray(rng.randn(N, D), jnp.float32)
        p = jnp.asarray(rng.randn(cap, D), jnp.float32)
        a = jnp.abs(jnp.asarray(rng.randn(cap, D), jnp.float32)) + 0.1

        @jax.jit
        def f_scatter_stream(dst, rows):
            return jnp.sum(segment_scatter.scatter_add_rows(
                dst, rows, cap, _force="stream")[:, 0])

        @jax.jit
        def f_scatter_xla(dst, rows):
            return jnp.sum(segment_scatter.scatter_add_rows(
                dst, rows, cap, _force="xla")[:, 0])

        @jax.jit
        def f_update(p, a, dst, rows):
            g = segment_scatter.scatter_add_rows(dst, rows, cap,
                                                 _force="xla")
            cnt = jnp.zeros((cap,), jnp.int32).at[dst].add(1, mode="drop")
            m = (cnt > 0)[:, None]
            a2 = a + jnp.square(g)
            p2 = p - 0.05 * g * jax.lax.rsqrt(a2 + 1e-10)
            return jnp.sum(jnp.where(m, p2, p)[:, 0]) + jnp.sum(
                jnp.where(m, a2, a)[:, 0])

        @jax.jit
        def f_update_only(p, a, g, cnt):
            m = (cnt > 0)[:, None]
            a2 = a + jnp.square(g)
            p2 = p - 0.05 * g * jax.lax.rsqrt(a2 + 1e-10)
            return jnp.sum(jnp.where(m, p2, p)[:, 0]) + jnp.sum(
                jnp.where(m, a2, a)[:, 0])

        g_pre = jax.jit(lambda d, r: segment_scatter.scatter_add_rows(
            d, r, cap, _force="xla"))(dst, rows)
        cnt_pre = jnp.zeros((cap,), jnp.int32).at[dst].add(1, mode="drop")
        for name, f in [
            ("scatter_stream", lambda: f_scatter_stream(dst, rows)),
            ("scatter_xla", lambda: f_scatter_xla(dst, rows)),
            ("scatter+update+mask", lambda: f_update(p, a, dst, rows)),
            ("update_mask_only", lambda: f_update_only(p, a, g_pre, cnt_pre)),
        ]:
            ms = window_fn(f)
            print(json.dumps({"cap_log": cap_log, "n": N, "piece": name,
                              "ms": ms, "med": ms[1]}), flush=True)

    # ---- full dlrm16384 step with capacity pinned 2^20 vs 2^21 ------------
    cases = {}
    for cap_log in (20, 21):
        model = dlrm.MODEL
        tables = base.make_tables(model, capacity=1 << cap_log)
        tr = Trainer(model=model, tables=tables,
                     sparse_optimizer=sparse.adagrad(lr=0.05),
                     dense_tx=optax.adagrad(0.05), bf16=True)
        state = tr.init_state(jax.random.PRNGKey(0))
        gen = SyntheticCriteo(batch_size=16384, num_ids_per_col=1_000_000,
                              seed=1)
        batches = [jax.device_put(gen.sample(rng)) for _ in range(4)]
        m = None
        for i in range(10):
            state, m = tr.train_step(state, batches[i % 4])
        _ = float(m["loss"])
        cases[f"dlrm16384_cap{cap_log}"] = (tr, state, batches)

    # ---- small-batch / huge-table: dense vs compact ------------------------
    for strat in ("dense", "compact"):
        model = dlrm.MODEL
        tables = base.make_tables(model, capacity=1 << 22)
        tr = Trainer(model=model, tables=tables,
                     sparse_optimizer=sparse.adagrad(lr=0.05),
                     dense_tx=optax.adagrad(0.05), bf16=True,
                     apply_strategy=strat)
        state = tr.init_state(jax.random.PRNGKey(0))
        gen = SyntheticCriteo(batch_size=512, num_ids_per_col=1_000_000,
                              seed=1)
        batches = [jax.device_put(gen.sample(rng)) for _ in range(8)]
        m = None
        for i in range(10):
            state, m = tr.train_step(state, batches[i % 8])
        _ = float(m["loss"])
        cases[f"dlrm512_cap22_{strat}"] = (tr, state, batches)

    def step_window(key):
        def f():
            tr, state, batches = cases[key]
            mm = None
            # one call = one step; slope harness loops it
            state, mm = tr.train_step(state, batches[0])
            cases[key] = (tr, state, batches)
            return mm["loss"]
        return f

    res = {}
    for rep in range(3):
        for key in cases:
            ms = window_fn(step_window(key), reps=1)
            res.setdefault(key, []).append(ms[0])
            print(json.dumps({"case": key, "rep": rep, "ms": ms[0]}),
                  flush=True)
    print("== summary ==", flush=True)
    for key, v in sorted(res.items()):
        v = sorted(v)
        print(json.dumps({"case": key, "ms": v, "med": v[1]}), flush=True)


if __name__ == "__main__":
    main()
