#!/usr/bin/env python
"""Interleaved in-step A/B: collect's admitted-select no-op skip (round 4).

When a table has no counter filter and default_value_no_permission == 0,
the `where(admitted, vals, dvnp)` in _collect is a provable no-op (missing
slots already read 0 through the gather fill) — round-4 skips it, removing
a [N, D] elementwise pass in the forward AND its mirror select in the
backward.  This measures the full train_step both ways, interleaved in one
process (CLAUDE.md measurement rules), per model.

Run: PYTHONPATH=/root/repo:$PYTHONPATH nohup python -u \
     benchmarks/select_ab.py > /tmp/select_ab.log 2>&1 &
"""

import dataclasses
import json
import time

import numpy as np


def build(name, seq=50):
    import jax
    import jax.numpy as jnp
    import optax

    from deeprec_tpu.data.behavior import SyntheticBehavior
    from deeprec_tpu.data.synthetic import SyntheticCriteo
    from deeprec_tpu.models import base, get_model
    from deeprec_tpu.optimizers import sparse
    from deeprec_tpu.train.loop import Trainer

    model = get_model(name)
    if name in ("din", "dien"):
        specs = {n: dataclasses.replace(s, seq_len=seq)
                 for n, s in model.table_specs.items()}
        model = dataclasses.replace(model, table_specs=specs)
        gen = SyntheticBehavior(batch_size=2048, num_items=200_000,
                                num_categories=1000, seq_len=seq, seed=1)
    else:
        gen = SyntheticCriteo(batch_size=2048, num_ids_per_col=1_000_000,
                              seed=1)
    tr = Trainer(model=model, tables=base.make_tables(model),
                 sparse_optimizer=sparse.adagrad(lr=0.05),
                 dense_tx=optax.adagrad(0.05), bf16=True)
    state = tr.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(7)
    batches = [jax.device_put(gen.sample(rng)) for _ in range(8)]
    for i in range(30):
        state, m = tr.train_step(state, batches[i % 8])
        if i % 5 == 4:
            state = tr.maybe_grow(state)
    _ = float(m["loss"])
    return tr, state, batches


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from deeprec_tpu.embedding import table as ev
    from deeprec_tpu.models import base, get_model
    from deeprec_tpu.optimizers import sparse
    from deeprec_tpu.train.loop import Trainer

    for name in ("din", "dien", "dlrm"):
        tr_fast, state, batches = build(name)

        # second trainer traces with the select FORCED back in
        tr_sel = Trainer(model=tr_fast.model,
                         tables={n: t for n, t in state.tables.items()},
                         sparse_optimizer=sparse.adagrad(lr=0.05),
                         dense_tx=optax.adagrad(0.05), bf16=True)

        def mk_run(tr):
            st = {"s": jax.tree.map(
                lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x,
                state)}

            def run(i):
                st["s"], m = tr.train_step(st["s"], batches[i % 8])
                return m["loss"]
            return run

        # Flag is read at TRACE time; the module-level ev.collect jit cache
        # must be cleared so tr_sel's trace does not reuse the fast entry.
        # tr_fast's step was already compiled during build()'s warmup, so it
        # keeps the fast path regardless.
        ev._FORCE_COLLECT_SELECT = True
        ev.collect.clear_cache()
        run_sel = mk_run(tr_sel)
        _ = float(run_sel(0))
        ev._FORCE_COLLECT_SELECT = False
        ev.collect.clear_cache()
        run_fast = mk_run(tr_fast)
        _ = float(run_fast(0))

        def window(f, n):
            t0 = time.perf_counter()
            r = None
            for i in range(n):
                r = f(i)
            _ = float(r)
            return time.perf_counter() - t0

        res = {"select": [], "fast": []}
        for rep in range(3):
            for key, f in (("select", run_sel), ("fast", run_fast)):
                est = window(f, 4) / 4
                w1 = max(4, int(0.3 / max(est, 1e-5)))
                t1 = window(f, w1)
                t2 = window(f, 4 * w1)
                res[key].append(round((t2 - t1) / (3 * w1) * 1e3, 3))
        out = {"model": name}
        for k, v in res.items():
            v = sorted(v)
            out[k + "_ms"] = v
            out[k + "_med"] = v[1]
        out["speedup"] = round(out["select_med"] / out["fast_med"], 3)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
