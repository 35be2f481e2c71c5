#!/usr/bin/env python
"""DIN step ablation at the REAL trained state (round 3c re-baseline).

Trains DIN exactly like modelzoo_bench (batch 2048, seq 50, growth on),
then times each engine phase in isolation on the final table state and
a production batch — all interleaved in one process:

  train_step   — the full step (reference point)
  lookup_t     — lookup_phase(train=True) per physical table, summed
  lookup_e     — lookup_phase(train=False)
  collect      — row gather for the looked-up positions
  apply        — sparse optimizer apply (stream scatter + update math)
  fwdbwd       — model forward+backward at fixed activations (no engine)

Run: PYTHONPATH=/root/repo:$PYTHONPATH nohup python -u \
     benchmarks/din_ablate.py > /tmp/din_ablate.log 2>&1 &
"""

import dataclasses
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from deeprec_tpu.data.behavior import SyntheticBehavior
    from deeprec_tpu.embedding import table as ev
    from deeprec_tpu.models import base, get_model
    from deeprec_tpu.optimizers import sparse
    from deeprec_tpu.train.loop import Trainer, make_features

    SEQ = 50
    model = get_model("din")
    specs = {n: dataclasses.replace(s, seq_len=SEQ)
             for n, s in model.table_specs.items()}
    model = dataclasses.replace(model, table_specs=specs)
    gen = SyntheticBehavior(batch_size=2048, num_items=200_000,
                            num_categories=1000, seq_len=SEQ, seed=1)
    tables = base.make_tables(model)
    opt = sparse.adagrad(lr=0.05)
    tr = Trainer(model=model, tables=tables, sparse_optimizer=opt,
                 dense_tx=optax.adagrad(0.05), bf16=True)
    state = tr.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(7)
    batches = [jax.device_put(gen.sample(rng)) for _ in range(8)]
    for i in range(30):  # warm up + grow to steady state
        state, m = tr.train_step(state, batches[i % 8])
        if i % 5 == 4:
            state = tr.maybe_grow(state)
    _ = float(m["loss"])
    for n, t in state.tables.items():
        print(json.dumps({"table": n, "capacity": int(t.keys.shape[0]),
                          "size": int(t.size)}), flush=True)

    batch = batches[0]
    feats = make_features(model, batch)
    # flatten each physical table's step ids exactly as the engine does
    plan = tr.plan
    from deeprec_tpu.embedding import group as grp

    def phys_ids(pname):
        pspec = plan.physical[pname]
        parts = []
        for lname, fidx in pspec.members:
            spec = model.table_specs[lname]
            for col in [spec.feature or lname] + list(spec.shared_features):
                ids = batch["cat"][col].reshape(-1)
                if len(pspec.members) > 1:
                    ids = grp.group_key(ids, fidx, pspec.id_bits,
                                        int(state.tables[pname].empty))
                parts.append(ids)
        return jnp.concatenate(parts) if len(parts) > 1 else parts[0]

    ids_by_table = {n: phys_ids(n) for n in state.tables}
    print(json.dumps({"ids_per_step": int(sum(v.shape[0]
          for v in ids_by_table.values()))}), flush=True)

    @jax.jit
    def f_lookup_t(tables, step):
        acc = jnp.float32(0)
        for n, t in tables.items():
            t2, lk = ev.lookup_phase(t, ids_by_table[n], step=step, train=True)
            acc += jnp.sum(lk.slot_ids) + jnp.sum(t2.freqs)
        return acc

    @jax.jit
    def f_lookup_e(tables, step):
        acc = jnp.float32(0)
        for n, t in tables.items():
            _, lk = ev.lookup_phase(t, ids_by_table[n], step=step, train=False)
            acc += jnp.sum(lk.slot_ids)
        return acc

    @jax.jit
    def f_collect(tables, step):
        acc = jnp.float32(0)
        for n, t in tables.items():
            _, lk = ev.lookup_phase(t, ids_by_table[n], step=step, train=False)
            rows = ev.collect(t, lk)
            acc += jnp.sum(rows)
        return acc

    @jax.jit
    def f_apply(tables, step):
        acc = jnp.float32(0)
        for n, t in tables.items():
            t2, lk = ev.lookup_phase(t, ids_by_table[n], step=step, train=True)
            g = jnp.ones((lk.uids.shape[0], t.dim), t.value_dtype) * 1e-6
            t3 = opt.apply(t2, lk, g, step=step)
            acc += jnp.sum(t3.values[0]) + jnp.sum(t3.slots["accumulator"][0])
        return acc

    def f_step_factory():
        # private buffer copy: train_step donates its input state, which
        # would delete the buffers the isolated fns still read
        st = {"s": jax.tree.map(
            lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x, state)}

        def run(step):
            st["s"], m = tr.train_step(st["s"], batches[int(step) % 8])
            return m["loss"]
        return run

    f_step = f_step_factory()

    fns = {
        "lookup_e": lambda s: f_lookup_e(state.tables, s),
        "lookup_t": lambda s: f_lookup_t(state.tables, s),
        "collect": lambda s: f_collect(state.tables, s),
        "lkp+apply": lambda s: f_apply(state.tables, s),
        "train_step": f_step,
    }
    for f in fns.values():
        _ = float(f(1))

    def window(f, n, s0):
        t0 = time.perf_counter()
        r = None
        for i in range(n):
            r = f(s0 + i)
        _ = float(r)
        return time.perf_counter() - t0

    res = {}
    for rep in range(3):
        for name, f in fns.items():
            est = window(f, 4, 100) / 4
            w1 = max(4, int(0.3 / max(est, 1e-5)))
            t1 = window(f, w1, 200)
            t2 = window(f, 4 * w1, 200)
            res.setdefault(name, []).append(
                round((t2 - t1) / (3 * w1) * 1e3, 3))
    for k, v in res.items():
        v = sorted(v)
        print(json.dumps({"phase": k, "ms": v, "med": v[1]}), flush=True)


if __name__ == "__main__":
    main()
