#!/usr/bin/env python
"""Apply-path ablation at the real DIN state (follow-up to din_ablate.py:
apply ~4.9 ms is the biggest component post-fold).  Times the stream
scatter's internal stages in isolation, interleaved in one process:

  argsort     — jnp.argsort(dst) over the 209k slot ids
  permute     — dst[order] + rows[order] (the [N, 32] grad permute)
  aug         — the [N, 128] augmented-array build
  scatter     — full scatter_add_rows (stream kernel incl. prep)
  scatter_xla — the plain XLA scatter-add (the op the kernel replaced)

Run: PYTHONPATH=/root/repo:$PYTHONPATH nohup python -u \
     benchmarks/apply_ablate.py > /tmp/apply_ablate.log 2>&1 &
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
    from deeprec_tpu.ops import segment_scatter
    from deeprec_tpu.optimizers import sparse
    from deeprec_tpu.train.loop import Trainer

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
    for i in range(30):
        state, m = tr.train_step(state, batches[i % 8])
        if i % 5 == 4:
            state = tr.maybe_grow(state)
    _ = float(m["loss"])
    t = next(iter(state.tables.values()))
    cap = int(t.keys.shape[0])
    print(json.dumps({"capacity": cap, "size": int(t.size)}), flush=True)

    # production dst/rows: a real batch's slot ids + synthetic grads
    from benchmarks.din_ablate import __name__ as _  # noqa: F401 (path sanity)
    from deeprec_tpu.embedding import group as grp

    pname = list(state.tables)[0]
    pspec = tr.plan.physical[pname]
    batch = batches[0]
    parts = []
    for lname, fidx in pspec.members:
        spec = model.table_specs[lname]
        for col in [spec.feature or lname] + list(spec.shared_features):
            ids = batch["cat"][col].reshape(-1)
            if len(pspec.members) > 1:
                ids = grp.group_key(ids, fidx, pspec.id_bits, int(t.empty))
            parts.append(ids)
    flat = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
    _, lk = ev.lookup_phase(t, flat, step=99, train=False)
    dst = jnp.where(lk.slot_ids < cap, lk.slot_ids, cap).astype(jnp.int32)
    dst = jax.device_put(dst)
    n = int(dst.shape[0])
    d = t.dim
    rows = jax.device_put(jnp.asarray(
        np.random.RandomState(3).randn(n, d), jnp.float32))
    print(json.dumps({"n": n, "d": int(d)}), flush=True)

    @jax.jit
    def f_sort(dst):
        return jnp.sum(jnp.argsort(dst))

    @jax.jit
    def f_permute(dst, rows):
        o = jnp.argsort(dst)
        return jnp.sum(dst[o]) + jnp.sum(rows[o][:, 0])

    @jax.jit
    def f_aug(dst, rows):
        o = jnp.argsort(dst)
        sdst, srows = dst[o], rows[o]
        aug = jnp.concatenate(
            [srows, sdst[:, None].astype(jnp.float32),
             jnp.zeros((n, 128 - d - 1), jnp.float32)], axis=1)
        return jnp.sum(aug[:, d]) + jnp.sum(aug[:, 0])

    @jax.jit
    def f_scatter(dst, rows):
        out = segment_scatter.scatter_add_rows(dst, rows, cap)
        return jnp.sum(out[:, 0])

    @jax.jit
    def f_scatter_xla(dst, rows):
        out = segment_scatter.scatter_add_rows(dst, rows, cap, _force="xla")
        return jnp.sum(out[:, 0])

    fns = {"argsort": lambda: f_sort(dst),
           "permute": lambda: f_permute(dst, rows),
           "aug": lambda: f_aug(dst, rows),
           "scatter": lambda: f_scatter(dst, rows),
           "scatter_xla": lambda: f_scatter_xla(dst, rows)}
    for f in fns.values():
        _ = float(f())

    def window(f, k):
        t0 = time.perf_counter()
        r = None
        for _ in range(k):
            r = f()
        _ = float(r)
        return time.perf_counter() - t0

    res = {}
    for rep in range(3):
        for name, f in fns.items():
            est = window(f, 4) / 4
            w1 = max(4, int(0.3 / max(est, 1e-5)))
            t1 = window(f, w1)
            t2 = window(f, 4 * w1)
            res.setdefault(name, []).append(
                round((t2 - t1) / (3 * w1) * 1e3, 3))
    for k, v in res.items():
        v = sorted(v)
        print(json.dumps({"stage": k, "ms": v, "med": v[1]}), flush=True)


if __name__ == "__main__":
    main()
