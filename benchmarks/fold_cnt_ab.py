#!/usr/bin/env python
"""Interleaved A/B: folded slot-count plane (lookup-phase scatter reused by
the sparse apply) vs the round-2 two-scatter formulation.

Variant B ("old") is produced by stripping ``Lookup.slot_counts`` right
after the lookup phase, which forces the apply back onto its own 209k-lane
scalar scatter.  (B differs from the true round-2 code by one [C]
elementwise add — the freq plane now updates as ``freqs + plane`` instead
of scattering directly into freqs — ~0.05 ms at C=524k, noted in PERF.md.)

Run on the TPU in background:
  nohup python benchmarks/fold_cnt_ab.py > /tmp/fold_ab.log 2>&1 &
"""

import dataclasses
import json
import time

import numpy as np


def build(name, batch, strip, seq_len=50):
    import jax
    import optax

    from deeprec_tpu.data.behavior import SyntheticBehavior
    from deeprec_tpu.data.synthetic import SyntheticCriteo
    from deeprec_tpu.embedding import table as ev
    from deeprec_tpu.models import base, get_model
    from deeprec_tpu.optimizers import sparse
    from deeprec_tpu.train.loop import Trainer

    model = get_model(name)
    if name in ("din", "dien", "bst"):
        specs = {n: dataclasses.replace(s, seq_len=seq_len)
                 for n, s in model.table_specs.items()}
        model = dataclasses.replace(model, table_specs=specs)
        gen = SyntheticBehavior(batch_size=batch, num_items=200_000,
                                num_categories=1000, seq_len=seq_len, seed=1)
    else:
        gen = SyntheticCriteo(batch_size=batch, num_ids_per_col=1_000_000,
                              seed=1)

    tables = base.make_tables(model, capacity=2 ** 16)
    trainer = Trainer(model=model, tables=tables,
                      sparse_optimizer=sparse.adagrad(lr=0.05),
                      dense_tx=optax.adagrad(0.05), bf16=True)

    if strip:
        real = ev.lookup_phase

        def stripped(table, ids, **kw):
            t, lk = real(table, ids, **kw)
            return t, lk.replace(slot_counts=None)

        # trace-time patch: this trainer's jit inlines the patched callable
        import deeprec_tpu.embedding.table as tmod
        old = tmod.lookup_phase
        tmod.lookup_phase = stripped
        try:
            state = trainer.init_state(jax.random.PRNGKey(0))
            rng = np.random.RandomState(7)
            batches = [jax.device_put(gen.sample(rng)) for _ in range(8)]
            for i in range(6):          # force the trace under the patch
                state, m = trainer.train_step(state, batches[i % 8])
            _ = float(m["loss"])
        finally:
            tmod.lookup_phase = old
        return trainer, state, batches

    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(7)
    batches = [jax.device_put(gen.sample(rng)) for _ in range(8)]
    for i in range(6):
        state, m = trainer.train_step(state, batches[i % 8])
    _ = float(m["loss"])
    return trainer, state, batches


def measure(name, batch=2048):
    import jax  # noqa: F401

    a = build(name, batch, strip=False)   # folded (new)
    b = build(name, batch, strip=True)    # two scatters (old)

    def window(tsb, n):
        trainer, state, batches = tsb
        m = None
        t0 = time.perf_counter()
        for i in range(n):
            state, m = trainer.train_step(state, batches[i % 8])
        _ = float(m["loss"])
        return time.perf_counter() - t0, (trainer, state, batches)

    # probe for window size
    est, a = window(a, 8)
    _, b = window(b, 8)
    w1 = max(8, int(0.8 / max(est / 8, 1e-5)))
    w2 = 4 * w1
    res = {"fold": [], "twoscatter": []}
    for rep in range(3):
        for key, tsb in (("fold", a), ("twoscatter", b)):
            t1, tsb = window(tsb, w1)
            t2, tsb = window(tsb, w2)
            per = (t2 - t1) / (w2 - w1)
            res[key].append(per * 1e3)
            if key == "fold":
                a = tsb
            else:
                b = tsb
    out = {
        "model": name, "batch": batch, "w1": w1,
        "fold_ms": [round(x, 3) for x in res["fold"]],
        "twoscatter_ms": [round(x, 3) for x in res["twoscatter"]],
        "fold_med": round(sorted(res["fold"])[1], 3),
        "twoscatter_med": round(sorted(res["twoscatter"])[1], 3),
    }
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    import sys
    models = sys.argv[1].split(",") if len(sys.argv) > 1 else ["din", "dlrm"]
    for m in models:
        measure(m)
