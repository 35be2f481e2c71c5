#!/usr/bin/env python
"""Collect-phase strategy ablation at the REAL trained DIN state.

Round-4 attack on the sequence-model floor (VERDICT r3 #2): collect is a
[209k, 32] random row gather from a [262k, 32] HBM table — issue-bound at
~11 ns/row (PERF.md round-3c).  The bucket-probe gather of the SAME shape
costs ~3 ns/row because its source (the [8k, 32] key-bucket array, ~1 MB)
stays cache/VMEM-resident.  Hypothesis: dedup to ~65k unique rows, gather
those from HBM, then EXPAND positions from the compact (padded-2^17,
16 MB) array — the expansion's source may be resident, making the second
pass cheap.  Also measures whether the per-position slot_counts scatter
(~1.3 ms, train-only) can ride the same sort as run-length aggregation at
unique volume.

All interleaved in one process (CLAUDE.md measurement rules), medians of 3:

  gather_plain   rows = values[slots]                      (today's collect)
  gather_sorted  argsort slots -> gather -> inverse-permute
  gather_dedup   sort -> run heads -> compact uniques -> HBM gather [U]
                 -> expand via gather from the compact array
  cnt_scatter    zeros[C].at[slots].add(1)                 (today's counts)
  cnt_runs       counts from run lengths on the sorted ids + 65k scatter

Run: PYTHONPATH=/root/repo:$PYTHONPATH nohup python -u \
     benchmarks/collect_ab.py > /tmp/collect_ab.log 2>&1 &
"""

import dataclasses
import functools
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
    from deeprec_tpu.train.loop import Trainer

    SEQ = 50
    model = get_model("din")
    specs = {n: dataclasses.replace(s, seq_len=SEQ)
             for n, s in model.table_specs.items()}
    model = dataclasses.replace(model, table_specs=specs)
    gen = SyntheticBehavior(batch_size=2048, num_items=200_000,
                            num_categories=1000, seq_len=SEQ, seed=1)
    tr = Trainer(model=model, tables=base.make_tables(model),
                 sparse_optimizer=sparse.adagrad(lr=0.05),
                 dense_tx=optax.adagrad(0.05), bf16=True)
    state = tr.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(7)
    batches = [jax.device_put(gen.sample(rng)) for _ in range(8)]
    for i in range(24):
        state, m = tr.train_step(state, batches[i % 8])
        if i % 6 == 5:
            state = tr.maybe_grow(state)
    _ = float(m["loss"])

    # the big physical table + the production position->slot mapping
    name = max(state.tables, key=lambda n: state.tables[n].capacity)
    t = state.tables[name]
    C = t.capacity
    ids = []
    b = batches[0]
    for spec in model.table_specs.values():
        feats = [spec.feature or spec.name] + list(spec.shared_features)
        for f in feats:
            if f in b["cat"]:
                ids.append(np.asarray(b["cat"][f]).reshape(-1))
    flat = np.concatenate(ids)
    print(json.dumps({"positions": int(flat.size), "cap": int(C)}),
          flush=True)
    slots_host = None

    lkt, lk = ev.lookup_phase(t, jnp.asarray(
        np.where(flat == np.iinfo(np.int32).min, 0, flat), t.key_dtype),
        step=100, train=False)
    slots = jnp.where(lk.slot_ids < C, lk.slot_ids, 0).astype(jnp.int32)
    N = int(slots.shape[0])
    U_PAD = 1 << int(np.ceil(np.log2(max(N // 2, 1))))
    vals = t.values

    @jax.jit
    def gather_plain(slots):
        return vals[slots]

    @jax.jit
    def gather_sorted(slots):
        perm = jnp.argsort(slots)
        rows = vals[slots[perm]]
        inv = jnp.zeros_like(perm).at[perm].set(jnp.arange(N, dtype=perm.dtype))
        return rows[inv]

    @jax.jit
    def gather_dedup(slots):
        order = jnp.argsort(slots)
        s = slots[order]
        head = jnp.concatenate([jnp.ones((1,), jnp.bool_), s[1:] != s[:-1]])
        uidx = jnp.cumsum(head) - 1                      # run index per pos
        # compact unique slot list (padded to U_PAD; tail gathers row 0)
        comp = jnp.zeros((U_PAD,), jnp.int32).at[
            jnp.where(head, uidx, U_PAD)].set(s, mode="drop")
        urows = vals[comp]                               # [U_PAD, D] HBM pass
        rows_sorted = urows[uidx]                        # compact-source pass
        inv = jnp.zeros_like(order).at[order].set(
            jnp.arange(N, dtype=order.dtype))
        return rows_sorted[inv]

    @jax.jit
    def cnt_scatter(slots):
        return jnp.zeros((C,), jnp.int32).at[slots].add(1)

    @jax.jit
    def cnt_runs(slots):
        order = jnp.argsort(slots)
        s = slots[order]
        head = jnp.concatenate([jnp.ones((1,), jnp.bool_), s[1:] != s[:-1]])
        uidx = jnp.cumsum(head) - 1
        runs = jnp.zeros((U_PAD,), jnp.int32).at[
            jnp.where(head, uidx, U_PAD)].set(
                jnp.arange(N, dtype=jnp.int32), mode="drop")
        nuniq = jnp.sum(head.astype(jnp.int32))
        idxs = jnp.arange(U_PAD, dtype=jnp.int32)
        nxt = jnp.concatenate([runs[1:], jnp.zeros((1,), jnp.int32)])
        ends = jnp.where(idxs + 1 < nuniq, nxt, N)
        length = jnp.where(idxs < nuniq, ends - runs, 0)
        comp = jnp.zeros((U_PAD,), jnp.int32).at[
            jnp.where(head, uidx, U_PAD)].set(s, mode="drop")
        return jnp.zeros((C,), jnp.int32).at[comp].add(length, mode="drop")

    # parity first
    want = np.asarray(gather_plain(slots))
    for f in (gather_sorted, gather_dedup):
        np.testing.assert_allclose(np.asarray(f(slots)), want, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(cnt_runs(slots)),
                                  np.asarray(cnt_scatter(slots)))
    print("parity ok", flush=True)

    fns = {"gather_plain": gather_plain, "gather_sorted": gather_sorted,
           "gather_dedup": gather_dedup, "cnt_scatter": cnt_scatter,
           "cnt_runs": cnt_runs}

    def window(f, n):
        out = None
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(slots)
        _ = float(jnp.sum(out[:8].astype(jnp.float32)))
        return time.perf_counter() - t0

    res = {}
    for rep in range(3):
        for k, f in fns.items():
            est = window(f, 4) / 4
            w1 = max(4, int(0.5 / max(est, 1e-5)))
            t1 = window(f, w1)
            t2 = window(f, 4 * w1)
            res.setdefault(k, []).append(
                round((t2 - t1) / (3 * w1) * 1e3, 3))
    for k, v in res.items():
        v = sorted(v)
        print(json.dumps({"op": k, "ms": v, "med": v[1]}), flush=True)


if __name__ == "__main__":
    main()
