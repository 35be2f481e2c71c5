#!/usr/bin/env python
"""Characterize the SHARDED training path on the 8-device virtual CPU mesh.

VERDICT r3 #7: the sharded path had correctness tests but zero recorded
cost numbers.  CPU-mesh milliseconds are NOT chip milliseconds — treat
every number as a RELATIVE cost guide (what a widen-rebuild costs versus
a step, what staleness adds, what the fused dispatch saves); absolute
real-chip scaling is hardware-blocked in this environment.

Measures (all interleaved in one process, medians of 5):
  1. sharded train_step, steady state (baseline)
  2. staleness=2 step overhead + the delayed-grad FIFO's exact footprint
     (measured from the pending pytree; formula: k stacked [S, B_local,
     ...] gradient payloads + count planes per table)
  3. make_multi_step(8) fused dispatch vs 8 single dispatches
  4. widen-on-drop: one growth rebuild (grow_stacked + re-insert) vs a
     no-op maybe_grow
  5. ShardedTiers: prepare+promote of a cold batch, and one demote cycle

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
     PYTHONPATH=/root/repo python benchmarks/sharded_path_bench.py
"""

import json
import os
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import optax
from jax.sharding import Mesh

from deeprec_tpu.data.synthetic import SyntheticCriteo
from deeprec_tpu.models import base
from deeprec_tpu.optimizers import sparse
from deeprec_tpu.parallel.tiers import ShardedTiers
from deeprec_tpu.parallel.trainer import DistributedTrainer

BATCH = 2048


def tiny_model(n_cols=4, dim=16):
    from tests.test_train_e2e import tiny_model as tm

    return tm(n_cols=n_cols, emb_dim=dim)


def mesh8():
    return Mesh(np.array(jax.devices()[:8]), ("data",))


def med(f, reps=5, inner=4):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = f()
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / inner * 1e3)
    return round(sorted(ts)[len(ts) // 2], 2)


def build(staleness=0, cap=2 ** 12, ids_per_col=3000):
    model = tiny_model()
    tr = DistributedTrainer(model=model, mesh=mesh8(),
                            sparse_optimizer=sparse.adagrad(lr=0.05),
                            dense_tx=optax.adagrad(0.05),
                            per_shard_capacity=cap, staleness=staleness)
    state = tr.init_state(jax.random.PRNGKey(0))
    gen = iter(SyntheticCriteo(batch_size=BATCH, num_ids_per_col=ids_per_col,
                               seed=1))
    batches = [next(gen) for _ in range(8)]
    for b in batches:  # compile + settle occupancy
        state, _ = tr.train_step(state, b)
    jax.block_until_ready(state.step)
    return tr, state, batches


def main():
    out = {}

    # 1+2: baseline vs staleness step (interleaved)
    tr0, s0, bt = build(staleness=0)
    tr2, s2, _ = build(staleness=2)
    r0, r2 = [], []
    for rep in range(5):
        box = {"s": s0}

        def step0(box=box):
            box["s"], m = tr0.train_step(box["s"], bt[rep % 8])
            return m["loss"]

        box2 = {"s": s2}

        def step2(box=box2):
            box["s"], m = tr2.train_step(box["s"], bt[rep % 8])
            return m["loss"]

        r0.append(med(step0, reps=1))
        r2.append(med(step2, reps=1))
        s0, s2 = box["s"], box2["s"]
    out["step_ms"] = sorted(r0)[2]
    out["step_staleness2_ms"] = sorted(r2)[2]
    pend = jax.tree.leaves(s2.pending)
    out["staleness_fifo_bytes"] = int(sum(x.size * x.dtype.itemsize
                                          for x in pend))
    # round-5: FIFO entries buffer only the exchange-bucket representation
    # — prove capacity-independence by rebuilding at 8x the per-shard
    # capacity with the same batch and re-measuring.
    tr2b, s2b, _ = build(staleness=2, cap=2 ** 15)
    out["staleness_fifo_bytes_cap8x"] = int(sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(s2b.pending)))
    out["staleness_fifo_note"] = (
        "k FIFO slots x per-table exchange-bucket state (ids/counts/"
        "routing + [S*bucket_cap, D] grads); batch-proportional — "
        "capacity-independent by construction (cap8x row must match)")

    # 3: fused multi-step dispatch
    trf, sf, btf = build(staleness=0)
    multi = trf.make_multi_step(8)
    sf, _ = multi(sf, btf)  # compile
    jax.block_until_ready(sf.step)
    boxf = {"s": sf}

    def fused(box=boxf):
        box["s"], losses = multi(box["s"], btf)
        return losses

    out["multi8_fused_per_step_ms"] = round(med(fused, reps=5, inner=1) / 8, 2)
    boxu = {"s": boxf["s"]}

    def unfused(box=boxu):
        m = None
        for b in btf:
            box["s"], m = trf.train_step(box["s"], b)
        return m["loss"]

    out["multi8_unfused_per_step_ms"] = round(
        med(unfused, reps=5, inner=1) / 8, 2)

    # 4: widen-on-drop rebuild — small caps + id pressure force growth
    trg, sg, _ = build(cap=2 ** 10, ids_per_col=100_000)
    gen = iter(SyntheticCriteo(batch_size=BATCH, num_ids_per_col=100_000,
                               seed=9))
    noop, grow = [], []
    for i in range(40):
        sg, _ = trg.train_step(sg, next(gen))
        t0 = time.perf_counter()
        sg2 = trg.maybe_grow(sg)
        jax.block_until_ready(jax.tree.leaves(sg2.tables)[0])
        dt = (time.perf_counter() - t0) * 1e3
        cap_before = {n: t.keys.shape[-1] for n, t in sg.tables.items()}
        cap_after = {n: t.keys.shape[-1] for n, t in sg2.tables.items()}
        (grow if cap_after != cap_before else noop).append(dt)
        sg = sg2
        if len(grow) >= 3 and len(noop) >= 3:
            break
    out["maybe_grow_noop_ms"] = round(sorted(noop)[len(noop) // 2], 2)
    out["widen_rebuild_ms"] = round(sorted(grow)[len(grow) // 2], 2)
    out["widen_rebuilds_seen"] = len(grow)

    # 5: ShardedTiers promote + demote cycle
    model = tiny_model()
    trt = DistributedTrainer(model=model, mesh=mesh8(),
                             sparse_optimizer=sparse.adagrad(lr=0.05),
                             dense_tx=optax.adagrad(0.05),
                             per_shard_capacity=2 ** 10)
    st = trt.init_state(jax.random.PRNGKey(0))
    trt.tiers = {n: ShardedTiers(t, trt.mesh, "data", hot_watermark=0.5,
                                 evict_fraction=0.5)
                 for n, t in st.tables.items()}
    gen = iter(SyntheticCriteo(batch_size=BATCH, num_ids_per_col=20_000,
                               seed=3))
    for _ in range(12):  # populate + demote so cold stores fill
        b = next(gen)
        st, _ = trt.train_step(st, b)
        for n, tier in trt.tiers.items():
            if tier.needs_demote(st.tables[n]):
                st.tables[n] = tier.demote(st.tables[n])
    cold = sum(t.cold_size for t in trt.tiers.values())
    b = next(gen)
    t0 = time.perf_counter()
    payloads = trt.prepare_payloads(b, erase=False)
    st2 = trt._apply_payloads(st, [payloads] if payloads else [])
    jax.block_until_ready(jax.tree.leaves(st2.tables)[0])
    out["tier_prepare_promote_ms"] = round((time.perf_counter() - t0) * 1e3, 2)
    n0 = next(iter(trt.tiers))
    t0 = time.perf_counter()
    demoted = trt.tiers[n0].demote(st2.tables[n0])
    jax.block_until_ready(demoted.keys)
    out["tier_demote_ms"] = round((time.perf_counter() - t0) * 1e3, 2)
    out["cold_rows_at_measure"] = int(cold)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
