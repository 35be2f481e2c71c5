#!/usr/bin/env python
"""WDL / DLRM / DeepFM convergence on the Criteo-Kaggle PROXY
(data/criteo_proxy.py) + DIN / DIEN on behavior logs (data/behavior.py).

The reference's AUC anchors are on the real Kaggle files (WDL
0.7734-0.7748, DLRM ~0.7856, DeepFM ~0.776 — modelzoo/*/README.md perf
tables; DIN 0.6111 / DIEN ~0.5973 on Amazon Books); this environment has
no network egress, so this run demonstrates the same capability on the
calibrated proxy (published cardinalities, Zipf ids, CTR 25.6%, Bayes
ceiling ~0.806) and planted-signal behavior logs, reporting eval AUC
against each generator's ceiling.  Run on the TPU in background:

  PYTHONPATH=/root/repo nohup python -u \
      examples/04_criteo_proxy_convergence.py --models wdl,dlrm,deepfm &

Training batches are generated ON DEVICE (DeviceCriteoProxy) so the run is
engine-bound, not tunnel-bound; eval always scores against the HOST
proxy's held-out stream (same latent ground truth, bit-identical hash
lattice — test_data.py::test_device_proxy_matches_host_distribution).

``--sweep`` runs the round-4 LR/schedule sweep for a model and prints one
result line per config (VERDICT r3 #3: close the gap to the proxy
ceiling; the reference's anchors are CONVERGED numbers).
"""
import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from deeprec_tpu.data.behavior import SyntheticBehavior
from deeprec_tpu.data.criteo_proxy import (CriteoKaggleProxy,
                                           DeviceCriteoProxy, bayes_auc)
from deeprec_tpu.data.synthetic import auc_numpy
from deeprec_tpu.models import base, get_model
from deeprec_tpu.optimizers import sparse
from deeprec_tpu.train.loop import Trainer

CRITEO_MODELS = ("wdl", "dlrm", "deepfm", "dcn", "dcnv2", "masknet",
                 "dssm", "dlrm_mlperf")
# Multi-task heads train on the proxy too: the ctr label IS the proxy's
# calibrated click, the conversion label is click-gated noise (the
# SyntheticMultiTask recipe) — main-task AUC reads against the same
# proxy ceiling (~0.806).
MT_MODELS = ("mmoe", "esmm", "ple", "dbmtl", "simplemultitask")


class MTProxy:
    """Wrap a proxy generator with multi-task labels {ctr, ctcvr}:
    ctr = the proxy's click; ctcvr = click-gated conversion (30% | click),
    matching data/behavior.SyntheticMultiTask.  Label attachment is one
    jitted call per batch (eager ops cost seconds on the tunnel)."""

    def __init__(self, inner, seed=0):
        self.inner, self.seed = inner, seed

    def __iter__(self):
        @jax.jit
        def attach(label, key):
            k, key = jax.random.split(key)
            conv = label * (jax.random.uniform(k, label.shape)
                            < 0.3).astype(jnp.float32)
            return conv, key

        key = jax.random.PRNGKey(self.seed + 31337)
        for b in self.inner:
            conv, key = attach(jnp.asarray(b["label"], jnp.float32), key)
            b = dict(b)
            b["labels"] = {"ctr": b["label"], "ctcvr": conv}
            yield b


def _sparse_opt(lr: float, schedule: str, steps: int):
    opt = sparse.adagrad(lr=lr)
    if schedule == "exp":
        # halve twice over the run — converged-tail polishing
        opt = sparse.with_lr_schedule(
            opt, lambda s: lr * jnp.power(0.25, s.astype(jnp.float32) / steps))
    elif schedule == "cosine":
        opt = sparse.with_lr_schedule(
            opt, lambda s: lr * 0.5 * (1 + jnp.cos(
                jnp.pi * jnp.minimum(s.astype(jnp.float32) / steps, 1.0))))
    return opt


def _dense_tx(name: str, lr: float, schedule: str, steps: int):
    sched = lr
    if schedule == "exp":
        sched = optax.exponential_decay(lr, steps, 0.25)
    elif schedule == "cosine":
        sched = optax.cosine_decay_schedule(lr, steps)
    return optax.adagrad(sched) if name == "adagrad" else optax.adam(sched)


def eval_auc(tr, state, gen_cls, seed=777, batches=50, batch=2048,
             mt: bool = False):
    ev_gen = gen_cls(batch_size=batch, seed=seed)
    if mt:
        ev_gen = MTProxy(ev_gen, seed=seed)
    it = iter(ev_gen)
    scores, labels = [], []
    for _ in range(batches):
        b = next(it)
        logits, _ = tr.eval_step(state, b)
        scores.append(np.asarray(logits, np.float32))
        labels.append(np.asarray(b["label"]))
    return auc_numpy(np.concatenate(scores), np.concatenate(labels))


def run(name: str, steps: int, batch: int = 2048, lr: float = 0.05,
        dense_lr: float = 0.01, dense_opt: str = "adagrad",
        schedule: str = "none", host_data: bool = False,
        tag: str = "") -> dict:
    model = get_model(name)
    tables = base.make_tables(model)
    tr = Trainer(model=model, tables=tables,
                 sparse_optimizer=_sparse_opt(lr, schedule, steps),
                 dense_tx=_dense_tx(dense_opt, dense_lr, schedule, steps),
                 bf16=True)
    state = tr.init_state(jax.random.PRNGKey(0))
    gen_cls = CriteoKaggleProxy if host_data else DeviceCriteoProxy
    gen = gen_cls(batch_size=batch, seed=1)
    mt = bool(model.tasks)
    if mt:
        gen = MTProxy(gen, seed=1)
    t0 = time.time()
    state = tr.fit(state, iter(gen), steps=steps,
                   log_every=max(steps // 10, 1), grow_every=16)
    dt = time.time() - t0
    auc = eval_auc(tr, state, CriteoKaggleProxy, batch=batch, mt=mt)
    live = {n: int(np.sum(np.asarray(jax.device_get(t.size))))
            for n, t in state.tables.items()}
    out = {"model": name, "tag": tag, "steps": steps,
           "examples": steps * batch, "lr": lr, "dense_lr": dense_lr,
           "dense_opt": dense_opt, "schedule": schedule,
           "eval_auc": round(float(auc), 4), "train_secs": round(dt, 1),
           "live_rows": sum(live.values())}
    print(json.dumps(out), flush=True)
    return out


def run_behavior(name: str, steps: int, batch: int = 2048,
                 lr: float = 0.05, dense_lr: float = 1e-3,
                 seq_len: int = 50) -> dict:
    """DIN / DIEN / BST on planted-signal behavior logs — the reference
    trains these on Amazon Books (modelzoo/din/README.md AUC 0.6111,
    dien ~0.5973); here the generator's Bayes ceiling is computable
    (p_click_match=0.75 vs 0.25 → ceiling ≈ 0.75 plus history noise)."""

    import dataclasses as dc

    model = get_model(name)
    specs = {n: dc.replace(s, seq_len=seq_len)
             for n, s in model.table_specs.items()}
    model = dc.replace(model, table_specs=specs)
    tr = Trainer(model=model, tables=base.make_tables(model),
                 sparse_optimizer=sparse.adagrad(lr=lr),
                 dense_tx=optax.adam(dense_lr), bf16=True)
    state = tr.init_state(jax.random.PRNGKey(0))
    mk = lambda seed: SyntheticBehavior(batch_size=batch, seq_len=seq_len,
                                        num_items=200_000,
                                        num_categories=1000, seed=seed)
    t0 = time.time()
    state = tr.fit(state, iter(mk(1)), steps=steps,
                   log_every=max(steps // 10, 1), grow_every=16)
    dt = time.time() - t0
    auc = eval_auc(tr, state, lambda batch_size, seed:
                   SyntheticBehavior(batch_size=batch_size, seq_len=seq_len,
                                     num_items=200_000, num_categories=1000,
                                     seed=seed), batch=batch)
    out = {"model": name, "steps": steps, "examples": steps * batch,
           "eval_auc": round(float(auc), 4), "train_secs": round(dt, 1),
           "ceiling": "~0.75 (planted signal)"}
    print(json.dumps(out), flush=True)
    return out


SWEEP = [
    # (lr, dense_lr, dense_opt, schedule, steps)
    dict(lr=0.05, dense_lr=0.01, dense_opt="adagrad", schedule="none",
         steps=4000, tag="r3-base"),
    dict(lr=0.05, dense_lr=0.01, dense_opt="adagrad", schedule="none",
         steps=16000, tag="4x-steps"),
    dict(lr=0.1, dense_lr=0.02, dense_opt="adagrad", schedule="exp",
         steps=16000, tag="hot+decay"),
    dict(lr=0.1, dense_lr=1e-3, dense_opt="adam", schedule="cosine",
         steps=16000, tag="adam-cosine"),
    dict(lr=0.2, dense_lr=0.02, dense_opt="adagrad", schedule="cosine",
         steps=24000, tag="hotter-long"),
]


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--models", default="wdl,dlrm")
    ap.add_argument("--sweep", default="",
                    help="model name: run the LR/schedule sweep for it")
    ap.add_argument("--config", type=int, default=-1,
                    help="run only SWEEP[i] (one process per config is hang-"
                         "isolated on the dev tunnel — see verify skill)")
    ap.add_argument("--host_data", action="store_true")
    args = ap.parse_args()
    proxy_ceiling = bayes_auc(CriteoKaggleProxy(batch_size=4096), 10)
    print(f"proxy bayes ceiling ~ {proxy_ceiling:.4f}", flush=True)
    if args.sweep:
        cfgs = (SWEEP if args.config < 0 else [SWEEP[args.config]])
        for cfg_kw in cfgs:
            run(args.sweep, batch=2048, host_data=args.host_data, **cfg_kw)
    else:
        for m in args.models.split(","):
            m = m.strip()
            if m in CRITEO_MODELS or m in MT_MODELS:
                run(m, steps=args.steps, host_data=args.host_data)
            else:
                run_behavior(m, steps=args.steps)
