#!/usr/bin/env python
"""WDL + DLRM convergence on the Criteo-Kaggle PROXY (data/criteo_proxy.py).

The reference's AUC anchors are on the real Kaggle files (WDL
0.7734-0.7748, DLRM ~0.7856); this environment has no network egress, so
this run demonstrates the same capability on the calibrated proxy
(published cardinalities, Zipf ids, CTR 25.6%, Bayes ceiling ~0.80) and
reports eval AUC against that ceiling.  Run on the TPU in background:

  PYTHONPATH=/root/repo nohup python -u examples/04_criteo_proxy_convergence.py &
"""
import argparse
import time

import numpy as np
import jax
import optax

from deeprec_tpu.data.criteo_proxy import CriteoKaggleProxy, bayes_auc
from deeprec_tpu.data.synthetic import auc_numpy
from deeprec_tpu.models import base, get_model
from deeprec_tpu.optimizers import sparse
from deeprec_tpu.train.loop import Trainer


def run(name: str, steps: int, batch: int = 2048) -> dict:
    model = get_model(name)
    tables = base.make_tables(model)
    tr = Trainer(model=model, tables=tables,
                 sparse_optimizer=sparse.adagrad(lr=0.05),
                 dense_tx=optax.adagrad(0.01), bf16=True)
    state = tr.init_state(jax.random.PRNGKey(0))
    gen = CriteoKaggleProxy(batch_size=batch, seed=1)
    t0 = time.time()
    state = tr.fit(state, iter(gen), steps=steps, log_every=max(steps // 10, 1),
                   grow_every=16)
    dt = time.time() - t0
    # held-out eval
    ev = CriteoKaggleProxy(batch_size=batch, seed=777)
    it = iter(ev)
    scores, labels = [], []
    for _ in range(50):
        b = next(it)
        logits, _ = tr.eval_step(state, b)
        scores.append(np.asarray(logits, np.float32))
        labels.append(b["label"])
    auc = auc_numpy(np.concatenate(scores), np.concatenate(labels))
    live = {n: int(np.sum(np.asarray(jax.device_get(t.size))))
            for n, t in state.tables.items()}
    out = {"model": name, "steps": steps, "examples": steps * batch,
           "eval_auc": round(float(auc), 4), "train_secs": round(dt, 1),
           "live_rows": live}
    print(out, flush=True)
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--models", default="wdl,dlrm")
    args = ap.parse_args()
    print("devices:", jax.devices(), flush=True)
    print("proxy bayes ceiling:",
          round(bayes_auc(CriteoKaggleProxy(batch_size=8192), 10), 4),
          flush=True)
    for m in args.models.split(","):
        run(m, args.steps)
