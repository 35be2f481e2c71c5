"""WDL — Wide & Deep (modelzoo/wide_and_deep/train.py).

Deep part: 26 categorical embeddings + 13 dense → DNN [1024, 512, 256] → 1.
Wide part: linear model over the categorical ids, realized as dim-1 embedding
tables (the hash-bucket wide columns, train.py:374-379) plus a dense linear
term.  Final logit = deep + wide (train.py WDL head).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deeprec_tpu import config as cfg
from deeprec_tpu.models import base, nn

EMB_DIM = 16
HIDDEN = [1024, 512, 256, 1]


def _specs():
    specs = {
        c: base.TableSpec(name=c, dim=EMB_DIM, combiner=cfg.Combiner.MEAN, group="emb")
        for c in base.CATEGORICAL_COLUMNS
    }
    for c in base.CATEGORICAL_COLUMNS:
        specs[f"wide_{c}"] = base.TableSpec(
            name=f"wide_{c}", dim=1, combiner=cfg.Combiner.SUM, feature=c, group="wide"
        )
    return specs


def init_params(key):
    k1, k2 = jax.random.split(key)
    in_dim = 13 + EMB_DIM * len(base.CATEGORICAL_COLUMNS)
    return {
        "deep": nn.mlp_init(k1, in_dim, HIDDEN),
        "wide_dense": nn.dense_init(k2, 13, 1),
    }


def forward(params, batch, acts, train=True):
    x = batch["dense"]
    deep_in = jnp.concatenate(
        [x] + [acts[c] for c in base.CATEGORICAL_COLUMNS], axis=1
    )
    deep = nn.mlp_apply(params["deep"], deep_in)[:, 0]
    wide = nn.dense_apply(params["wide_dense"], x)[:, 0]
    for c in base.CATEGORICAL_COLUMNS:
        wide = wide + acts[f"wide_{c}"][:, 0]
    return deep + wide


MODEL = base.RecModel(
    name="wdl",
    table_specs=_specs(),
    init_params=init_params,
    forward=forward,
)
