"""DeepFM (modelzoo/deepfm/train.py): FM + deep DNN sharing embeddings.

First-order: per-feature scalar weights (dim-1 tables).  Second-order: FM
pairwise term  0.5 * ((Σv)² − Σv²)  over the 26 embedding vectors.  Deep:
DNN [1024, 512, 256] over concatenated embeddings + dense.
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
        specs[f"fo_{c}"] = base.TableSpec(
            name=f"fo_{c}", dim=1, combiner=cfg.Combiner.SUM, feature=c, group="fo"
        )
    return specs


def init_params(key):
    k1, k2 = jax.random.split(key)
    in_dim = 13 + EMB_DIM * len(base.CATEGORICAL_COLUMNS)
    return {
        "deep": nn.mlp_init(k1, in_dim, HIDDEN),
        "dense_linear": nn.dense_init(k2, 13, 1),
    }


def forward(params, batch, acts, train=True):
    x = batch["dense"]
    embs = jnp.stack([acts[c] for c in base.CATEGORICAL_COLUMNS], axis=1)  # [B,26,16]
    # FM second order
    sum_sq = jnp.square(jnp.sum(embs, axis=1))
    sq_sum = jnp.sum(jnp.square(embs), axis=1)
    fm2 = 0.5 * jnp.sum(sum_sq - sq_sum, axis=1)
    # first order
    fm1 = nn.dense_apply(params["dense_linear"], x)[:, 0]
    for c in base.CATEGORICAL_COLUMNS:
        fm1 = fm1 + acts[f"fo_{c}"][:, 0]
    # deep
    deep_in = jnp.concatenate([x, embs.reshape(x.shape[0], -1)], axis=1)
    deep = nn.mlp_apply(params["deep"], deep_in)[:, 0]
    return fm1 + fm2 + deep


MODEL = base.RecModel(
    name="deepfm",
    table_specs=_specs(),
    init_params=init_params,
    forward=forward,
)
