"""DLRM — dot-interaction recommendation model (modelzoo/dlrm/train.py).

Reference architecture: 26 Criteo categorical embeddings (dim 16), dense
features through mlp_bot [512,256,64,16], pairwise dot interaction over the
27 feature vectors (train.py:124-132 ``_dot_op``), concat with bottom output,
mlp_top [512,256] → 1 logit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deeprec_tpu import config as cfg
from deeprec_tpu.models import base, nn

EMB_DIM = 16
MLP_BOT = [512, 256, 64, EMB_DIM]
MLP_TOP = [512, 256, 1]


def _specs():
    return {
        c: base.TableSpec(name=c, dim=EMB_DIM, combiner=cfg.Combiner.MEAN, group="emb")
        for c in base.CATEGORICAL_COLUMNS
    }


def init_params(key):
    k1, k2 = jax.random.split(key)
    n_feat = 1 + len(base.CATEGORICAL_COLUMNS)   # bottom output + 26 embeddings
    inter_dim = n_feat * (n_feat - 1) // 2
    return {
        "mlp_bot": nn.mlp_init(k1, 13, MLP_BOT),
        "mlp_top": nn.mlp_init(k2, EMB_DIM + inter_dim, MLP_TOP),
    }


def forward(params, batch, acts, train=True):
    x = batch["dense"]
    bot = nn.mlp_apply(params["mlp_bot"], x, final_activation=jax.nn.relu)
    feats = [bot] + [acts[c] for c in base.CATEGORICAL_COLUMNS]
    t = jnp.stack(feats, axis=1)                       # [B, 27, 16]
    inter = jnp.einsum("bnd,bmd->bnm", t, t)           # MXU batched matmul
    n = t.shape[1]
    iu, ju = jnp.triu_indices(n, k=1)
    inter_flat = inter[:, iu, ju]                      # [B, n(n-1)/2]
    top_in = jnp.concatenate([bot, inter_flat.astype(bot.dtype)], axis=1)
    logits = nn.mlp_apply(params["mlp_top"], top_in)
    return logits[:, 0]


MODEL = base.RecModel(
    name="dlrm",
    table_specs=_specs(),
    init_params=init_params,
    forward=forward,
)
