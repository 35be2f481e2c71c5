"""DLRM — dot-interaction recommendation model (modelzoo/dlrm/train.py).

Reference architecture: 26 Criteo categorical embeddings (dim 16), dense
features through mlp_bot [512,256,64,16], pairwise dot interaction over the
27 feature vectors (train.py:124-132 ``_dot_op``), concat with bottom output,
mlp_top [512,256] → 1 logit.  ``MLPERF`` is the MLPerf config
(modelzoo/mlperf: dim 128, bot [512,256,128], top [1024,1024,512,256,1]).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deeprec_tpu import config as cfg
from deeprec_tpu.models import base, nn


def make_model(name="dlrm", emb_dim=16, mlp_bot=(512, 256, 64, 16),
               mlp_top=(512, 256, 1)) -> base.RecModel:
    assert mlp_bot[-1] == emb_dim, "bottom MLP must project to emb_dim"

    specs = {
        c: base.TableSpec(name=c, dim=emb_dim, combiner=cfg.Combiner.MEAN,
                          group="emb")
        for c in base.CATEGORICAL_COLUMNS
    }
    n_feat = 1 + len(base.CATEGORICAL_COLUMNS)
    inter_dim = n_feat * (n_feat - 1) // 2

    def init_params(key):
        k1, k2 = jax.random.split(key)
        return {
            "mlp_bot": nn.mlp_init(k1, 13, list(mlp_bot)),
            "mlp_top": nn.mlp_init(k2, emb_dim + inter_dim, list(mlp_top)),
        }

    def forward(params, batch, acts, train=True):
        x = batch["dense"]
        bot = nn.mlp_apply(params["mlp_bot"], x, final_activation=jax.nn.relu)
        feats = [bot] + [acts[c] for c in base.CATEGORICAL_COLUMNS]
        t = jnp.stack(feats, axis=1)                       # [B, 27, D]
        inter = jnp.einsum("bnd,bmd->bnm", t, t)           # MXU batched matmul
        n = t.shape[1]
        iu, ju = jnp.triu_indices(n, k=1)
        inter_flat = inter[:, iu, ju]                      # [B, n(n-1)/2]
        top_in = jnp.concatenate([bot, inter_flat.astype(bot.dtype)], axis=1)
        logits = nn.mlp_apply(params["mlp_top"], top_in)
        return logits[:, 0]

    return base.RecModel(name=name, table_specs=specs,
                         init_params=init_params, forward=forward)


MODEL = make_model()
MLPERF = make_model(name="dlrm_mlperf", emb_dim=128,
                    mlp_bot=(512, 256, 128),
                    mlp_top=(1024, 1024, 512, 256, 1))
