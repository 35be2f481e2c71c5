"""DCN / DCNv2 — Deep & Cross Network (modelzoo/dcn, modelzoo/dcnv2).

DCN v1 cross layer:  x_{l+1} = x0 * (x_l · w_l) + b_l + x_l   (rank-1)
DCN v2 cross layer:  x_{l+1} = x0 * (W_l x_l + b_l) + x_l     (full matrix)
Both share the Criteo embedding layout with the deep tower; combined output
feeds the final logit layer (stacked-parallel structure, train.py).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from deeprec_tpu import config as cfg
from deeprec_tpu.models import base, nn

EMB_DIM = 16
DEEP = [1024, 512, 256]
NUM_CROSS = 3


def _specs():
    return {
        c: base.TableSpec(name=c, dim=EMB_DIM, combiner=cfg.Combiner.MEAN,
                          group="emb")
        for c in base.CATEGORICAL_COLUMNS
    }


def _make(version: int):
    in_dim = 13 + EMB_DIM * len(base.CATEGORICAL_COLUMNS)

    def init_params(key):
        ks = jax.random.split(key, NUM_CROSS + 2)
        cross = []
        for i in range(NUM_CROSS):
            if version == 1:
                cross.append({
                    "w": jax.random.normal(ks[i], (in_dim,)) * 0.01,
                    "b": jnp.zeros((in_dim,)),
                })
            else:
                cross.append({
                    "w": jax.random.normal(ks[i], (in_dim, in_dim)) * 0.01,
                    "b": jnp.zeros((in_dim,)),
                })
        return {
            "cross": cross,
            "deep": nn.mlp_init(ks[-2], in_dim, DEEP),
            "head": nn.dense_init(ks[-1], in_dim + DEEP[-1], 1),
        }

    def forward(params, batch, acts, train=True):
        x0 = jnp.concatenate(
            [batch["dense"]] + [acts[c] for c in base.CATEGORICAL_COLUMNS],
            axis=1)
        x = x0
        for p in params["cross"]:
            if version == 1:
                xw = jnp.einsum("bd,d->b", x, p["w"].astype(x.dtype))
                x = x0 * xw[:, None] + p["b"].astype(x.dtype) + x
            else:
                wx = jnp.dot(x, p["w"].astype(x.dtype),
                             preferred_element_type=jnp.float32).astype(x.dtype)
                x = x0 * (wx + p["b"].astype(x.dtype)) + x
        deep = nn.mlp_apply(params["deep"], x0, final_activation=jax.nn.relu)
        out = jnp.concatenate([x, deep], axis=1)
        return nn.dense_apply(params["head"], out)[:, 0]

    return base.RecModel(
        name=f"dcn{'' if version == 1 else 'v2'}",
        table_specs=_specs(),
        init_params=init_params,
        forward=forward,
    )


MODEL = _make(1)
MODEL_V2 = _make(2)
