"""DSSM — two-tower user/item retrieval model (modelzoo/dssm/train.py).

User tower over user-side features (half the Criteo categoricals + dense),
item tower over item-side features; logit = scaled cosine of tower outputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deeprec_tpu import config as cfg
from deeprec_tpu.models import base, nn

EMB_DIM = 16
TOWER = [256, 128, 64]
USER_COLS = base.CATEGORICAL_COLUMNS[:13]
ITEM_COLS = base.CATEGORICAL_COLUMNS[13:]


def _specs():
    return {
        c: base.TableSpec(name=c, dim=EMB_DIM, combiner=cfg.Combiner.MEAN,
                          group="emb")
        for c in base.CATEGORICAL_COLUMNS
    }


def init_params(key):
    k1, k2, k3 = jax.random.split(key, 3)
    u_in = 13 + EMB_DIM * len(USER_COLS)
    i_in = EMB_DIM * len(ITEM_COLS)
    return {
        "user": nn.mlp_init(k1, u_in, TOWER),
        "item": nn.mlp_init(k2, i_in, TOWER),
        "scale": jnp.asarray(5.0, jnp.float32),
    }


def forward(params, batch, acts, train=True):
    u_in = jnp.concatenate([batch["dense"]] + [acts[c] for c in USER_COLS],
                           axis=1)
    i_in = jnp.concatenate([acts[c] for c in ITEM_COLS], axis=1)
    u = nn.mlp_apply(params["user"], u_in, final_activation=None)
    v = nn.mlp_apply(params["item"], i_in, final_activation=None)
    u = u / jnp.maximum(jnp.linalg.norm(u.astype(jnp.float32), axis=1,
                                        keepdims=True), 1e-6).astype(u.dtype)
    v = v / jnp.maximum(jnp.linalg.norm(v.astype(jnp.float32), axis=1,
                                        keepdims=True), 1e-6).astype(v.dtype)
    cos = jnp.sum(u * v, axis=1)
    return params["scale"].astype(cos.dtype) * cos


MODEL = base.RecModel(
    name="dssm",
    table_specs=_specs(),
    init_params=init_params,
    forward=forward,
)
