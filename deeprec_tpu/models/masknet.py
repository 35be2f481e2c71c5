"""MaskNet (modelzoo/masknet/train.py): instance-guided mask blocks.

Each MaskBlock: an instance-guided mask (2-layer MLP over the full input)
multiplied into a layer-normed hidden state, then a feed-forward projection.
Serial stacking of N blocks, final logit layer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deeprec_tpu import config as cfg
from deeprec_tpu.models import base, nn

EMB_DIM = 16
NUM_BLOCKS = 3
MASK_AGG = 64
BLOCK_DIM = 256


def _specs():
    return {
        c: base.TableSpec(name=c, dim=EMB_DIM, combiner=cfg.Combiner.MEAN,
                          group="emb")
        for c in base.CATEGORICAL_COLUMNS
    }


def init_params(key):
    in_dim = 13 + EMB_DIM * len(base.CATEGORICAL_COLUMNS)
    ks = jax.random.split(key, NUM_BLOCKS + 1)
    blocks = []
    d = in_dim
    for i in range(NUM_BLOCKS):
        k1, k2 = jax.random.split(ks[i], 2)
        blocks.append({
            "ln": nn.layer_norm_init(d),
            "mask": nn.mlp_init(k1, in_dim, [MASK_AGG, d]),
            "ff": nn.dense_init(k2, d, BLOCK_DIM),
            "ln_out": nn.layer_norm_init(BLOCK_DIM),
        })
        d = BLOCK_DIM
    return {"blocks": blocks, "head": nn.dense_init(ks[-1], BLOCK_DIM, 1)}


def forward(params, batch, acts, train=True):
    x0 = jnp.concatenate(
        [batch["dense"]] + [acts[c] for c in base.CATEGORICAL_COLUMNS], axis=1)
    h = x0
    for p in params["blocks"]:
        mask = nn.mlp_apply(p["mask"], x0, activation=jax.nn.relu)
        h = nn.layer_norm_apply(p["ln"], h) * mask
        h = nn.dense_apply(p["ff"], h, jax.nn.relu)
        h = nn.layer_norm_apply(p["ln_out"], h)
    return nn.dense_apply(params["head"], h)[:, 0]


MODEL = base.RecModel(
    name="masknet",
    table_specs=_specs(),
    init_params=init_params,
    forward=forward,
)
