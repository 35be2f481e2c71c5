"""DIEN — Deep Interest Evolution Network (modelzoo/dien/train.py).

Interest extraction GRU over the behavior sequence, attention scores against
the target, AUGRU interest evolution, final MLP.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deeprec_tpu.models import base, nn

EMB_DIM = 32
HIDDEN_GRU = 64
HIDDEN = [200, 80, 1]


SEQ_LEN = 30          # default history length (reference MAX_SEQ_LENGTH=50)


def _specs():
    return {
        "item": base.TableSpec(
            name="item", dim=EMB_DIM, group="dien_emb",
            shared_features=("hist_item",), initial_capacity=2 ** 16,
            seq_len=SEQ_LEN,
        ),
        "category": base.TableSpec(
            name="category", dim=EMB_DIM, group="dien_emb",
            shared_features=("hist_category",), initial_capacity=2 ** 12,
            seq_len=SEQ_LEN,
        ),
    }


def init_params(key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    d = 2 * EMB_DIM
    return {
        "gru": nn.gru_init(k1, d, HIDDEN_GRU),
        "augru": nn.augru_init(k2, HIDDEN_GRU, HIDDEN_GRU),
        "att_w": nn.dense_init(k3, HIDDEN_GRU, d),
        "mlp": nn.mlp_init(k4, 2 * d + HIDDEN_GRU + 1, HIDDEN),
    }


def forward(params, batch, acts, train=True):
    tgt = jnp.concatenate([acts["item"], acts["category"]], axis=-1)
    hist_i, mask = acts["item:hist_item"]
    hist_c, _ = acts["category:hist_category"]
    hist = jnp.concatenate([hist_i, hist_c], axis=-1)      # [B, L, 2D]

    interests, _ = nn.gru_apply(params["gru"], hist, mask)  # [B, L, H]
    # attention of interests vs target (bilinear)
    proj = nn.dense_apply(params["att_w"], interests.reshape(-1, HIDDEN_GRU))
    proj = proj.reshape(interests.shape[0], interests.shape[1], -1)
    scores = jnp.einsum("bld,bd->bl", proj, tgt)
    scores = jnp.where(mask, scores, -1e9)
    att = jax.nn.softmax(scores.astype(jnp.float32), axis=1).astype(hist.dtype)
    _, final = nn.augru_apply(params["augru"], interests, att, mask)  # [B, H]

    x = jnp.concatenate([batch["dense"], tgt, final,
                         jnp.sum(hist * mask[:, :, None].astype(hist.dtype),
                                 axis=1)], axis=-1)
    return nn.mlp_apply(params["mlp"], x)[:, 0]


MODEL = base.RecModel(
    name="dien",
    table_specs=_specs(),
    init_params=init_params,
    forward=forward,
    dense_dim=1,
)
