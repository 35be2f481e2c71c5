"""BST — Behavior Sequence Transformer (modelzoo/bst/train.py).

Transformer encoder over [history ++ target] item sequence with learned
positional embeddings; encoded target position + pooled history feed an MLP.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deeprec_tpu.models import base, nn

EMB_DIM = 32
SEQ_LEN = 30          # default history length (reference MAX_SEQ_LENGTH=50)
MAX_POS = 256         # positional table covers any history up to this
NUM_HEADS = 4
FF = 64
HIDDEN = [256, 64, 1]
D = 2 * EMB_DIM  # item ++ category


def _specs():
    return {
        "item": base.TableSpec(
            name="item", dim=EMB_DIM, group="bst_emb",
            shared_features=("hist_item",), initial_capacity=2 ** 16,
            seq_len=SEQ_LEN,
        ),
        "category": base.TableSpec(
            name="category", dim=EMB_DIM, group="bst_emb",
            shared_features=("hist_category",), initial_capacity=2 ** 12,
            seq_len=SEQ_LEN,
        ),
    }


def init_params(key):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "pos": jax.random.normal(k1, (MAX_POS + 1, D), jnp.float32) * 0.02,
        "block": nn.transformer_block_init(k2, D, NUM_HEADS, FF),
        "mlp": nn.mlp_init(k3, 2 * D + 1, HIDDEN),
    }


def forward(params, batch, acts, train=True):
    tgt = jnp.concatenate([acts["item"], acts["category"]], axis=-1)  # [B, D]
    hist_i, mask = acts["item:hist_item"]
    hist_c, _ = acts["category:hist_category"]
    hist = jnp.concatenate([hist_i, hist_c], axis=-1)                 # [B, L, D]

    seq = jnp.concatenate([hist, tgt[:, None, :]], axis=1)            # [B, L+1, D]
    l1 = seq.shape[1]
    if l1 > params["pos"].shape[0]:
        raise ValueError(f"history length {l1 - 1} exceeds MAX_POS "
                         f"{params['pos'].shape[0] - 1}")
    seq = seq + params["pos"][:l1][None].astype(seq.dtype)
    full_mask = jnp.concatenate(
        [mask, jnp.ones((mask.shape[0], 1), mask.dtype)], axis=1)
    enc = nn.transformer_block_apply(params["block"], seq, full_mask,
                                     num_heads=NUM_HEADS)
    tgt_enc = enc[:, -1, :]
    pooled = (jnp.sum(enc[:, :-1] * mask[:, :, None].astype(enc.dtype), axis=1)
              / jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1).astype(enc.dtype))
    x = jnp.concatenate([batch["dense"], tgt_enc, pooled], axis=-1)
    return nn.mlp_apply(params["mlp"], x)[:, 0]


MODEL = base.RecModel(
    name="bst",
    table_specs=_specs(),
    init_params=init_params,
    forward=forward,
    dense_dim=1,
)
