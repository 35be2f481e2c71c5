"""DIN — Deep Interest Network (modelzoo/din/train.py).

Target-item and behavior-history embeddings share tables (item, category);
the local activation unit attends history against the target; the pooled
interest + target + context feed a relu MLP.  (The reference's Dice
activation carries batch-norm RUNNING statistics; this framework's
forward is pure in params by design, so the stateless relu stands in —
nn.dice_apply implements the Dice math for callers that thread their own
stats.  DIN converges to its behavior generator's ceiling either way —
BASELINE.md.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deeprec_tpu.models import base, nn

EMB_DIM = 32
SEQ_LEN = 30
HIDDEN = [200, 80, 1]


def _specs():
    return {
        "item": base.TableSpec(
            name="item", dim=EMB_DIM, group="din_emb",
            shared_features=("hist_item",), initial_capacity=2 ** 16,
            seq_len=SEQ_LEN,
        ),
        "category": base.TableSpec(
            name="category", dim=EMB_DIM, group="din_emb",
            shared_features=("hist_category",), initial_capacity=2 ** 12,
            seq_len=SEQ_LEN,
        ),
    }


def init_params(key):
    k1, k2 = jax.random.split(key)
    d = 2 * EMB_DIM  # item ++ category
    return {
        "att": nn.din_attention_init(k1, d),
        "mlp": nn.mlp_init(k2, 3 * d + 1, HIDDEN),
    }


def forward(params, batch, acts, train=True):
    tgt = jnp.concatenate([acts["item"], acts["category"]], axis=-1)  # [B, 2D]
    hist_i, mask = acts["item:hist_item"]
    hist_c, _ = acts["category:hist_category"]
    hist = jnp.concatenate([hist_i, hist_c], axis=-1)                 # [B, L, 2D]
    pooled, _ = nn.din_attention_apply(params["att"], hist, tgt, mask)
    x = jnp.concatenate([batch["dense"], tgt, pooled, tgt * pooled], axis=-1)
    return nn.mlp_apply(params["mlp"], x)[:, 0]


MODEL = base.RecModel(
    name="din",
    table_specs=_specs(),
    init_params=init_params,
    forward=forward,
    dense_dim=1,
)
