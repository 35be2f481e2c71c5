"""Streaming training metrics: loss and histogram-based AUC.

The AUC accumulator mirrors TF's thresholded streaming AUC (used by every
modelzoo train.py via tf.metrics.auc): fixed threshold bins accumulated on
device, finalized by trapezoidal ROC integration on host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

NUM_THRESHOLDS = 200


class AucState(struct.PyTreeNode):
    tp: jnp.ndarray     # [T]
    fp: jnp.ndarray     # [T]
    n_pos: jnp.ndarray  # []
    n_neg: jnp.ndarray  # []

    @staticmethod
    def create() -> "AucState":
        # distinct buffers: donated pytrees must not alias leaves
        return AucState(tp=jnp.zeros((NUM_THRESHOLDS,), jnp.float32),
                        fp=jnp.zeros((NUM_THRESHOLDS,), jnp.float32),
                        n_pos=jnp.zeros((), jnp.float32),
                        n_neg=jnp.zeros((), jnp.float32))


@jax.jit
def auc_update(state: AucState, logits: jnp.ndarray, labels: jnp.ndarray) -> AucState:
    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    thresholds = jnp.linspace(0.0, 1.0, NUM_THRESHOLDS)
    pred_pos = p[None, :] >= thresholds[:, None]          # [T, B]
    pos = (labels > 0.5).astype(jnp.float32)
    tp = jnp.sum(pred_pos * pos[None, :], axis=1)
    fp = jnp.sum(pred_pos * (1.0 - pos)[None, :], axis=1)
    return AucState(
        tp=state.tp + tp,
        fp=state.fp + fp,
        n_pos=state.n_pos + jnp.sum(pos),
        n_neg=state.n_neg + jnp.sum(1.0 - pos),
    )


def auc_value(state: AucState) -> float:
    import numpy as np

    tp = np.asarray(state.tp)
    fp = np.asarray(state.fp)
    n_pos = float(state.n_pos)
    n_neg = float(state.n_neg)
    if n_pos == 0 or n_neg == 0:
        return 0.5
    tpr = tp / n_pos
    fpr = fp / n_neg
    # thresholds descend along the curve; integrate with trapezoid
    order = np.argsort(fpr)
    return float(np.trapezoid(tpr[order], fpr[order]))


def reset(state: AucState) -> AucState:
    """Fresh accumulator (epoch-boundary metric reset)."""

    return AucState.create()
