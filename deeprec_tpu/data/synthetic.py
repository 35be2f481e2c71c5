"""Synthetic Criteo-like click-log generator with planted signal.

The environment has no network egress, so the Criteo Kaggle download scripts
(modelzoo/*/data/prepare_data.sh) cannot run; this generator reproduces the
statistical shape that matters for the framework: 13 continuous + 26
categorical columns, power-law (Zipf) id frequencies with high cardinality,
and a ground-truth logistic model over latent per-id weights so learned-AUC is
meaningful (a good model recovers the planted weights; AUC well above 0.5
validates the whole lookup→train→update path end-to-end).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, Optional

import numpy as np

from deeprec_tpu.models import base


def _mix32_np(x: np.ndarray, salt: int) -> np.ndarray:
    x = x.astype(np.uint32) ^ np.uint32((salt * 0x9E3779B9 + 1) & 0xFFFFFFFF)
    x ^= x >> 16
    x = (x * np.uint32(0x85EBCA6B)) & np.uint32(0xFFFFFFFF)
    x ^= x >> 13
    x = (x * np.uint32(0xC2B2AE35)) & np.uint32(0xFFFFFFFF)
    x ^= x >> 16
    return x


def _latent_weight(ids: np.ndarray, salt: int, scale: float) -> np.ndarray:
    """Deterministic per-id latent weight ~ N(0, scale) via hash → uniform →
    inverse-normal approximation (sum of 4 uniforms, CLT)."""

    acc = np.zeros(ids.shape, np.float32)
    for i in range(4):
        h = _mix32_np(ids, salt * 17 + i)
        acc += h.astype(np.float32) / np.float32(2 ** 32)
    return (acc - 2.0) * np.float32(scale * 1.732)


@dataclasses.dataclass
class SyntheticCriteo:
    """Iterator of batches: {'dense': [B,13] f32, 'cat': {Ci: [B] int32},
    'label': [B] f32}."""

    batch_size: int = 2048
    num_ids_per_col: int = 1_000_000
    zipf_a: float = 1.2
    signal_scale: float = 0.35
    dense_scale: float = 0.4
    seed: int = 0
    steps: Optional[int] = None

    def __iter__(self) -> Iterator[Dict]:
        rng = np.random.RandomState(self.seed)
        n = 0
        while self.steps is None or n < self.steps:
            yield self.sample(rng)
            n += 1

    def sample(self, rng: np.random.RandomState) -> Dict:
        b = self.batch_size
        dense = rng.randn(b, 13).astype(np.float32)
        cat = {}
        logit = np.full((b,), -1.2, np.float32)
        # dense features carry signal through a fixed projection
        vproj = _latent_weight(np.arange(13), 9999, self.dense_scale)
        logit += dense @ vproj
        for ci, col in enumerate(base.CATEGORICAL_COLUMNS):
            # Zipf-distributed ids, deduplicated into the column's space
            z = rng.zipf(self.zipf_a, size=b).astype(np.int64)
            ids = (_mix32_np((z % self.num_ids_per_col).astype(np.uint32), ci)
                   % np.uint32(self.num_ids_per_col)).astype(np.int32)
            # half the columns are informative, half noise (realistic)
            if ci % 2 == 0:
                logit += _latent_weight(ids, ci + 1, self.signal_scale)
            cat[col] = ids
        p = 1.0 / (1.0 + np.exp(-logit))
        label = (rng.rand(b) < p).astype(np.float32)
        return {"dense": dense, "cat": cat, "label": label}


def auc_numpy(scores: np.ndarray, labels: np.ndarray) -> float:
    """Exact AUC by rank statistic (for tests / host-side eval)."""

    order = np.argsort(scores, kind="mergesort")
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(1, len(scores) + 1)
    # average ranks for ties
    s_sorted = scores[order]
    i = 0
    while i < len(s_sorted):
        j = i
        while j + 1 < len(s_sorted) and s_sorted[j + 1] == s_sorted[i]:
            j += 1
        if j > i:
            ranks[order[i:j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    pos = labels > 0.5
    n_pos, n_neg = pos.sum(), (~pos).sum()
    if n_pos == 0 or n_neg == 0:
        return 0.5
    return float((ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))
