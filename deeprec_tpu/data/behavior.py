"""Synthetic user-behavior logs (Amazon/Taobao style) with planted signal.

Replaces the reference's Amazon Books / Taobao datasets (modelzoo/din,
dien, bst — download scripts need network) for sequence-attention ranking
models: each user has a latent interest cluster; their history is drawn
mostly from that cluster, and a candidate item from the same cluster is
clicked with high probability.  A model that attends over history and
compares with the target recovers the cluster structure (AUC well above 0.5);
a model ignoring history cannot.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, Optional

import numpy as np


@dataclasses.dataclass
class SyntheticBehavior:
    """Batches: {'dense': [B,1], 'cat': {'item': [B], 'category': [B],
    'hist_item': [B,L], 'hist_category': [B,L]}, 'label': [B]}."""

    batch_size: int = 512
    num_items: int = 200_000
    num_categories: int = 1000
    num_clusters: int = 64
    seq_len: int = 30
    p_in_cluster: float = 0.8
    p_click_match: float = 0.75
    p_click_mismatch: float = 0.25
    seed: int = 0
    steps: Optional[int] = None
    # None: uniform lengths in [seq_len//2, seq_len] (the default regime).
    # An int: SKEWED lengths — lognormal with this median, clipped to
    # [1, seq_len] (real behavior histories are short-headed: most users
    # have a few events, a tail has hundreds — the length-bucketing
    # workload, data/bucketing.py).
    median_len: Optional[int] = None

    def __iter__(self) -> Iterator[Dict]:
        rng = np.random.RandomState(self.seed)
        n = 0
        while self.steps is None or n < self.steps:
            yield self.sample(rng)
            n += 1

    def _item_of_cluster(self, rng, cluster, size):
        # items partitioned into clusters by range
        per = self.num_items // self.num_clusters
        return (cluster * per + rng.randint(0, per, size=size)).astype(np.int32)

    def sample(self, rng: np.random.RandomState) -> Dict:
        b, l = self.batch_size, self.seq_len
        user_cluster = rng.randint(0, self.num_clusters, size=b)
        # history: mostly in-cluster items, padded with -history-length tail
        in_cluster = rng.rand(b, l) < self.p_in_cluster
        rand_cluster = rng.randint(0, self.num_clusters, size=(b, l))
        hist_cluster = np.where(in_cluster, user_cluster[:, None], rand_cluster)
        hist_item = self._item_of_cluster(rng, hist_cluster, (b, l))
        if self.median_len is None:
            hist_len = rng.randint(l // 2, l + 1, size=b)
        else:
            hist_len = np.clip(
                np.round(np.exp(rng.randn(b) * 0.8
                                + np.log(self.median_len))),
                1, l).astype(np.int64)
        # pad tail positions with the EMPTY sentinel (int32 min)
        pad = np.arange(l)[None, :] >= hist_len[:, None]
        EMPTY = np.int32(np.iinfo(np.int32).min)
        hist_item = np.where(pad, EMPTY, hist_item).astype(np.int32)
        hist_category = np.where(
            pad, EMPTY, (hist_cluster % self.num_categories)).astype(np.int32)

        # candidate: half from user's cluster
        match = rng.rand(b) < 0.5
        cand_cluster = np.where(match, user_cluster,
                                rng.randint(0, self.num_clusters, size=b))
        item = self._item_of_cluster(rng, cand_cluster, b)
        category = (cand_cluster % self.num_categories).astype(np.int32)
        is_match = cand_cluster == user_cluster
        p = np.where(is_match, self.p_click_match, self.p_click_mismatch)
        label = (rng.rand(b) < p).astype(np.float32)
        dense = rng.randn(b, 1).astype(np.float32)
        return {
            "dense": dense,
            "cat": {"item": item, "category": category,
                    "hist_item": hist_item, "hist_category": hist_category},
            "label": label,
        }


@dataclasses.dataclass
class SyntheticMultiTask:
    """Criteo-like batches with two correlated labels (ctr, conversion) for
    MMoE/ESMM/PLE/DBMTL/SimpleMultiTask."""

    batch_size: int = 512
    num_ids_per_col: int = 100_000
    seed: int = 0
    steps: Optional[int] = None

    def _attach_labels(self, batch: Dict, rng) -> Dict:
        click = batch.pop("label")
        # conversion only possible given click; adds its own noise
        conv = click * (rng.rand(len(click)) < 0.3).astype(np.float32)
        batch["labels"] = {"ctr": click, "ctcvr": conv}
        batch["label"] = click
        return batch

    def sample(self, rng: np.random.RandomState) -> Dict:
        from deeprec_tpu.data.synthetic import SyntheticCriteo

        base_gen = SyntheticCriteo(batch_size=self.batch_size,
                                   num_ids_per_col=self.num_ids_per_col,
                                   seed=self.seed)
        return self._attach_labels(base_gen.sample(rng), rng)

    def __iter__(self):
        from deeprec_tpu.data.synthetic import SyntheticCriteo

        base_gen = SyntheticCriteo(batch_size=self.batch_size,
                                   num_ids_per_col=self.num_ids_per_col,
                                   seed=self.seed)
        rng = np.random.RandomState(self.seed + 1)
        n = 0
        for batch in base_gen:
            if self.steps is not None and n >= self.steps:
                return
            yield self._attach_labels(batch, rng)
            n += 1
