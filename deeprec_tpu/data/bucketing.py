"""Length-bucketed re-batching for variable-length behavior sequences.

The reference consumes true varlen ids as SparseTensors end-to-end
(python/ops/embedding_ops.py; sequence feature columns,
docs_en/Embedding-Variable.md §sequence) — ragged shapes are free in its
kernel model.  Under XLA shapes are static, so the TPU-native equivalent
is LENGTH BUCKETING: a handful of static history lengths (e.g. 8/32/50),
each with its own compiled step (jit's shape cache — the engine reads
lengths from the array shapes, never from TableSpec.seq_len), and a
host-side re-batcher that routes each sample to the smallest bucket that
fits its history.  A median-8/max-50 workload then runs most of its steps
at 5-6x fewer embedding positions than pad-to-max — the id-volume axis is
exactly what sequence-model steps are bound by (PERF.md: DIN's step cost
is engine-id-volume-bound).

Semantics: samples are REORDERED across batches (grouped by length) but
never altered — truncating trailing EMPTY columns is exact because every
consumer (sequence attention masks, MEAN/SUM combiners, the lookup phase)
derives its mask from the EMPTY sentinel per position.  With a single
bucket equal to the incoming padded length the stream is a bit-exact
pass-through (test_bucketing parity test).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, Optional, Sequence, Tuple

import numpy as np

EMPTY = np.int32(np.iinfo(np.int32).min)


def _seq_keys(batch: Dict) -> Tuple[str, ...]:
    """Sequence ID columns: 2-D *integer* cat columns.  Float columns
    riding in ``cat`` are per-position combiner weights (the serving
    layout — serve/http_server._v2_request_to_batch), not ids: they carry
    no EMPTY sentinel, so they must not vote on lengths."""

    return tuple(k for k, v in batch["cat"].items()
                 if np.ndim(v) == 2 and v.shape[1] > 1
                 and np.issubdtype(np.asarray(v).dtype, np.integer))


def _lengths(batch: Dict, seq_keys: Sequence[str]) -> np.ndarray:
    """Per-sample history length = max over sequence columns of
    1 + the LAST non-EMPTY position (not the count: multivalent bags may
    carry interior EMPTY components, and truncation must never drop a
    live trailing id)."""

    ln = None
    for k in seq_keys:
        arr = np.asarray(batch["cat"][k])
        present = arr != EMPTY
        any_p = present.any(axis=1)
        last = arr.shape[1] - np.argmax(present[:, ::-1], axis=1)
        cur = np.where(any_p, last, 0)
        ln = cur if ln is None else np.maximum(ln, cur)
    return ln


def _slice_sample_rows(batch: Dict, idx: np.ndarray, seq_keys,
                       seq_widths, trunc: int) -> Dict:
    """Rows ``idx`` of every batch column; sequence id columns — and any
    per-position companion column sharing their padded width (float
    combiner weights in ``cat`` or in the ``weights`` dict) — truncated to
    ``trunc`` positions (the dropped tail is all-EMPTY by bucket choice,
    so ids and weights stay position-aligned)."""

    def _trunc_too(v):
        return np.ndim(v) == 2 and v.shape[1] in seq_widths

    out = {}
    for key, val in batch.items():
        if key == "cat":
            out["cat"] = {
                k: (np.asarray(v)[idx, :trunc]
                    if k in seq_keys or _trunc_too(v)
                    else np.asarray(v)[idx])
                for k, v in val.items()}
        elif isinstance(val, dict):  # e.g. 'weights'
            out[key] = {
                k: (np.asarray(v)[idx, :trunc] if _trunc_too(v)
                    else np.asarray(v)[idx])
                for k, v in val.items()}
        else:
            out[key] = np.asarray(val)[idx]
    return out


def _concat_batches(parts, n: int) -> Tuple[Dict, Optional[Dict]]:
    """First ``n`` rows of the concatenated parts as one batch + the
    remainder part (or None)."""

    def cat(get):
        arrs = [get(p) for p in parts]
        return np.concatenate(arrs, axis=0)

    total = sum(len(p["label"]) for p in parts)
    merged = {}
    for key, val in parts[0].items():
        if isinstance(val, dict):
            merged[key] = {k: cat(lambda p: p[key][k]) for k in val}
        else:
            merged[key] = cat(lambda p: p[key])

    def take(tree, lo, hi):
        return {k: ({kk: vv[lo:hi] for kk, vv in v.items()}
                    if isinstance(v, dict) else v[lo:hi])
                for k, v in tree.items()}

    head = take(merged, 0, n)
    rest = take(merged, n, total) if total > n else None
    return head, rest


@dataclasses.dataclass
class LengthBucketedStream:
    """Wrap a padded-batch iterator into length-homogeneous batches.

    ``buckets`` are ascending static history lengths; each sample routes to
    the smallest bucket >= its length (samples longer than the last bucket
    are truncated to it — pad-to-max equivalence requires the last bucket
    to equal the generator's max).  Emits batches of exactly
    ``batch_size`` rows (default: the incoming batch size) as full buckets
    fill; at end of stream ragged remainders are emitted as smaller
    final batches unless ``drop_remainder`` (no flush() method —
    round-5 review corrected this docstring)."""

    it: Iterator[Dict]
    buckets: Sequence[int] = (8, 32, 50)
    batch_size: Optional[int] = None
    drop_remainder: bool = True

    def __iter__(self) -> Iterator[Dict]:
        buckets = sorted(self.buckets)
        pending: Dict[int, list] = {b: [] for b in buckets}
        counts: Dict[int, int] = {b: 0 for b in buckets}
        bs = self.batch_size
        seq_keys: Tuple[str, ...] = ()
        seq_widths: frozenset = frozenset()
        for batch in self.it:
            if bs is None:
                bs = len(np.asarray(batch["label"]))
            if not seq_keys:
                seq_keys = _seq_keys(batch)
                if not seq_keys:
                    # no sequence columns: nothing to bucket
                    yield batch
                    continue
                seq_widths = frozenset(
                    np.asarray(batch["cat"][k]).shape[1] for k in seq_keys)
            ln = _lengths(batch, seq_keys)
            bidx = np.searchsorted(buckets, np.minimum(ln, buckets[-1]))
            for bi, b in enumerate(buckets):
                idx = np.nonzero(bidx == bi)[0]
                if not len(idx):
                    continue
                pending[b].append(
                    _slice_sample_rows(batch, idx, seq_keys, seq_widths, b))
                counts[b] += len(idx)
                while counts[b] >= bs:
                    head, rest = _concat_batches(pending[b], bs)
                    pending[b] = [rest] if rest is not None else []
                    counts[b] -= bs
                    yield head
        if not self.drop_remainder:
            for b in buckets:
                if counts[b]:
                    head, _ = _concat_batches(pending[b], counts[b])
                    yield head
