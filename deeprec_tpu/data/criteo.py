"""Criteo TSV/Parquet input pipeline.

Readers for the Criteo Kaggle/Terabyte format the reference modelzoo trains
on (modelzoo/dlrm/data/README.md): label + 13 integer + 26 hex-categorical
columns.  TSV parsing runs through the native C++ parser
(native/criteo_parser.cc) — the ParquetDataset role is covered by pyarrow
batch reads (the reference's arrow-based parquet reader,
core/kernels/data/parquet_dataset_ops.cc).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from deeprec_tpu.models import base


def _to_batch(labels, dense, cats) -> Dict:
    return {
        "dense": dense,
        "cat": {c: cats[:, i].copy()
                for i, c in enumerate(base.CATEGORICAL_COLUMNS)},
        "label": labels,
    }


def emit_rows(bufs: List, batch_size: int) -> Dict:
    """Pop exactly ``batch_size`` rows off a deque of parsed row slabs
    [(labels, dense, cats), ...] and return one batch dict.  The caller
    guarantees the slabs hold >= batch_size rows.  Shared by CriteoTSV and
    the ODL TailStream (round-5 review: the take/min/pop logic was
    duplicated and could drift)."""

    need = batch_size
    out_l, out_d, out_c = [], [], []
    while need > 0:
        labels, dense, cats = bufs[0]
        take = min(need, len(labels))
        out_l.append(labels[:take])
        out_d.append(dense[:take])
        out_c.append(cats[:take])
        if take == len(labels):
            bufs.pop(0)
        else:
            bufs[0] = (labels[take:], dense[take:], cats[take:])
        need -= take
    return _to_batch(np.concatenate(out_l),
                     np.concatenate(out_d),
                     np.concatenate(out_c))


@dataclasses.dataclass
class CriteoTSV:
    """Stream batches from Criteo-format TSV file(s) via the native parser.

    Rows CARRY ACROSS file boundaries (and epochs under ``loop``): with 10
    shard files of 3000 rows at batch 2048, every row trains — the old
    per-file accounting silently dropped up to batch_size-1 trailing rows
    at every boundary, ~31% of that dataset (round-5 review; the Parquet
    reader already stitched across files).  Only the stream's FINAL
    sub-batch remainder is dropped (fixed batch shapes)."""

    paths: Sequence[str]
    batch_size: int = 2048
    loop: bool = False
    read_chunk: int = 8 << 20

    def __iter__(self) -> Iterator[Dict]:
        bufs: List = []
        have = 0
        while True:
            for path in self.paths:
                for slab in self._parse_file(path):
                    bufs.append(slab)
                    have += len(slab[0])
                    while have >= self.batch_size:
                        yield emit_rows(bufs, self.batch_size)
                        have -= self.batch_size
            if not self.loop:
                return

    def _parse_file(self, path: str):
        """Yield parsed row slabs (labels, dense, cats) for one file —
        line reassembly (read-chunk carry) is per-file; row batching is
        the caller's, so rows flow across file boundaries."""

        from deeprec_tpu.data import native

        carry = b""
        with open(path, "rb") as f:
            while True:
                chunk = f.read(self.read_chunk)
                if not chunk:
                    break
                data = carry + chunk
                labels, dense, cats, consumed = native.criteo_parse(
                    data, max_rows=1 << 22)
                carry = data[consumed:]
                if len(labels):
                    yield labels, dense, cats
        # final partial line (no trailing newline): parse remainder + \n
        if carry.strip():
            labels, dense, cats, _ = native.criteo_parse(carry + b"\n",
                                                         max_rows=1 << 20)
            if len(labels):
                yield labels, dense, cats


@dataclasses.dataclass
class CriteoParquet:
    """Parquet batch reader (ParquetDataset capability) via pyarrow."""

    paths: Sequence[str]
    batch_size: int = 2048
    loop: bool = False

    def __iter__(self) -> Iterator[Dict]:
        import pyarrow.parquet as pq

        cols = ([base.LABEL_COLUMN] + base.CONTINUOUS_COLUMNS
                + base.CATEGORICAL_COLUMNS)

        def decode(tbl):
            # nulls -> 0, matching the TSV parser's missing-value mapping
            # (real Criteo has pervasive missing fields; round-4 review)
            def col(c, dt):
                a = np.asarray(
                    [0 if v is None else v for v in tbl[c]], dt)
                return a

            labels = col(base.LABEL_COLUMN, np.float32)
            dense = np.stack(
                [np.log1p(np.maximum(col(c, np.float32), 0.0))
                 for c in base.CONTINUOUS_COLUMNS], axis=1)
            cats = np.stack(
                [col(c, np.int64).astype(np.int32) & 0x7FFFFFFF
                 for c in base.CATEGORICAL_COLUMNS], axis=1)
            return labels, dense, cats

        # pyarrow's batch_size is a MAXIMUM and batches never span row
        # groups — short batches occur at EVERY row-group boundary, so
        # they must be carried and stitched, not dropped (round-4 review:
        # the old `continue` silently lost ~rows%row_group per group).
        pend: list = []
        n_pend = 0
        while True:
            for path in self.paths:
                pf = pq.ParquetFile(path)
                for rb in pf.iter_batches(batch_size=self.batch_size,
                                          columns=cols):
                    pend.append(decode(rb.to_pydict()))
                    n_pend += len(pend[-1][0])
                    while n_pend >= self.batch_size:
                        labels = np.concatenate([p[0] for p in pend])
                        dense = np.concatenate([p[1] for p in pend])
                        cats = np.concatenate([p[2] for p in pend])
                        b = self.batch_size
                        yield _to_batch(labels[:b], dense[:b], cats[:b])
                        pend = ([(labels[b:], dense[b:], cats[b:])]
                                if len(labels) > b else [])
                        n_pend = len(labels) - b
            if not self.loop:
                return
