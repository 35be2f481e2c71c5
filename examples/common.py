"""Shared example plumbing: pick the input source from the command line.

Every example defaults to synthetic planted-signal data; point it at real
Criteo files (the reference modelzoo's input path, modelzoo/dlrm/train.py
build_model_input) with:

    python examples/01_wdl_single_host.py --data tsv:/data/train.txt
    python examples/03_dlrm_sharded.py --data parquet:/data/day_0.parquet

Multiple files: comma-separate the paths.  Eval uses --eval-data the same
way (defaults to a differently-seeded synthetic stream).
"""

import sys

from deeprec_tpu.data.synthetic import SyntheticCriteo


def _flag(name):
    for i, a in enumerate(sys.argv):
        if a == name and i + 1 < len(sys.argv):
            return sys.argv[i + 1]
        if a.startswith(name + "="):
            return a.split("=", 1)[1]
    return None


def make_data(batch_size, *, seed=1, flag="--data", loop=True):
    """Iterator of batches per the --data flag (synthetic if absent)."""

    spec = _flag(flag)
    if spec is None or spec == "synthetic":
        return iter(SyntheticCriteo(batch_size=batch_size, seed=seed))
    kind, _, paths = spec.partition(":")
    files = [p for p in paths.split(",") if p]
    if kind == "tsv":
        from deeprec_tpu.data.criteo import CriteoTSV

        return iter(CriteoTSV(files, batch_size=batch_size, loop=loop))
    if kind == "parquet":
        from deeprec_tpu.data.criteo import CriteoParquet

        return iter(CriteoParquet(files, batch_size=batch_size, loop=loop))
    raise SystemExit(f"unknown --data kind {kind!r} (tsv|parquet|synthetic)")


def make_eval_data(batch_size, *, seed=99):
    return make_data(batch_size, seed=seed, flag="--eval-data", loop=False)
