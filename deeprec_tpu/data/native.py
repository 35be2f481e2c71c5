"""ctypes bindings + on-demand build of the native data-plane library.

pybind11 is not available in this image; the C ABI + ctypes keeps the
native boundary simple (SURVEY.md §2.8 native-component checklist).
The library is compiled once per machine into ``~/.cache/deeprec_tpu``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_LOCK = threading.Lock()
_LIB = None

_SRC_DIR = Path(__file__).resolve().parent.parent.parent / "native"


def _build(src: Path, out: Path) -> None:
    out.parent.mkdir(parents=True, exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", str(out), str(src)]
    subprocess.run(cmd, check=True, capture_output=True)


def lib() -> ctypes.CDLL:
    """Load (building if needed) the native library."""

    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        src = _SRC_DIR / "criteo_parser.cc"
        cache = Path(os.environ.get(
            "DEEPREC_TPU_CACHE", os.path.expanduser("~/.cache/deeprec_tpu")))
        out = cache / "libdeeprec_native.so"
        if not out.exists() or out.stat().st_mtime < src.stat().st_mtime:
            _build(src, out)
        L = ctypes.CDLL(str(out))
        L.criteo_parse.restype = ctypes.c_int64
        L.criteo_parse.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
        ]
        L.criteo_parse_mt.restype = ctypes.c_int64
        L.criteo_parse_mt.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
        ]
        _LIB = L
        return L


def criteo_parse(buf: bytes, max_rows: int, nthreads: int = 0):
    """Parse Criteo TSV bytes -> (labels [N], dense [N,13], cats [N,26],
    consumed_bytes).  nthreads=0 uses DEEPREC_PARSER_THREADS (default: cpu
    count, capped at 8)."""

    L = lib()
    if nthreads <= 0:
        nthreads = int(os.environ.get("DEEPREC_PARSER_THREADS",
                                      min(os.cpu_count() or 1, 8)))
    # a Criteo row is >= ~30 bytes; don't allocate output for more rows than
    # the buffer can possibly contain (huge over-allocation dominates runtime)
    max_rows = min(max_rows, len(buf) // 30 + 1)
    labels = np.empty((max_rows,), np.float32)
    dense = np.empty((max_rows, 13), np.float32)
    cats = np.empty((max_rows, 26), np.int32)
    consumed = ctypes.c_int64(0)
    n = L.criteo_parse_mt(
        buf, len(buf), max_rows, nthreads,
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dense.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cats.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.byref(consumed),
    )
    return labels[:n], dense[:n], cats[:n], consumed.value
