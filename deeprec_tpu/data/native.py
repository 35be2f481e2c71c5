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


_SOURCES = ("criteo_parser.cc", "host_kv.cc")


def sanitize_flags() -> list:
    """Extra g++ flags from DEEPREC_TPU_SANITIZE=thread|address — the
    TSAN/ASAN CI hook (cibuild/sanitize.sh; SURVEY §5: 'the C++ host tier
    cache needs TSAN CI')."""

    san = os.environ.get("DEEPREC_TPU_SANITIZE", "")
    if not san:
        return []
    return [f"-fsanitize={san}", "-O1", "-g", "-fno-omit-frame-pointer"]


def sanitize_tag() -> str:
    """Cache-key component for the sanitize mode: instrumented and
    production builds must never share a .so (an mtime-only check would
    silently reuse whichever was built last — the 'clean' sanitizer run
    would then exercise uninstrumented code)."""

    san = os.environ.get("DEEPREC_TPU_SANITIZE", "")
    return f".{san}" if san else ""


def _build(srcs, out: Path) -> None:
    """Compile to a process-unique temp name and os.replace into place:
    concurrent builders (multi-controller JAX, pytest-xdist) must never
    dlopen a partially-written .so or interleave two g++ writes to the
    same path (round-4 review)."""

    out.parent.mkdir(parents=True, exist_ok=True)
    tmp = out.with_name(f"{out.name}.tmp.{os.getpid()}")
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
           *sanitize_flags(), "-o", str(tmp)] + [str(s) for s in srcs]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, out)
    finally:
        if tmp.exists():
            tmp.unlink()


def lib() -> ctypes.CDLL:
    """Load (building if needed) the native library."""

    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        srcs = [_SRC_DIR / s for s in _SOURCES]
        cache = Path(os.environ.get(
            "DEEPREC_TPU_CACHE", os.path.expanduser("~/.cache/deeprec_tpu")))
        out = cache / f"libdeeprec_native{sanitize_tag()}.so"
        if (not out.exists()
                or out.stat().st_mtime < max(s.stat().st_mtime for s in srcs)):
            _build(srcs, out)
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
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64p = ctypes.POINTER(ctypes.c_int64)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        L.hkv_create.restype = ctypes.c_void_p
        L.hkv_create.argtypes = [ctypes.c_int64, ctypes.c_int64]
        L.hkv_destroy.argtypes = [ctypes.c_void_p]
        L.hkv_enable_ssd.restype = ctypes.c_int32
        L.hkv_enable_ssd.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                     ctypes.c_int64]
        L.hkv_upsert.argtypes = [ctypes.c_void_p, ctypes.c_int64, i64p, u8p, u32p]
        L.hkv_lookup.restype = ctypes.c_int64
        L.hkv_lookup.argtypes = [ctypes.c_void_p, ctypes.c_int64, i64p, u8p,
                                 u32p, u8p, ctypes.c_int32]
        L.hkv_size.restype = ctypes.c_int64
        L.hkv_size.argtypes = [ctypes.c_void_p]
        L.hkv_dram_rows.restype = ctypes.c_int64
        L.hkv_dram_rows.argtypes = [ctypes.c_void_p]
        L.hkv_log_bytes.restype = ctypes.c_int64
        L.hkv_log_bytes.argtypes = [ctypes.c_void_p]
        L.hkv_export.restype = ctypes.c_int64
        L.hkv_export.argtypes = [ctypes.c_void_p, ctypes.c_int64, i64p, u8p, u32p]
        L.hkv_compact.restype = ctypes.c_int64
        L.hkv_compact.argtypes = [ctypes.c_void_p]
        L.hkv_io_errors.restype = ctypes.c_int64
        L.hkv_io_errors.argtypes = [ctypes.c_void_p]
        _LIB = L
        return L


class HostKV:
    """Pythonic handle over the native host KV (rows are flat float32)."""

    def __init__(self, row_floats: int, capacity_hint: int = 1024):
        self._L = lib()
        self.row_floats = int(row_floats)
        self.row_bytes = self.row_floats * 4
        self._h = self._L.hkv_create(self.row_bytes, capacity_hint)

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._L.hkv_destroy(self._h)
        except Exception:
            pass

    def enable_ssd(self, path: str, max_dram_rows: int) -> None:
        rc = self._L.hkv_enable_ssd(self._h, path.encode(), max_dram_rows)
        if rc != 0:
            raise OSError(f"cannot open ssd log at {path}")

    def upsert(self, keys: np.ndarray, rows: np.ndarray,
               freqs: np.ndarray | None = None) -> None:
        keys = np.ascontiguousarray(keys, np.int64)
        rows = np.ascontiguousarray(rows, np.float32)
        assert rows.shape == (len(keys), self.row_floats)
        fp = (np.ascontiguousarray(freqs, np.uint32).ctypes
              .data_as(ctypes.POINTER(ctypes.c_uint32))
              if freqs is not None else None)
        self._L.hkv_upsert(
            self._h, len(keys),
            keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            rows.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), fp)

    def lookup(self, keys: np.ndarray, erase: bool = False):
        """-> (rows [N, row_floats] f32, freqs [N] u32, found [N] bool)."""

        keys = np.ascontiguousarray(keys, np.int64)
        n = len(keys)
        rows = np.zeros((n, self.row_floats), np.float32)
        freqs = np.zeros((n,), np.uint32)
        found = np.zeros((n,), np.uint8)
        self._L.hkv_lookup(
            self._h, n,
            keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            rows.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            freqs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            found.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            1 if erase else 0)
        return rows, freqs, found.astype(bool)

    def export(self, max_n: int | None = None):
        n = max_n if max_n is not None else self.size
        keys = np.zeros((n,), np.int64)
        rows = np.zeros((n, self.row_floats), np.float32)
        freqs = np.zeros((n,), np.uint32)
        m = self._L.hkv_export(
            self._h, n,
            keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            rows.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            freqs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
        return keys[:m], rows[:m], freqs[:m]

    def compact(self) -> int:
        return self._L.hkv_compact(self._h)

    @property
    def size(self) -> int:
        return self._L.hkv_size(self._h)

    @property
    def dram_rows(self) -> int:
        return self._L.hkv_dram_rows(self._h)

    @property
    def log_bytes(self) -> int:
        return self._L.hkv_log_bytes(self._h)

    @property
    def io_errors(self) -> int:
        """Cumulative failed SSD-log reads/writes (0 = healthy; growth
        means disk trouble — evictions stay in DRAM, compactions abort
        with the old log intact, short reads zero-fill; round-5 review)."""

        return self._L.hkv_io_errors(self._h)


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
