"""Python side of the C-ABI serving processor (native/processor_capi.cc).

The reference ships serving as a C shared library a host application
dlopens (serving/processor/serving/processor.h); the TPU-native twin
keeps that four-function ABI and forwards here.  ``build_library()``
compiles the shim on demand (same pattern as data/native.py); the
functions below are what the embedded interpreter calls.

Request/response payloads are UTF-8 JSON matching the HTTP /v1/predict
schema: {"dense": [[...]], "cat": {col: [...]}} -> {"scores": [...]}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sysconfig
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parent.parent.parent / "native" / "processor_capi.cc"


def build_library() -> str:
    """Compile (once per machine) and return the path of the C-ABI .so."""

    cache = Path(os.environ.get(
        "DEEPREC_TPU_CACHE", os.path.expanduser("~/.cache/deeprec_tpu")))
    from deeprec_tpu.data.native import sanitize_tag

    out = cache / f"libdeeprec_processor{sanitize_tag()}.so"
    if out.exists() and out.stat().st_mtime >= _SRC.stat().st_mtime:
        return str(out)
    out.parent.mkdir(parents=True, exist_ok=True)
    inc = sysconfig.get_path("include")
    libdir = sysconfig.get_config_var("LIBDIR") or "/usr/local/lib"
    ver = sysconfig.get_config_var("LDVERSION") or "3.12"
    from deeprec_tpu.data.native import sanitize_flags

    # temp-then-rename: concurrent builders must never dlopen a
    # partially-written .so (same contract as data/native._build)
    tmp = out.with_name(f"{out.name}.tmp.{os.getpid()}")
    cmd = ["g++", "-O2", "-shared", "-fPIC", *sanitize_flags(), str(_SRC),
           f"-I{inc}", f"-L{libdir}", f"-lpython{ver}",
           f"-Wl,-rpath,{libdir}", "-o", str(tmp)]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, out)
    finally:
        if tmp.exists():
            tmp.unlink()
    return str(out)


# ---------------------------------------------------------------------------
# entry points the C shim calls (one python object per handle)


def initialize(model_entry: str, model_config: str):
    """-> Processor handle.  ``model_entry`` is the checkpoint/model dir
    (the reference's saved-model path role); ``model_config`` the JSON
    config blob (processor.h model_config)."""

    from deeprec_tpu.serve.processor import Processor

    config = json.loads(model_config) if model_config.strip() else {}
    config.setdefault("warmup", False)
    return Processor.from_saved(model_entry, config=config)


def process(proc, request_bytes: bytes) -> bytes:
    req = json.loads(request_bytes.decode("utf-8"))
    dense = np.asarray(req["dense"], np.float32)
    from deeprec_tpu.serve.processor import cast_cat

    cat = {k: cast_cat(v) for k, v in req.get("cat", {}).items()}
    scores = proc.predict({"dense": dense, "cat": cat})
    return json.dumps(
        {"scores": np.asarray(scores, np.float64).round(7).tolist()}
    ).encode("utf-8")


def model_info(proc) -> bytes:
    return json.dumps(proc.get_serving_model_info()).encode("utf-8")


def shutdown(proc) -> None:
    proc.shutdown()
