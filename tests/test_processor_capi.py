"""C-ABI serving processor test: dlopen the real shared library via ctypes
and drive the reference's four-function surface (processor.h: initialize /
process / batch_process / get_serving_model_info) end-to-end.  The shim
embeds CPython; under pytest the interpreter already exists, so the shim
bridges through PyGILState — the same path a C++ host application takes.
"""

import ctypes
import json
import shutil

import numpy as np
import pytest

if shutil.which("g++") is None:
    pytest.skip("no g++ in image", allow_module_level=True)


def _train_registry_model(tmp):
    """Train a REGISTRY model briefly and save with model_name so the
    artifact is self-describing (the C surface has no model object)."""

    import jax
    import optax

    from deeprec_tpu.data.synthetic import SyntheticCriteo
    from deeprec_tpu.models import base, get_model
    from deeprec_tpu.optimizers import sparse
    from deeprec_tpu.train import saver
    from deeprec_tpu.train.loop import Trainer

    model = get_model("wdl")
    tables = base.make_tables(model, capacity=2 ** 10)
    tr = Trainer(model=model, tables=tables,
                 sparse_optimizer=sparse.adagrad(lr=0.05),
                 dense_tx=optax.adagrad(0.05))
    state = tr.init_state(jax.random.PRNGKey(0))
    gen = SyntheticCriteo(batch_size=128, num_ids_per_col=300, seed=1)
    it = iter(gen)
    for _ in range(4):
        state, _ = tr.train_step(state, next(it))
    saver.save_checkpoint(str(tmp), state, model_name="wdl")
    return model, it


@pytest.fixture(scope="module")
def capi(tmp_path_factory):
    from deeprec_tpu.serve import capi as pycapi

    tmp = tmp_path_factory.mktemp("capi_ckpt")
    model, it = _train_registry_model(tmp)
    lib = ctypes.CDLL(pycapi.build_library())
    lib.initialize.restype = ctypes.c_void_p
    lib.initialize.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                               ctypes.POINTER(ctypes.c_int)]
    lib.process.restype = ctypes.c_int
    lib.process.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
                            ctypes.POINTER(ctypes.c_void_p),
                            ctypes.POINTER(ctypes.c_int)]
    lib.get_serving_model_info.restype = ctypes.c_int
    lib.get_serving_model_info.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_int)]
    lib.shutdown_handle.argtypes = [ctypes.c_void_p]
    return lib, str(tmp), model, it


def _read_out(out_p, out_n):
    data = ctypes.string_at(out_p.value, out_n.value)
    return json.loads(data.decode())


def test_capi_lifecycle_process_info(capi):
    lib, ckpt_dir, model, it = capi
    state = ctypes.c_int(-2)
    cfgb = json.dumps({"session_num": 1, "bucket_sizes": [64]}).encode()
    h = lib.initialize(ckpt_dir.encode(), cfgb, ctypes.byref(state))
    assert state.value == 0 and h

    out_p, out_n = ctypes.c_void_p(), ctypes.c_int()
    rc = lib.get_serving_model_info(h, ctypes.byref(out_p),
                                    ctypes.byref(out_n))
    assert rc == 0
    info = _read_out(out_p, out_n)
    assert info["version"].startswith("step_")

    b = next(it)
    req = json.dumps({
        "dense": np.asarray(b["dense"][:10], np.float64).tolist(),
        "cat": {k: np.asarray(v[:10]).tolist() for k, v in b["cat"].items()},
    }).encode()
    rc = lib.process(h, req, len(req), ctypes.byref(out_p),
                     ctypes.byref(out_n))
    assert rc == 0
    resp = _read_out(out_p, out_n)
    scores = np.asarray(resp["scores"])
    assert scores.shape == (10,)
    assert np.all((scores >= 0) & (scores <= 1))

    # parity with the in-process Processor on the same request
    from deeprec_tpu.serve.processor import Processor

    p = Processor.from_saved(ckpt_dir,
                             config={"session_num": 1, "bucket_sizes": [64],
                                     "warmup": False})
    want = p.predict({"dense": np.asarray(b["dense"][:10], np.float32),
                      "cat": {k: np.asarray(v[:10], np.int32)
                              for k, v in b["cat"].items()}})
    np.testing.assert_allclose(scores, np.asarray(want, np.float64),
                               atol=2e-7)
    p.shutdown()
    lib.shutdown_handle(h)


def test_capi_bad_model_dir_reports_error(capi):
    lib, ckpt_dir, model, it = capi
    state = ctypes.c_int(0)
    h = lib.initialize(b"/nonexistent/dir", b"{}", ctypes.byref(state))
    assert state.value != 0 and not h
