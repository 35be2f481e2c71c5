// C-ABI serving processor — the reference's embed-anywhere property
// (serving/processor/serving/processor.h: initialize / process /
// batch_process / get_serving_model_info as extern "C" symbols a host
// application dlopens).  The TPU-native implementation embeds CPython and
// forwards to deeprec_tpu.serve.capi, which owns the Processor object:
// the compute path stays JAX/XLA, the ABI stays four C functions.
//
// Payloads are UTF-8 JSON (request: {"dense": [[...]], "cat": {...}};
// response: {"scores": [...]}) rather than the reference's serialized
// TF PredictRequest — this framework has no TF proto dependency; the
// JSON schema matches the HTTP /v1/predict surface byte-for-byte.
//
// Threading: safe to call from any host thread.  If this process has no
// interpreter yet, the first initialize() creates one and releases the
// GIL; every call then bridges via PyGILState_Ensure/Release (also
// correct when the host application IS a Python process, e.g. tests).
//
// Build: g++ -shared -fPIC processor_capi.cc $(python3-config --embed
// --ldflags) -I$(python3 -c "import sysconfig; print(sysconfig.get_path(
// 'include'))") — deeprec_tpu/serve/capi.py drives this on demand.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdlib>
#include <cstring>
#include <mutex>

namespace {

std::once_flag g_init_once;

void ensure_interpreter() {
  std::call_once(g_init_once, [] {
    if (!Py_IsInitialized()) {
      Py_InitializeEx(0);
      // release the GIL the init call left with this thread so other
      // host threads can enter via PyGILState_Ensure
      PyEval_SaveThread();
    }
  });
}

// Copy a python bytes/str into a malloc'd buffer the caller frees.
int out_bytes(PyObject* obj, void** data, int* size) {
  char* buf = nullptr;
  Py_ssize_t n = 0;
  if (PyBytes_Check(obj)) {
    if (PyBytes_AsStringAndSize(obj, &buf, &n) != 0) return -1;
  } else if (PyUnicode_Check(obj)) {
    buf = const_cast<char*>(PyUnicode_AsUTF8AndSize(obj, &n));
    if (!buf) return -1;
  } else {
    return -1;
  }
  *data = std::malloc(n);
  if (!*data) return -1;
  std::memcpy(*data, buf, n);
  *size = static_cast<int>(n);
  return 0;
}

PyObject* capi_attr(const char* name) {
  PyObject* mod = PyImport_ImportModule("deeprec_tpu.serve.capi");
  if (!mod) return nullptr;
  PyObject* fn = PyObject_GetAttrString(mod, name);
  Py_DECREF(mod);
  return fn;
}

}  // namespace

extern "C" {

// Returns an opaque handle (owned PyObject*), nullptr on failure.
// *state = 0 ok, non-zero error (mirrors processor.h's contract).
void* initialize(const char* model_entry, const char* model_config,
                 int* state) {
  ensure_interpreter();
  PyGILState_STATE g = PyGILState_Ensure();
  void* handle = nullptr;
  PyObject* fn = capi_attr("initialize");
  if (fn) {
    PyObject* r = PyObject_CallFunction(fn, "ss", model_entry ? model_entry : "",
                                        model_config ? model_config : "{}");
    Py_DECREF(fn);
    if (r) {
      handle = r;  // keep the reference as the handle
    }
  }
  if (!handle && PyErr_Occurred()) PyErr_Print();
  if (state) *state = handle ? 0 : -1;
  PyGILState_Release(g);
  return handle;
}

int process(void* model_buf, const void* input_data, int input_size,
            void** output_data, int* output_size) {
  if (!model_buf || !input_data) return -1;
  PyGILState_STATE g = PyGILState_Ensure();
  int rc = -1;
  PyObject* fn = capi_attr("process");
  if (fn) {
    PyObject* r = PyObject_CallFunction(
        fn, "Oy#", static_cast<PyObject*>(model_buf),
        static_cast<const char*>(input_data),
        static_cast<Py_ssize_t>(input_size));
    Py_DECREF(fn);
    if (r) {
      rc = out_bytes(r, output_data, output_size);
      Py_DECREF(r);
    }
  }
  if (rc != 0 && PyErr_Occurred()) PyErr_Print();
  PyGILState_Release(g);
  return rc;
}

// CONTRACT (round-5 review — make the array convention explicit):
// ``input_data`` MUST be terminated by a nullptr entry; ``input_size``,
// ``output_data`` and ``output_size`` must each have at least as many
// entries as there are non-null inputs.  On success every output slot
// holds a malloc'd buffer the caller frees.  On failure at request i the
// return value is non-zero and every output slot from i onward is set to
// {nullptr, 0} — slots [0, i) were filled and must still be freed by the
// caller (no leaked or uninitialized pointers either way).
int batch_process(void* model_buf, const void* input_data[], int* input_size,
                  void* output_data[], int* output_size) {
  // The python side batches internally (session lanes); the C surface
  // simply loops — parity with processor.h's signature.
  if (!model_buf || !input_data || !input_size || !output_data ||
      !output_size)
    return -1;
  for (int i = 0; input_data[i] != nullptr; ++i) {
    int rc = process(model_buf, input_data[i], input_size[i],
                     &output_data[i], &output_size[i]);
    if (rc != 0) {
      for (int j = i; input_data[j] != nullptr; ++j) {
        output_data[j] = nullptr;
        output_size[j] = 0;
      }
      return rc;
    }
  }
  return 0;
}

int get_serving_model_info(void* model_buf, void** output_data,
                           int* output_size) {
  if (!model_buf) return -1;
  PyGILState_STATE g = PyGILState_Ensure();
  int rc = -1;
  PyObject* fn = capi_attr("model_info");
  if (fn) {
    PyObject* r = PyObject_CallFunction(fn, "O",
                                        static_cast<PyObject*>(model_buf));
    Py_DECREF(fn);
    if (r) {
      rc = out_bytes(r, output_data, output_size);
      Py_DECREF(r);
    }
  }
  if (rc != 0 && PyErr_Occurred()) PyErr_Print();
  PyGILState_Release(g);
  return rc;
}

void shutdown_handle(void* model_buf) {
  if (!model_buf) return;
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject* fn = capi_attr("shutdown");
  if (fn) {
    PyObject* r = PyObject_CallFunction(fn, "O",
                                        static_cast<PyObject*>(model_buf));
    Py_XDECREF(r);
    Py_DECREF(fn);
  }
  Py_DECREF(static_cast<PyObject*>(model_buf));
  PyGILState_Release(g);
}

}  // extern "C"
