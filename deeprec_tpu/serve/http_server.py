"""Minimal HTTP serving frontend over the Processor (stdlib only).

The reference ships ``libserving_processor.so`` consumed by an RPC frame
(TF-Serving fork / Triton backend, docs_en/Processor.md); the equivalent
deployable surface here is a tiny JSON-over-HTTP server wrapping
``Processor`` — production deployments would put this behind a real frame,
but the endpoint contract matches ``process()``/``get_serving_model_info``:

  POST /v1/predict               single-model predict
  POST /v1/models/<name>:predict  multi-model predict (ModelManager)
  GET  /v1/model                  serving model info JSON
  GET  /v1/models                 {name: info} for every hosted model

Additionally speaks the KServe / Open Inference Protocol v2 — the HTTP API
of the reference's Triton deployment path (addons/triton,
docs_en/SessionGroup.md §TF-Serving) — so standard clients
(tritonclient.http, KServe) can hit it without a custom SDK:

  GET  /v2/health/live | /v2/health/ready
  GET  /v2/models/<name>          model metadata (inputs/outputs)
  GET  /v2/models/<name>/ready
  POST /v2/models/<name>/infer    {"inputs": [{name, shape, datatype, data}]}
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from deeprec_tpu.serve.processor import Processor, cast_cat


_V2_DTYPES = {"FP32": np.float32, "FP64": np.float64,
              "INT32": np.int32, "INT64": np.int64}


def _v2_metadata(proc) -> dict:
    """Open-Inference-Protocol model metadata from the model's specs."""

    from deeprec_tpu.serve.processor import request_schema

    inputs = [{"name": "dense", "datatype": "FP32",
               "shape": [-1, proc.model.dense_dim]}]
    # one shared walk with warmup (round-5 review): drift between the
    # advertised shapes and the warmup-primed shapes would reintroduce
    # the first-request compile stall
    for col, (kind, seq) in request_schema(proc.model).items():
        inputs.append({
            "name": col,
            "datatype": "FP32" if kind == "float" else "INT32",
            "shape": [-1, seq] if seq else [-1],
        })
    return {"name": proc.model.name, "platform": "deeprec_tpu",
            "versions": [str(proc.get_serving_model_info()["version"])],
            "inputs": inputs,
            "outputs": [{"name": "scores", "datatype": "FP32",
                         "shape": [-1]}]}


def _v2_request_to_batch(req: dict) -> dict:
    """Decode OIP inputs into the Processor's request dict."""

    dense = None
    cat = {}
    for inp in req["inputs"]:
        dt = _V2_DTYPES.get(inp.get("datatype", "FP32"))
        if dt is None:
            raise ValueError(f"unsupported datatype {inp['datatype']!r}")
        arr = np.asarray(inp["data"], dt).reshape(inp["shape"])
        if inp["name"] == "dense":
            dense = arr.astype(np.float32)
        else:
            cat[inp["name"]] = cast_cat(arr)
    if dense is None:
        raise ValueError("missing input tensor 'dense'")
    return {"dense": dense, "cat": cat}


def make_handler(target):
    """``target`` is a Processor (single-model) or a ModelManager."""

    from deeprec_tpu.serve.multi import ModelManager

    manager = target if isinstance(target, ModelManager) else None
    processor = None if manager is not None else target

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _v2_model(self, name):
            """Resolve a /v2 model name: manager lookup, or the single
            processor when the name matches its model."""

            if manager is not None:
                return manager.get(name)
            if processor is not None and name == processor.model.name:
                return processor
            raise KeyError(f"unknown model {name!r}")

        def do_GET(self):
            if self.path == "/v1/model" and processor is not None:
                self._send(200, processor.get_serving_model_info())
            elif self.path == "/v1/models" and manager is not None:
                self._send(200, manager.info())
            elif self.path in ("/v2/health/live", "/v2/health/ready"):
                self._send(200, {})
            elif self.path.startswith("/v2/models/"):
                rest = self.path[len("/v2/models/"):]
                name, _, tail = rest.partition("/")
                try:
                    proc = self._v2_model(name)
                except KeyError as e:
                    self._send(404, {"error": str(e)})
                    return
                if tail == "ready":
                    self._send(200, {})
                elif tail == "":
                    self._send(200, _v2_metadata(proc))
                else:
                    self._send(404, {"error": "unknown path"})
            else:
                self._send(404, {"error": "unknown path"})

        def _resolve(self):
            if self.path == "/v1/predict" and processor is not None:
                return processor
            if (manager is not None and self.path.startswith("/v1/models/")
                    and self.path.endswith(":predict")):
                name = self.path[len("/v1/models/"):-len(":predict")]
                return manager.get(name)
            if (self.path.startswith("/v2/models/")
                    and self.path.endswith("/infer")):
                name = self.path[len("/v2/models/"):-len("/infer")]
                return self._v2_model(name)
            return None

        def do_POST(self):
            try:
                proc = self._resolve()
            except KeyError as e:
                self._send(404, {"error": str(e)})
                return
            if proc is None:
                self._send(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                if self.path.endswith("/infer"):     # OIP v2 frame
                    request = _v2_request_to_batch(req)
                    scores = proc.predict(request)
                    self._send(200, {
                        "model_name": proc.model.name,
                        "id": req.get("id", ""),
                        "outputs": [{"name": "scores", "datatype": "FP32",
                                     "shape": [len(scores)],
                                     "data": scores.tolist()}]})
                    return
                request = {
                    "dense": np.asarray(req["dense"], np.float32),
                    # cast_cat: float columns are combiner weights and
                    # must not be truncated to int (shared wire rule)
                    "cat": {k: cast_cat(v) for k, v in req["cat"].items()},
                }
                scores = proc.predict(request)
                self._send(200, {"scores": scores.tolist()})
            except Exception as e:  # surface errors to the client
                self._send(400, {"error": f"{type(e).__name__}: {e}"})

    return Handler


class ServingServer:
    """serve(processor) on a port; .start() returns immediately."""

    def __init__(self, processor, port: int = 0,
                 host: str = "127.0.0.1"):
        """``processor``: a Processor or a ModelManager."""

        self.httpd = ThreadingHTTPServer((host, port),
                                         make_handler(processor))
        self.port = self.httpd.server_address[1]
        self._thread = threading.Thread(target=self.httpd.serve_forever,
                                        daemon=True)

    def start(self) -> "ServingServer":
        self._thread.start()
        return self

    def stop(self):
        self.httpd.shutdown()
        # release the bound listening socket too — shutdown() only stops
        # serve_forever, and a start/stop cycle per test (or a supervisor
        # restart on a fixed port) would otherwise leak the fd / hit
        # EADDRINUSE (round-5 review; WorkQueueServer.close already does
        # both)
        self.httpd.server_close()
