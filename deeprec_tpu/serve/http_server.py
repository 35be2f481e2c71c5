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
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from deeprec_tpu.serve.processor import Processor


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

        def do_GET(self):
            if self.path == "/v1/model" and processor is not None:
                self._send(200, processor.get_serving_model_info())
            elif self.path == "/v1/models" and manager is not None:
                self._send(200, manager.info())
            else:
                self._send(404, {"error": "unknown path"})

        def _resolve(self):
            if self.path == "/v1/predict" and processor is not None:
                return processor
            if (manager is not None and self.path.startswith("/v1/models/")
                    and self.path.endswith(":predict")):
                name = self.path[len("/v1/models/"):-len(":predict")]
                return manager.get(name)
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
                request = {
                    "dense": np.asarray(req["dense"], np.float32),
                    "cat": {k: np.asarray(v, np.int32)
                            for k, v in req["cat"].items()},
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
