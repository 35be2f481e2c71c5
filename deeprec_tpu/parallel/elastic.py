"""Elastic scaling: change the shard count of a running job.

The reference's elastic-training service (ElasticGrpcServer::Update,
elastic_grpc_server_lib.h:34-54, elastic_training.proto:26-60) lets an
external controller grow/shrink the PS set; EVs re-shard cheaply thanks to
the 1000-partition checkpoint layout.  The TPU-native equivalent: the mesh
is the resource; re-scaling = checkpoint → rebuild the trainer on the new
mesh → restore (reshard-on-restore does the re-partitioning).  This module
wraps that into the reference's IsReadyScaling/ReadyToUpdate/UpdateServerDef
protocol shape so an external controller can drive it.
"""

from __future__ import annotations

import dataclasses
import os
import tempfile
from typing import Callable, Optional

import jax
import numpy as np
from jax.sharding import Mesh

from deeprec_tpu.train import saver


@dataclasses.dataclass
class ElasticController:
    """Host-side re-scaling coordinator for a DistributedTrainer job.

    ``via_disk=False`` (default) re-partitions device-to-device through host
    RAM (saver.reshard_state) — seconds, not minutes, for big tables.
    ``via_disk=True`` additionally cuts a full checkpoint and restores from
    it, making the rescale double as a recovery point.
    """

    make_trainer: Callable[[Mesh], object]   # mesh -> DistributedTrainer
    ckpt_dir: Optional[str] = None
    via_disk: bool = False

    def __post_init__(self):
        import threading

        self.ckpt_dir = self.ckpt_dir or tempfile.mkdtemp(prefix="elastic_")
        self._pending: Optional[int] = None
        # Guards _pending: ready_to_update runs on HTTP handler threads
        # while update() pops on the training thread — without the lock a
        # rescale staged between the read and the clear would be lost.
        self._plock = threading.Lock()

    # -- the reference's 3-phase protocol ----------------------------------

    def is_ready_scaling(self, trainer, state) -> bool:
        """SCALING_READY when a consistent checkpoint can be cut."""

        return state is not None

    def ready_to_update(self, num_devices: int) -> None:
        """Stage a new cluster size (UpdateServerDefRequest)."""

        if not 1 <= num_devices <= len(jax.devices()):
            raise ValueError(
                f"requested {num_devices} devices, have {len(jax.devices())}"
                " (need 1 <= n <= available)")
        with self._plock:
            self._pending = num_devices

    def update(self, trainer, state):
        """Apply the staged re-scale: ckpt → new mesh → restore.

        Returns (new_trainer, new_state).  The sharded tables re-partition
        via the saved sub-partitions (p % S == s), exactly the reference's
        re-shard path (embedding_var_restore.cc:337-339).
        """

        with self._plock:
            n, self._pending = self._pending, None
        if n is None:
            return trainer, state
        new_mesh = Mesh(np.asarray(jax.devices()[:n]), ("data",))
        new_trainer = self.make_trainer(new_mesh)
        template = new_trainer.init_state(jax.random.PRNGKey(0))
        if self.via_disk:
            path = saver.save_checkpoint(self.ckpt_dir, state)
            new_state = saver.restore_checkpoint(path, template)
        else:
            new_state = saver.reshard_state(state, template)
        if hasattr(new_trainer, "state_sharding"):
            new_state = jax.device_put(
                new_state, new_trainer.state_sharding(new_state))
        return new_trainer, new_state


class ElasticService:
    """JSON-over-HTTP control endpoint for an ElasticController — the
    externally-drivable surface of the reference's elastic-training service
    (ElasticGrpcServer + elastic_service.cc; protocol messages
    elastic_training.proto:26-60, driven by an external controller such as
    AIMaster).  Endpoints mirror the 3-phase protocol:

      GET  /elastic/v1/status           → {num_shards, step, pending, ready}
      POST /elastic/v1/is_ready_scaling → {"code": "OK"|"NOT_READY"}
      POST /elastic/v1/ready_to_update  {"num_devices": N} → stages a rescale
                                         (UpdateServerDefRequest role)

    The training host loop calls ``maybe_update(trainer, state)`` between
    steps; when a rescale is staged it applies ``controller.update`` (the
    UpdateServerDef moment) and returns the rebuilt (trainer, state).
    """

    def __init__(self, controller: ElasticController, port: int = 0):
        import json
        import threading
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        self.controller = controller
        self._info = {"num_shards": None, "step": None}
        self._ready = False
        self._lock = threading.Lock()
        svc = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _reply(self, code, obj):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/elastic/v1/status":
                    with svc.controller._plock:
                        pending = svc.controller._pending
                    with svc._lock:
                        info = dict(svc._info)
                    self._reply(200, {**info, "pending": pending,
                                      "ready": svc._ready})
                else:
                    self._reply(404, {"error": "not found"})

            def do_POST(self):
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    payload = json.loads(self.rfile.read(n) or b"{}")
                    if not isinstance(payload, dict):
                        raise ValueError("body must be a JSON object")
                except (ValueError, TypeError) as e:  # incl. JSONDecodeError
                    self._reply(400, {"code": "ERROR", "error": str(e)})
                    return
                if self.path == "/elastic/v1/is_ready_scaling":
                    self._reply(200, {"code": "OK" if svc._ready
                                      else "NOT_READY"})
                elif self.path == "/elastic/v1/ready_to_update":
                    try:
                        svc.controller.ready_to_update(
                            int(payload["num_devices"]))
                        self._reply(200, {"code": "OK"})
                    except (KeyError, ValueError, TypeError) as e:
                        self._reply(400, {"code": "ERROR", "error": str(e)})
                else:
                    self._reply(404, {"error": "not found"})

        self._server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(target=self._server.serve_forever,
                                        daemon=True)
        self._thread.start()

    def report(self, trainer, state) -> None:
        """Host-loop heartbeat: publish current cluster shape for /status
        and mark the job checkpoint-consistent (SCALING_READY)."""

        with self._lock:
            self._info = {
                "num_shards": getattr(trainer, "num_shards", 1),
                "step": int(jax.device_get(state.step)) if state is not None
                        else None,
            }
            self._ready = self.controller.is_ready_scaling(trainer, state)

    def maybe_update(self, trainer, state):
        """Apply a staged rescale if one is pending (call between steps)."""

        with self.controller._plock:
            pending = self.controller._pending is not None
        if not pending:
            return trainer, state
        trainer, state = self.controller.update(trainer, state)
        self.report(trainer, state)
        return trainer, state

    def close(self):
        self._server.shutdown()
        self._server.server_close()
