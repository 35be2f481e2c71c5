"""WorkQueue — elastic global work-item dispatch with checkpointable state.

Re-design of the reference's WorkQueue (core/kernels/work_queue_ops.cc:70,
python/ops/work_queue.py:113): a dynamic queue of file/work items consumed by
workers at their own pace (straggler absorption), whose position is saved
with checkpoints so a resumed job does not re-read finished files.

The reference places the queue resource on one PS task; here the queue is a
host-side coordinator owned by process 0 (multi-controller JAX); in-process
it is thread-safe for multiple data workers.
"""

from __future__ import annotations

import json
import socket
import socketserver
import threading
from typing import Iterator, List, Optional, Sequence


class WorkQueue:
    def __init__(self, items: Sequence[str], num_epochs: int = 1,
                 shuffle: bool = False, seed: int = 0):
        self._all = list(items)
        self._num_epochs = num_epochs
        self._shuffle = shuffle
        self._seed = seed
        self._lock = threading.Lock()
        self._epoch = 0
        self._cursor = 0
        self._order = self._epoch_order(0)

    def _epoch_order(self, epoch: int) -> List[str]:
        order = list(self._all)
        if self._shuffle:
            import random

            random.Random(self._seed + epoch).shuffle(order)
        return order

    def take(self) -> Optional[str]:
        """Next work item, or None when exhausted (Take op)."""

        with self._lock:
            while True:
                if self._cursor < len(self._order):
                    item = self._order[self._cursor]
                    self._cursor += 1
                    return item
                if (self._num_epochs > 0
                        and self._epoch + 1 >= self._num_epochs):
                    return None
                self._epoch += 1
                self._order = self._epoch_order(self._epoch)
                self._cursor = 0

    def __iter__(self) -> Iterator[str]:
        while True:
            item = self.take()
            if item is None:
                return
            yield item

    def size(self) -> int:
        with self._lock:
            return len(self._order) - self._cursor

    # -- checkpoint integration (WorkQueue Save/Restore ops) ---------------

    def state(self) -> str:
        with self._lock:
            return json.dumps({"epoch": self._epoch, "cursor": self._cursor})

    def restore(self, state: str) -> None:
        s = json.loads(state)
        with self._lock:
            self._epoch = s["epoch"]
            self._cursor = s["cursor"]
            self._order = self._epoch_order(self._epoch)

    def input_dataset(self, reader_fn, **reader_kw):
        """Chain: queue items -> reader batches (input_producer role)."""

        def gen():
            for item in self:
                yield from reader_fn([item], **reader_kw)

        return gen()


# ---------------------------------------------------------------------------
# cross-process queue (the reference's cluster-wide WorkQueue resource: one
# PS task owns the queue, every worker's Take round-trips to it —
# work_queue_ops.cc:70, python/ops/work_queue.py:113).  Process 0 runs
# WorkQueueServer; every process (including 0) consumes via RemoteWorkQueue.
# Wire protocol: one JSON object per line, {"op": take|size|state|restore}.


class WorkQueueServer:
    """Serves a WorkQueue over TCP to all worker processes."""

    def __init__(self, queue: WorkQueue, host: str = "127.0.0.1",
                 port: int = 0):
        self.queue = queue

        class Handler(socketserver.StreamRequestHandler):
            def handle(h):
                for line in h.rfile:
                    try:
                        req = json.loads(line)
                    except json.JSONDecodeError:
                        break
                    op = req.get("op")
                    if op == "take":
                        resp = {"item": self.queue.take()}
                    elif op == "size":
                        resp = {"size": self.queue.size()}
                    elif op == "state":
                        resp = {"state": self.queue.state()}
                    elif op == "restore":
                        self.queue.restore(req["state"])
                        resp = {"ok": True}
                    else:
                        resp = {"error": f"unknown op {op!r}"}
                    h.wfile.write((json.dumps(resp) + "\n").encode())
                    h.wfile.flush()

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._srv = Server((host, port), Handler)
        self.address = self._srv.server_address  # (host, actual port)
        self._thread = threading.Thread(
            target=self._srv.serve_forever, daemon=True)
        self._thread.start()

    def close(self):
        self._srv.shutdown()
        self._srv.server_close()


class RemoteWorkQueue:
    """Client with the WorkQueue interface, backed by a WorkQueueServer.

    One persistent connection per consumer; calls are request/response over
    the line protocol, so concurrent consumers in one process should each
    hold their own RemoteWorkQueue (the server side is thread-safe)."""

    def __init__(self, address, timeout: float = 30.0):
        self._sock = socket.create_connection(tuple(address), timeout=timeout)
        self._rfile = self._sock.makefile("r")
        self._lock = threading.Lock()

    def _call(self, req: dict) -> dict:
        with self._lock:
            try:
                self._sock.sendall((json.dumps(req) + "\n").encode())
                line = self._rfile.readline()
            except (OSError, socket.timeout):
                # A timeout abandons an in-flight response; reusing the
                # connection would hand that STALE line to the next call,
                # leaving every later reply off by one (a retried take()
                # could even return the wrong item and double-dispatch a
                # work file — round-5 review).  Poison the socket so
                # further use fails loudly; callers reconnect.
                try:
                    self._sock.close()
                finally:
                    raise
        if not line:
            raise ConnectionError("work-queue server closed the connection")
        return json.loads(line)

    def take(self) -> Optional[str]:
        return self._call({"op": "take"})["item"]

    def size(self) -> int:
        return self._call({"op": "size"})["size"]

    def state(self) -> str:
        return self._call({"op": "state"})["state"]

    def restore(self, state: str) -> None:
        self._call({"op": "restore", "state": state})

    def __iter__(self) -> Iterator[str]:
        while True:
            item = self.take()
            if item is None:
                return
            yield item

    def input_dataset(self, reader_fn, **reader_kw):
        def gen():
            for item in self:
                yield from reader_fn([item], **reader_kw)

        return gen()

    def close(self):
        self._rfile.close()
        self._sock.close()
