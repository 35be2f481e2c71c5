"""Pipelined input staging — the Stage / SmartStage capability.

The reference hides input latency by staging the IO-bound frontier of the
graph into async-executed buffers (``tf.staged`` python/ops/prefetch.py:92,
SmartStagePass core/graph/smart_stage_pass.cc:30).  Under JAX the equivalent
split is host-side: a background thread pool runs the (numpy) data pipeline
and eagerly ``device_put``s batches while the accelerator trains — by the
time ``next()`` is called the batch is already in HBM and the dispatch of the
next jitted step overlaps the current one.

``Prefetcher`` = Stage (explicit, wraps any iterator).
``smart_stage`` = SmartStage (automatic: wraps the iterator AND pins batches
to device, capacity-controlled).
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Dict, Iterator, Optional

import jax


class Prefetcher:
    """Background-thread prefetch with bounded depth; optionally transfers
    each batch to device ahead of use."""

    def __init__(self, it, depth: int = 2, to_device: bool = True,
                 sharding=None):
        self._src = iter(it)
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._to_device = to_device
        self._sharding = sharding
        self._done = object()
        self._err: Optional[BaseException] = None
        self._finished = False
        self._stop = False
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        try:
            for item in self._src:
                if self._stop:
                    return
                if self._to_device:
                    if self._sharding is not None:
                        shardings = jax.tree.map(lambda _: self._sharding, item)
                        item = jax.device_put(item, shardings)
                    else:
                        item = jax.device_put(item)
                self._q.put(item)
        except BaseException as e:  # surfaced on next()
            self._err = e
        finally:
            self._q.put(self._done)

    def __iter__(self):
        return self

    def __next__(self):
        # once exhausted/errored, stay that way: the sentinel arrives only
        # once, and a blocking q.get() after it would deadlock the caller
        # (iterator protocol requires repeated StopIteration — round-4
        # review)
        if self._finished:
            if self._err is not None:
                raise self._err
            raise StopIteration
        item = self._q.get()
        if item is self._done:
            self._finished = True
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    def close(self, timeout: float = 5.0):
        """Stop the producer and release staged batches: drains the queue
        so the (possibly blocked) producer thread sees the stop flag and
        exits, freeing its device-resident buffers and the upstream
        iterator (round-4 review: abandoning a Prefetcher pinned
        depth+1 batches in HBM for the process lifetime).

        Bounded wait (round-5 review): a producer blocked INSIDE the
        upstream iterator (an idle TailStream / Kafka poll) never reaches
        the stop check — close() must not hang the caller on it.  After
        ``timeout`` the drained queue is abandoned to the daemon thread,
        which exits on the source's next yield (at most one transient
        batch re-staged, then the stop flag is honored)."""

        self._stop = True
        deadline = time.monotonic() + timeout
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                if not self._thread.is_alive():
                    break
                if time.monotonic() > deadline:
                    break  # producer stuck in the upstream source
                time.sleep(0.01)
                continue
            if item is self._done:
                break
        self._finished = True


def smart_stage(it, depth: int = 2, sharding=None) -> Prefetcher:
    """Stage an input iterator: background parse + async host→device copy."""

    return Prefetcher(it, depth=depth, to_device=True, sharding=sharding)
