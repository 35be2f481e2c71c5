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
