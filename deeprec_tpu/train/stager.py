"""Tier staging thread: promotion work for batch t+1 overlaps step t.

The reference runs tier maintenance off-thread — a shared eviction thread
pool (eviction_manager.h:39, ``TF_MULTI_TIER_EV_EVICTION_THREADS``) and
prefetch-driven promotion (embedding_var.h:259 ``AddToCachePrefetchList``).
The TPU-native equivalent: while the device executes step t (dispatch is
async), a host thread computes upcoming batches' promotion payloads —
``host_group_keys`` + per-tier cold-store lookup — so the step-time cost of
tiering is one bulk device upsert instead of a host hash-table walk.

Correctness under demotion (the one other cold-store mutation, from
``maybe_grow`` on the main thread) hinges on two invariants:

  1. ``prepare`` uses move semantics (rows are erased from the cold store
     into the payload), so a prepared payload is never discarded — it is
     always applied to its batch's step.
  2. Demotion is ATOMIC with a re-sync of every queued payload: holding the
     trainer's tier lock, the demote flushes rows down and then immediately
     tops up each queued batch (in batch order) with a fresh ``prepare``,
     which finds exactly the newly-demoted rows.  The staging thread takes
     the same lock around prepare+enqueue, so it can neither observe a
     half-finished demotion nor steal a newly-cold row out from under an
     earlier queued batch (which would cause that step to silently
     re-initialize a trained row).
"""

from __future__ import annotations

import collections
import threading
from typing import Iterator, Optional


class TierStager:
    """Wraps a batch iterator, yielding (batch, [payload_dict, ...]).

    ``trainer`` must expose ``prepare_payloads(batch)`` and a
    ``_tier_lock`` (both Trainer and DistributedTrainer do).  ``depth``
    bounds prepared-but-unconsumed batches (host memory for in-flight
    promoted rows).  Pass the stager to ``maybe_grow(state, stager=...)``
    so demotions re-sync queued payloads.
    """

    def __init__(self, trainer, data_iter, *, max_steps: Optional[int] = None,
                 depth: int = 2):
        self.trainer = trainer
        self._lock = trainer._tier_lock
        self._cv = threading.Condition()
        self._items: collections.deque = collections.deque()
        self._depth = depth
        self._done = False
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(
            target=self._run, args=(iter(data_iter), max_steps), daemon=True)
        self._thread.start()

    def _run(self, it: Iterator, max_steps: Optional[int]):
        n = 0
        try:
            while True:
                # bound BEFORE pulling — a for/break would consume (and
                # discard) one extra batch from a shared iterator
                if max_steps is not None and n >= max_steps:
                    break
                try:
                    batch = next(it)
                except StopIteration:
                    break
                with self._cv:
                    while len(self._items) >= self._depth:
                        self._cv.wait()
                # prepare AND enqueue under the tier lock: a demotion can
                # never interleave between the two (its re-sync must see
                # every prepared payload).
                with self._lock:
                    payloads = self.trainer.prepare_payloads(batch)
                    with self._cv:
                        self._items.append(
                            [batch, [payloads] if payloads else []])
                        self._cv.notify_all()
                n += 1
        except BaseException as e:
            # Surface producer failures to the consumer: swallowing them
            # would end the stream early and let fit() return "success"
            # after a fraction of the requested steps (round-5 review) —
            # the non-staged path propagates the same error out of fit.
            self._err = e
        finally:
            with self._cv:
                self._done = True
                self._cv.notify_all()

    def resync_locked(self) -> None:
        """Top up every queued payload after a demotion.  The CALLER must
        hold the trainer's tier lock (maybe_grow does)."""

        with self._cv:
            for item in self._items:
                topup = self.trainer.prepare_payloads(item[0])
                if topup:
                    item[1].append(topup)

    def queued_payloads(self):
        """Snapshot of every queued (not-yet-applied) promotion payload:
        rows that are currently in NEITHER the device table NOR the cold
        store (prepare uses move semantics).  A tier-complete checkpoint
        must include them — hold the trainer's tier lock around this call
        plus the cold export so no prepare/demote interleaves
        (CheckpointSaverHook(stager=...) does; round-5 review)."""

        with self._cv:
            return [pl for _, plist in self._items for pl in plist]

    def __iter__(self):
        while True:
            with self._cv:
                while not self._items and not self._done:
                    self._cv.wait()
                if not self._items:
                    if self._err is not None:
                        raise self._err
                    return
                batch, plist = self._items.popleft()
                self._cv.notify_all()
            yield batch, plist
