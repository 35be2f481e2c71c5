"""Model stores: where serving artifacts come from.

The reference's Processor pulls models from remote storage (OSS/HDFS,
serving/processor/storage/model_store.cc) into a local cache and serves from
there, polling for new versions.  The TPU-native equivalent keeps the same
two-piece shape:

  * ``LocalModelStore`` — serve straight from a checkpoint directory (the
    degenerate store; what Processor.initialize(path) always did).
  * ``MirroredModelStore`` — the pull mechanism: watch a *source* location,
    copy each newly-published version (step_N dir + its marker) atomically
    into a local cache dir, then advance the cache's ``checkpoint`` marker.
    The source can be any mounted/fuse path (object stores mount this way);
    wire a different ``copy_fn`` for a custom transport.  Zero-egress images
    exercise it dir-to-dir; the mechanism is transport-agnostic.

Both expose ``local_dir`` for the Processor and ``sync()`` to pull updates
(MirroredModelStore also runs sync on a background cadence via ``start``).
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import time
from typing import Callable, Optional


class LocalModelStore:
    def __init__(self, path: str):
        self.local_dir = path

    def sync(self) -> bool:
        return False  # nothing to pull

    def start(self):
        return self

    def stop(self):
        pass


class MirroredModelStore:
    """Poll ``source`` and mirror new versions into ``cache_dir``."""

    def __init__(self, source: str, cache_dir: str,
                 poll_secs: float = 5.0,
                 copy_fn: Optional[Callable[[str, str], None]] = None):
        self.source = source
        self.local_dir = cache_dir
        self.poll_secs = poll_secs
        self.copy_fn = copy_fn or self._copy_tree
        os.makedirs(cache_dir, exist_ok=True)
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    @staticmethod
    def _copy_tree(src: str, dst: str):
        tmp = dst + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.copytree(src, tmp)
        os.replace(tmp, dst)  # atomic publish

    def _latest_source_version(self) -> Optional[str]:
        marker = os.path.join(self.source, "checkpoint")
        if not os.path.exists(marker):
            return None
        with open(marker) as f:
            return json.load(f)["latest"]

    def sync(self) -> bool:
        """Pull the newest full version + any new incr_ deltas; returns
        True if anything changed."""

        latest = self._latest_source_version()
        if latest is None:
            return False
        changed = False
        src_full = os.path.join(self.source, latest)
        dst_full = os.path.join(self.local_dir, latest)
        if os.path.isdir(src_full) and not os.path.isdir(dst_full):
            self.copy_fn(src_full, dst_full)
            changed = True
        # deltas: copy completed incr dirs (DONE marker present) not yet local
        for d in sorted(os.listdir(self.source)):
            if not d.startswith("incr_"):
                continue
            src_d = os.path.join(self.source, d)
            if not os.path.exists(os.path.join(src_d, "DONE")):
                continue
            dst_d = os.path.join(self.local_dir, d)
            if not os.path.isdir(dst_d):
                self.copy_fn(src_d, dst_d)
                changed = True
        if changed or not os.path.exists(
                os.path.join(self.local_dir, "checkpoint")):
            # marker last: the Processor's poller sees a complete version
            with open(os.path.join(self.local_dir, "checkpoint"), "w") as f:
                json.dump({"latest": latest}, f)
        return changed

    def start(self) -> "MirroredModelStore":
        self.sync()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def _loop(self):
        while not self._stop.wait(self.poll_secs):
            try:
                self.sync()
            except Exception:
                pass  # next tick retries

    def stop(self):
        self._stop.set()
