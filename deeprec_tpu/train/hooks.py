"""Training hooks: checkpoint cadence (full + incremental), logging, profiling.

The MonitoredTrainingSession hook surface (monitored_session.py:495-658)
rebuilt for the functional loop: hooks observe (state, metrics) after every
step and may return a replacement state (e.g. the incremental saver clears
the touched-recorder).

``CheckpointSaverHook(incremental_save_secs=...)`` reproduces
``tf.train.MonitoredTrainingSession(save_incremental_checkpoint_secs=...)``:
full checkpoints on one cadence, cheap touched-row delta dumps on a faster
one — the serving Processor consumes both for sub-minute online updates.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Optional

from deeprec_tpu.train import metrics as M
from deeprec_tpu.train import saver


class Hook:
    def after_step(self, state, metrics, step: int):
        return state

    def end(self, state):
        return state


class LoggingHook(Hook):
    """tf.train.LoggingTensorHook role: loss/AUC/throughput cadence."""

    def __init__(self, every_steps: int = 100, log_fn: Callable = print,
                 batch_size: Optional[int] = None):
        self.every = every_steps
        self.log_fn = log_fn
        self.batch_size = batch_size
        self._t0 = time.time()
        self._last_step = 0

    def after_step(self, state, metrics, step):
        if self.every and (step + 1) % self.every == 0:
            dt = time.time() - self._t0
            rate = ""
            if self.batch_size:
                ex = (step + 1 - self._last_step) * self.batch_size
                rate = f" ex/s={ex/dt:,.0f}"
                self._t0 = time.time()
                self._last_step = step + 1
            self.log_fn(
                f"step {step+1}: loss={float(metrics['loss']):.4f} "
                f"auc={M.auc_value(state.auc):.4f}{rate}")
        return state


class CheckpointSaverHook(Hook):
    """Full + incremental checkpoint cadence (CheckpointSaverHook with
    incremental_save_secs, incremental_saver.py:78)."""

    def __init__(self, ckpt_dir: str, save_secs: Optional[float] = None,
                 save_steps: Optional[int] = None,
                 incremental_save_secs: Optional[float] = None,
                 shrink_on_save: bool = False, tiers=None,
                 num_bundles: int = 1, async_save: bool = False,
                 model_name: Optional[str] = None, stager=None):
        self.ckpt_dir = ckpt_dir
        self.save_secs = save_secs
        self.save_steps = save_steps
        self.incr_secs = incremental_save_secs
        self.shrink = shrink_on_save
        # Same mapping as Trainer(tiers=...): makes full saves tier-complete
        # (cold rows dumped alongside the hot table).
        self.tiers = tiers
        # The TierStager feeding this trainer, when one is used: queued
        # promotion payloads hold rows that are in NEITHER the device
        # table nor the cold store at save time (prepare's move
        # semantics), so a tier-complete save must fold them into the
        # cold dump — without this, up to depth batches of trained rows
        # silently vanish from the checkpoint (round-5 review).
        self.stager = stager
        # SaveV3-style sharded bundle writes (parallel permute+write) and
        # background saves off the training thread.
        self.num_bundles = num_bundles
        self.model_name = model_name
        self.async_saver = saver.AsyncCheckpointer() if async_save else None
        now = time.time()
        self._last_full = now
        self._last_incr = now
        os.makedirs(ckpt_dir, exist_ok=True)

    def _save_incr(self, state, step):
        d = os.path.join(self.ckpt_dir, f"incr_{step}")
        os.makedirs(d, exist_ok=True)
        tables = dict(state.tables)
        meta = {"step": step, "tables": {}}
        for name, t in tables.items():
            if t.touched is None:
                continue
            fname = f"delta_{name}.npz"
            tables[name] = saver.save_table_delta(os.path.join(d, fname), t)
            meta["tables"][name] = fname
        with open(os.path.join(d, "meta.json"), "w") as f:
            json.dump(meta, f)
        # publish marker last (atomic-ish visibility for the serving poller)
        with open(os.path.join(d, "DONE"), "w") as f:
            f.write(str(step))
        return state.replace(tables=tables)

    def _cold_snapshot(self):
        """Tier-complete cold dump including in-flight stager payloads.

        Returns None when no stager is attached (save_checkpoint exports
        the cold stores itself).  Holding the tier lock makes the
        (queued-payload snapshot + cold export) pair atomic against the
        stager's prepare (which erases rows from the cold store into a
        payload) and against demotions."""

        if not self.tiers or self.stager is None:
            return None
        import numpy as np

        with self.stager._lock:
            cold = {name: tier.export_cold()
                    for name, tier in self.tiers.items()}
            for pl in self.stager.queued_payloads():
                for pname, payload in pl.items():
                    if pname not in cold:
                        continue
                    k0, r0, f0 = cold[pname]
                    cold[pname] = (
                        np.concatenate([np.asarray(k0, np.int64),
                                        np.asarray(payload["keys"],
                                                   np.int64)]),
                        np.concatenate([np.asarray(r0, np.float32),
                                        np.asarray(payload["rows"],
                                                   np.float32)])
                        if len(k0) else np.asarray(payload["rows"],
                                                   np.float32),
                        np.concatenate([np.asarray(f0, np.uint32),
                                        np.asarray(payload["freqs"],
                                                   np.uint32)]),
                    )
        return cold

    def after_step(self, state, metrics, step):
        now = time.time()
        full_due = (
            (self.save_steps and (step + 1) % self.save_steps == 0)
            or (self.save_secs and now - self._last_full >= self.save_secs))
        if full_due:
            cold_data = self._cold_snapshot()
            if self.async_saver is not None:
                self.async_saver.save(self.ckpt_dir, state, step=step + 1,
                                      shrink=self.shrink, tiers=self.tiers,
                                      num_bundles=self.num_bundles,
                                      model_name=self.model_name,
                                      _cold_data=cold_data)
            else:
                saver.save_checkpoint(self.ckpt_dir, state, step=step + 1,
                                      shrink=self.shrink, tiers=self.tiers,
                                      num_bundles=self.num_bundles,
                                      model_name=self.model_name,
                                      _cold_data=cold_data)
            self._last_full = now
            self._last_incr = now
            # The full checkpoint now contains every row: clear the
            # touched recorder so the next delta is relative to THIS save
            # (IndicesIncrRecorder resets on full saves) — otherwise
            # deltas re-dump the whole pre-save interval and grow toward
            # full-table size on hot tables (round-4 review).  The async
            # saver snapshotted the state before returning, so clearing
            # here never races the write.
            import jax.numpy as jnp

            tables = {
                n: (t.replace(touched=jnp.zeros_like(t.touched))
                    if t.touched is not None else t)
                for n, t in state.tables.items()}
            return state.replace(tables=tables)
        if self.incr_secs and now - self._last_incr >= self.incr_secs:
            state = self._save_incr(state, step + 1)
            self._last_incr = now
        return state

    def end(self, state):
        if self.async_saver is not None:
            self.async_saver.wait()
        saver.save_checkpoint(self.ckpt_dir, state, shrink=self.shrink,
                              tiers=self.tiers,
                              num_bundles=self.num_bundles,
                              model_name=self.model_name)
        if self.async_saver is not None:
            self.async_saver.close()
        return state


class ProfilerHook(Hook):
    """jax.profiler trace for steps [start, stop) (tf.train.ProfilerHook)."""

    def __init__(self, log_dir: str, start_step: int = 10, num_steps: int = 5):
        self.log_dir = log_dir
        self.start = start_step
        self.stop = start_step + num_steps
        self._active = False

    def after_step(self, state, metrics, step):
        import jax

        # >= comparisons, not ==: under fused dispatch
        # (steps_per_dispatch=k) hooks only see chunk-end step indices, so
        # an exact match can skip both the start and the stop — leaving
        # the trace running to the end of fit (round-5 review).
        if (not self._active and step + 1 >= self.start
                and step + 1 < self.stop):
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        elif self._active and step + 1 >= self.stop:
            jax.block_until_ready(state.step)
            jax.profiler.stop_trace()
            self._active = False
        return state

    def end(self, state):
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False
        return state


class SummaryHook(Hook):
    """Scalar-summary writer (the TensorBoard/add_summary observability role,
    work_queue.py add_summary / _add_layer_summary): appends JSONL records
    {step, wall_time, loss, auc, **extra_fns} consumable by any dashboard."""

    def __init__(self, log_dir: str, every_steps: int = 100, extra_fns=None):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "scalars.jsonl")
        self.every = every_steps
        self.extra_fns = extra_fns or {}

    def after_step(self, state, metrics, step):
        if (step + 1) % self.every:
            return state
        rec = {
            "step": step + 1,
            "wall_time": time.time(),
            "loss": float(metrics["loss"]),
            "auc": M.auc_value(state.auc),
        }
        for name, fn in self.extra_fns.items():
            rec[name] = fn(state)
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        return state


class TableStatsHook(Hook):
    """Periodic embedding-table stats (sizes, load factors, growth hints) —
    the serving get_serving_model_info / EV introspection role for training."""

    def __init__(self, log_dir: str, every_steps: int = 500):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "tables.jsonl")
        self.every = every_steps

    def after_step(self, state, metrics, step):
        if (step + 1) % self.every:
            return state
        rec = {"step": step + 1, "tables": {}}
        for n, t in state.tables.items():
            cap = t.keys.shape[-1]
            import numpy as np

            size = int(np.sum(np.asarray(t.size)))
            rec["tables"][n] = {
                "size": size,
                "capacity": int(np.prod(t.keys.shape)),
                "load": round(size / max(int(np.prod(t.keys.shape)), 1), 4),
                "growth_hint": int(np.sum(np.asarray(t.growth_hint))),
            }
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        return state
