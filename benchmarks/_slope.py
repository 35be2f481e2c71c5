"""Shared guarded window-slope timing for every benchmark script.

The honest method (PERF.md round-2 correction): force a VALUE readback at
each window boundary and take the slope between two window sizes, which
cancels the readback round-trip.  The guard rails live HERE once instead
of drifting across per-script copies (round-5 review: six clones had
divergent clamps — a tunnel stall on a window boundary could invert a
slope into a negative latency, an absurd ~1e12 ex/s row, or a
ZeroDivisionError that discarded an hour-long run):

  * ``probe_w1`` sizes the measurement window from a quick probe so the
    window difference dwarfs the ~30 ms tunnel round-trip, with a FLOOR
    and a CAP (a stall-corrupted probe must not blow the window up into
    a multi-hour run);
  * ``slope_per_step`` returns None for a non-positive slope (stall
    landed on a boundary) — callers SKIP the rep instead of clamping it
    into a garbage best-of.
"""

from __future__ import annotations

from typing import Callable, Optional


def probe_w1(window: Callable[[int], float], probe_steps: int = 8,
             target_secs: float = 0.8, floor: int = 8,
             cap: int = 2000) -> int:
    """Window size whose duration ~= target_secs, from a probe run."""

    est = window(probe_steps) / probe_steps
    if est <= 0:            # stall-inverted probe: sane fallback, not 1e-5
        est = 1e-3
    return min(cap, max(floor, int(target_secs / est)))


def slope_per_step(window: Callable[[int], float], w1: int,
                   w2: int) -> Optional[float]:
    """Seconds/step from the (w1, w2) slope; None if the rep is invalid
    (a readback stall made the slope non-positive)."""

    t1 = window(w1)
    t2 = window(w2)
    per_step = (t2 - t1) / (w2 - w1)
    return per_step if per_step > 0 else None


def best_throughput(window: Callable[[int], float], w1: int, w2: int,
                    batch: int, reps: int = 3) -> float:
    """Best examples/s over ``reps`` valid slope measurements (invalid
    reps are retried once each)."""

    best = 0.0
    attempts = 0
    done = 0
    while done < reps and attempts < 2 * reps:
        attempts += 1
        p = slope_per_step(window, w1, w2)
        if p is None:
            continue
        done += 1
        best = max(best, batch / p)
    return best
