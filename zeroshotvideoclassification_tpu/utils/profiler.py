"""Profiling hooks: jax.profiler traces + step-time statistics.

Replaces the reference's wall-clock-only accounting (/root/reference/
main.py:148-150,216-218) with real device traces (viewable in TensorBoard /
Perfetto) plus simple steady-state step statistics for the clips/sec
north-star metric.
"""

from __future__ import annotations

import contextlib
import time
from typing import List, Optional


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace context; no-op if the profiler is unavailable."""
    import jax

    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


class StepStats:
    """Steady-state step timing: mean/p50/p90 after a warmup prefix."""

    def __init__(self, warmup: int = 3):
        self.warmup = warmup
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._t0 is not None:
            self.times.append(now - self._t0)
        self._t0 = now

    def summary(self, items_per_step: float = 1.0) -> dict:
        ts = self.times[self.warmup:] or self.times
        if not ts:
            return {}
        import numpy as np

        arr = np.asarray(ts)
        return {
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p90_s": float(np.percentile(arr, 90)),
            "items_per_sec": items_per_step / float(arr.mean()),
            "n": len(arr),
        }
