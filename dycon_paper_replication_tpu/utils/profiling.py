"""Profiling / tracing hooks (the reference has none — SURVEY.md §5).

* `StepTimer` — rolling wall-clock step timing with percentiles; cheap
  enough to leave on (one `block_until_ready` per sampled step only).
* `trace(logdir)` — context manager around `jax.profiler` producing a
  TensorBoard-loadable device trace.
* `debug_nans(enable)` — opt-in global NaN debugging, the framework's
  analogue of the reference's per-step NaN guard for root-causing.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque

import jax
import numpy as np


class StepTimer:
    def __init__(self, window: int = 200, sync_every: int = 50):
        self.window = deque(maxlen=window)
        self.sync_every = sync_every
        self._count = 0
        self._last = None

    def start(self) -> float:
        """Mark (and return) a dispatch timestamp. The return value lets
        a pipelined loop carry its own start through a deferred fetch
        (`stop(start=t)`) instead of sharing the single `_last` slot —
        with two iterations in flight, interleaved start/stop pairs off
        one shared mark would mix near-zero and double-length samples."""
        self._last = time.perf_counter()
        return self._last

    def stop(self, result=None, start: float | None = None) -> float:
        """Record a step; pass a device array occasionally to sync."""
        self._count += 1
        if result is not None and self._count % self.sync_every == 0:
            jax.block_until_ready(result)
        dt = time.perf_counter() - (self._last if start is None else start)
        self.window.append(dt)
        return dt

    def stats(self) -> dict:
        if not self.window:
            return {}
        arr = np.asarray(self.window)
        return {
            "steps_per_sec": float(1.0 / arr.mean()),
            "step_ms_p50": float(np.percentile(arr, 50) * 1e3),
            "step_ms_p95": float(np.percentile(arr, 95) * 1e3),
        }


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def debug_nans(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)
