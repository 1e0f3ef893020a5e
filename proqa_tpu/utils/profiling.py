"""Tracing / profiling helpers (SURVEY.md §5.1 — the reference has none).

* StepTimer: wall-clock per-step timing with percentile summary, used by the
  trainers' metric streams.
* trace(): context manager around jax.profiler for on-demand device traces
  (view with tensorboard/xprof offline).
"""
from __future__ import annotations

import contextlib
import time

import numpy as np


class StepTimer:
    def __init__(self, window: int = 200):
        self.window = window
        self._times: list[float] = []
        self._t0: float | None = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self._times.append(time.perf_counter() - self._t0)
        if len(self._times) > self.window:
            self._times = self._times[-self.window :]

    def summary(self) -> dict:
        if not self._times:
            return {}
        arr = np.asarray(self._times)
        return {
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
            "steps_per_s": float(1.0 / arr.mean()),
        }


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace for the enclosed region."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region in device traces."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
