"""Tracing / profiling helpers (SURVEY.md §5.1 — the reference has none).

* StepTimer: wall-clock per-step timing with percentile summary; the
  trainers feed it every device step and publish its summary to their
  JSONL metric streams.
* TraceWindow: captures a jax.profiler device trace of a few warm train
  steps (trainer `profile_dir` config / CLI `--profile-dir`).
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


class TraceWindow:
    """Device-trace a window of warm train steps.

    Call `tick()` at the top of every train iteration and `close()` after
    the loop. The first `skip` steps (compile + first-loop warm-up — the
    first timed loop in a process reads ~50% high on this stack) are left
    out of the trace; the next `steps` are captured to `log_dir`. A failing
    profiler (e.g. an unsupported remote backend) logs one warning and
    disables itself rather than killing training."""

    def __init__(self, log_dir: str, steps: int = 3, skip: int = 1, logger=None):
        self.log_dir, self.steps, self.skip = log_dir, steps, skip
        self.logger = logger
        self._seen = 0
        self._active = False
        self._done = not log_dir

    def tick(self) -> None:
        if self._done:
            return
        import jax

        self._seen += 1
        if not self._active and self._seen == self.skip + 1:
            try:
                jax.profiler.start_trace(self.log_dir)
                self._active = True
            except Exception as e:
                if self.logger:
                    self.logger.warning(f"profiler trace unavailable: {e}")
                self._done = True
        elif self._active and self._seen == self.skip + self.steps + 1:
            self.close()

    def close(self) -> None:
        if self._active:
            import jax

            try:
                jax.profiler.stop_trace()
                if self.logger:
                    self.logger.info(f"device trace written to {self.log_dir}")
            except Exception as e:
                if self.logger:
                    self.logger.warning(f"profiler stop failed: {e}")
            self._active = False
        self._done = True


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
