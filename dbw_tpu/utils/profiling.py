"""Tracing / profiling helpers (SURVEY.md §5.1).

The reference has only a wall-clock context manager and a per-image time
metric (src/utils/__init__.py:89-100, trainer.py:138-147). On TPU the
equivalent first-class tools are jax.profiler device traces (viewable in
TensorBoard / Perfetto) and xprof-style per-op breakdowns; this module
wraps them so the trainer and bench can opt in with one flag."""

from __future__ import annotations

import contextlib
import time
from pathlib import Path

import jax


@contextlib.contextmanager
def device_trace(log_dir, enabled=True):
    """Capture a jax.profiler trace into `log_dir` (Perfetto/TensorBoard)."""
    if not enabled:
        yield
        return
    log_dir = str(log_dir)
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name):
    """Named region that shows up inside device traces."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Rolling step timer with EMA; feeds the reference's `time/img` metric
    column (trainer.py:147) and a steps/s readout."""

    def __init__(self, alpha=0.1):
        self.alpha = alpha
        self.ema = None
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, n_items=1):
        dt = time.perf_counter() - self._t0
        per = dt / max(n_items, 1)
        self.ema = per if self.ema is None else (
            self.alpha * per + (1 - self.alpha) * self.ema
        )
        return per

    @property
    def steps_per_sec(self):
        return 1.0 / self.ema if self.ema else 0.0
