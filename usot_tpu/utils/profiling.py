"""Profiling / tracing helpers (SURVEY §5.1: the reference has only coarse
wall-clock FPS counters; we keep those as the north-star metric and add
jax.profiler trace capture)."""
from __future__ import annotations

import contextlib
import os
import time


@contextlib.contextmanager
def trace(log_dir: str | None):
    """Capture a jax.profiler trace into log_dir when set (view with
    TensorBoard or Perfetto); no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class FPSMeter:
    """Per-video FPS counter matching the reference's printout
    (ref: scripts/test_usot.py:130-131)."""

    def __init__(self):
        self.total = 0.0
        self.frames = 0
        self._t0 = None

    def tic(self):
        self._t0 = time.perf_counter()

    def toc(self, n_frames: int = 1):
        self.total += time.perf_counter() - self._t0
        self.frames += n_frames

    @property
    def fps(self) -> float:
        return self.frames / max(self.total, 1e-9)
