"""Profiling helpers: jax.profiler traces + step timing.

The reference's only profiling is an nvprof hook around the CUDA kernel
(transoar/models/ops/test.py:50-66,125-127). Here profiling is first-class:
``trace()`` captures an XPlane/perfetto trace of a region (view with
TensorBoard or ui.perfetto.dev), ``StepTimer`` aggregates wall-clock step
statistics for throughput reporting.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path


@contextlib.contextmanager
def trace(logdir="./logs/profile"):
    import jax

    Path(logdir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates step wall times; report() returns throughput stats."""

    def __init__(self, items_per_step=1):
        self.items_per_step = items_per_step
        self.times = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        if self._t0 is not None:
            self.times.append(time.perf_counter() - self._t0)
            self._t0 = None

    def report(self, skip_warmup=1):
        times = self.times[skip_warmup:] or self.times
        if not times:
            return {}
        mean = sum(times) / len(times)
        return {
            "steps": len(times),
            "mean_step_s": mean,
            "min_step_s": min(times),
            "items_per_s": self.items_per_step / mean,
        }
