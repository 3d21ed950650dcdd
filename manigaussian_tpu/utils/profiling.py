"""Profiling / tracing helpers.

Parity target (SURVEY.md §5): the reference scatters
torch.autograd.profiler.record_function scopes (resnetfc.py:54,144) and wall-
clock step timing with psutil CPU% (offline_train_runner.py:190-219). The
TPU-native equivalents: jax.profiler traces (Perfetto/TensorBoard), named
annotations, and a lightweight step timer.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace_annotation(name: str):
    """Named scope visible in jax.profiler traces (record_function analog)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def capture_trace(logdir: str):
    """Capture a device trace into logdir (view with TensorBoard/Perfetto)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling wall-clock step timing (offline_train_runner.py:190-219 analog)."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times = []
        self._last: Optional[float] = None

    def tick(self) -> Dict[str, float]:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now
        if not self._times:
            return {}
        mean = sum(self._times) / len(self._times)
        return {"step_time_s": mean, "steps_per_s": 1.0 / max(mean, 1e-9)}


def benchmark_fn(fn, *args, iters: int = 20, warmup: int = 2) -> float:
    """Median-free simple timing: mean seconds/call after warmup."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
