"""Tracing / profiling / throughput observability.

The reference's only timing instrumentation is wall-clock prints
bracketing each entry script (e.g. train_shape_reconstruction.py:76-79).
The TPU framework makes performance first-class (SURVEY.md §5):

  * :class:`StepTimer` — per-step wall timing + the north-star
    volumes/sec/chip counter, with warmup-aware averaging.  Timings are
    anchored on host materialization because the axon TPU tunnel defers
    execution past ``block_until_ready``.
  * :func:`trace` — context manager around ``jax.profiler`` device traces
    (view with TensorBoard or xprof).
  * :func:`annotate` — named TraceAnnotation for custom regions.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


class StepTimer:
    """Accumulates step wall times and computes volumes/sec/chip."""

    def __init__(self, warmup_steps: int = 2, n_chips: int = 1):
        self._warmup = warmup_steps
        self._n_chips = max(n_chips, 1)
        self.reset()

    def reset(self):
        self._steps = 0
        self._volumes = 0
        self._elapsed = 0.0
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, n_volumes: int):
        dt = time.perf_counter() - self._t0
        self._steps += 1
        if self._steps > self._warmup:       # skip compile steps
            self._volumes += n_volumes
            self._elapsed += dt
        return dt

    @property
    def volumes_per_sec_per_chip(self) -> float:
        if self._elapsed <= 0:
            return 0.0
        return self._volumes / self._elapsed / self._n_chips

    def summary(self) -> str:
        return (f"{self.volumes_per_sec_per_chip:.2f} volumes/sec/chip over "
                f"{self._steps - self._warmup} timed steps")


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler device trace into ``logdir``."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield
