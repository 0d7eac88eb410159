"""Tracing / profiling utilities (SURVEY.md §5.1 TPU equivalent).

The reference's only observability is tqdm counters; here:

* :class:`StepTimer` — wall-clock step timing with a tiles/sec counter (the
  BASELINE north-star metric), EMA-smoothed, relay-safe when given a
  ``sync`` callable that forces a device transfer (see bench.py notes on
  ``block_until_ready`` through the axon relay).
* :func:`trace` — context manager around ``jax.profiler`` for on-demand
  TensorBoard traces of the train/predict step.
* :func:`annotate` — named trace region (shows up in xprof timelines).
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax


class StepTimer:
    def __init__(self, items_per_step: int, ema: float = 0.9,
                 sync: Optional[Callable] = None):
        self.items = items_per_step
        self.ema = ema
        self.sync = sync
        self.rate = None
        self._t0 = None
        self.steps = 0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        """End a step; returns the smoothed items/sec."""
        if self._t0 is None:
            raise RuntimeError("StepTimer.stop() before start()")
        if self.sync is not None:
            self.sync()
        dt = time.perf_counter() - self._t0
        rate = self.items / dt
        self.rate = rate if self.rate is None else (
            self.ema * self.rate + (1 - self.ema) * rate)
        self.steps += 1
        return self.rate

    @contextlib.contextmanager
    def step(self):
        self.start()
        yield
        self.stop()


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a TensorBoard/xprof trace of the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for xprof timelines (usable as context manager)."""
    return jax.profiler.TraceAnnotation(name)
