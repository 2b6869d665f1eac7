"""Profiling and tracing hooks.

The reference has no profiler integration at all (SURVEY.md §5: wall-clock
around generate is its only speed instrumentation). Here:

* `trace(dir)` — context manager around jax.profiler for XLA/TPU traces
  viewable in TensorBoard/Perfetto;
* `StepTimer` — cheap rolling wall-clock stats for train/decode loops;
* `device_time(fn, *args)` — robust kernel timing on tunneled backends,
  forcing a device-to-host sync of a scalar (block_until_ready alone is not
  reliable on the axon transport; see bench.py).
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Callable, Deque, Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace when log_dir is set; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling throughput stats: call tick() once per step."""

    def __init__(self, window: int = 50):
        self._times: Deque[float] = deque(maxlen=window)
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self._times.append(dt)
        self._last = now
        return dt

    @property
    def mean_step_seconds(self) -> float:
        return float(np.mean(self._times)) if self._times else 0.0

    @property
    def steps_per_second(self) -> float:
        m = self.mean_step_seconds
        return 1.0 / m if m > 0 else 0.0


def device_time(fn: Callable, *args, iters: int = 5, warmup: int = 1) -> float:
    """Average seconds per call of a jitted fn, syncing via host transfer."""
    import jax

    def sync(out):
        leaf = jax.tree.leaves(out)[0]
        np.asarray(jax.device_get(leaf)).ravel()[:1]

    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        sync(fn(*args))
    return (time.perf_counter() - t0) / iters
