"""Profiling + throughput instrumentation.

The reference has no tracing at all (SURVEY.md §5); since the north-star
metric here is throughput, this module adds:

* :func:`trace` — a context manager around ``jax.profiler`` traces, enabled
  by passing a directory or the ``MVLDM_PROFILE_DIR`` env var (no-op
  otherwise, so it can wrap hot loops unconditionally).
* :class:`ThroughputMeter` — rolling step-time / items-per-second counters
  (frames/sec for sampling, steps/sec for training).
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import deque
from pathlib import Path
from typing import Optional


@contextlib.contextmanager
def trace(label: str, profile_dir: Optional[Path] = None):
    """Capture a jax.profiler trace for the enclosed block when enabled."""
    target = profile_dir or os.environ.get("MVLDM_PROFILE_DIR")
    if not target:
        yield
        return
    import jax

    path = Path(target) / label
    path.mkdir(parents=True, exist_ok=True)
    with jax.profiler.trace(str(path)):
        yield
    print(f"[profile] wrote trace for {label!r} to {path}")


@contextlib.contextmanager
def annotate(label: str):
    """Named region inside a captured trace (jax.profiler.TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(label):
        yield


class ThroughputMeter:
    """Rolling window throughput counter."""

    def __init__(self, window: int = 50):
        self._times: deque = deque(maxlen=window)
        self._counts: deque = deque(maxlen=window)
        self._last = time.perf_counter()

    def tick(self, items: int = 1) -> None:
        now = time.perf_counter()
        self._times.append(now - self._last)
        self._counts.append(items)
        self._last = now

    def reset_clock(self) -> None:
        self._last = time.perf_counter()

    @property
    def items_per_sec(self) -> float:
        total_t = sum(self._times)
        return sum(self._counts) / total_t if total_t > 0 else 0.0

    @property
    def mean_step_time(self) -> float:
        return sum(self._times) / len(self._times) if self._times else 0.0
