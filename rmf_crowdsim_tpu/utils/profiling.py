"""Tracing / profiling hooks.

The reference's only observability is debug ``println!`` in the hot path
(SURVEY.md §5: lib.rs:311,317, rmf/mod.rs:231).  Here:

- :class:`StepTimer` — host-side wall-clock stats over step calls (the
  structured replacement for print-debugging): steps/sec, p50/p95/max.
- :func:`trace` — context manager around ``jax.profiler`` so a block of
  steps lands in a TensorBoard-viewable trace.
- :func:`annotate` — named TraceAnnotation for phases inside a traced
  region.

NOTE on remote-TPU timing: through an asynchronous device tunnel,
``block_until_ready`` may return before remote execution completes.
``StepTimer.sync`` fetches one scalar to the host, which is a true
barrier; pass a representative array (e.g. ``state.sim_time``).
"""

from __future__ import annotations

import contextlib
import time
from typing import List, Optional

import jax
import numpy as np


class StepTimer:
    def __init__(self, sync_leaf=None):
        self._times: List[float] = []
        self._t0: Optional[float] = None

    @staticmethod
    def sync(leaf) -> None:
        """True host barrier: fetch one element."""
        np.asarray(jax.device_get(jax.numpy.ravel(leaf)[0]))

    @contextlib.contextmanager
    def step(self, sync_leaf=None):
        t0 = time.perf_counter()
        yield
        if sync_leaf is not None:
            self.sync(sync_leaf)
        self._times.append(time.perf_counter() - t0)

    def record(self, seconds: float) -> None:
        self._times.append(seconds)

    @property
    def count(self) -> int:
        return len(self._times)

    def summary(self) -> dict:
        if not self._times:
            return {"steps": 0}
        t = np.asarray(self._times)
        return {
            "steps": int(t.size),
            "steps_per_sec": float(t.size / t.sum()),
            "p50_ms": float(np.percentile(t, 50) * 1e3),
            "p95_ms": float(np.percentile(t, 95) * 1e3),
            "max_ms": float(t.max() * 1e3),
            "total_s": float(t.sum()),
        }

    def reset(self) -> None:
        self._times.clear()


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (jax.profiler.TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)
