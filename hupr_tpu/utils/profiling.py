"""Tracing / profiling helpers (aux subsystem; the reference has none —
SURVEY.md §5 — beyond wall-clock prints inside COCOeval).

  with trace("logs/profile"):      # XLA/TPU trace viewable in TensorBoard/
      train_step(...)              # Perfetto via jax.profiler

  timer = StepTimer()
  with timer.step():
      ...
  timer.summary()                  # p50/p90/mean step latencies
"""

from __future__ import annotations

import contextlib
import time
from typing import List


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler traces."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    def __init__(self):
        self.durations: List[float] = []

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield
        self.durations.append(time.perf_counter() - t0)

    def summary(self) -> dict:
        if not self.durations:
            return {}
        import numpy as np

        d = np.asarray(self.durations)
        return {
            "steps": len(d),
            "mean_s": float(d.mean()),
            "p50_s": float(np.percentile(d, 50)),
            "p90_s": float(np.percentile(d, 90)),
            "total_s": float(d.sum()),
        }
