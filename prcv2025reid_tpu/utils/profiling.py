"""Profiling / step-timing utilities.

The reference has no profiler integration (SURVEY.md §5.1 — wall-clock per
epoch and tqdm it/s only).  Here:

- ``trace``: context manager around ``jax.profiler`` writing a TensorBoard-
  compatible trace directory.
- ``StepTimer``: cheap steady-state step timing with warmup discard — the
  per-step analogue of the reference's epoch wall-clock, without syncing the
  device inside the loop (pair it with a periodic metric fetch).
- ``cost_summary``: lowered-computation FLOPs/bytes estimates from XLA's own
  cost analysis, useful to sanity-check kernel efficiency offline.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: List[float] = []
        self._last: Optional[float] = None
        self._count = 0

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self._count += 1
            if self._count > self.warmup:
                self.times.append(now - self._last)
        self._last = now

    @property
    def mean_step_time(self) -> float:
        return sum(self.times) / len(self.times) if self.times else 0.0

    def steps_per_sec(self) -> float:
        m = self.mean_step_time
        return 1.0 / m if m > 0 else 0.0


def cost_summary(jitted_fn, *args, **kwargs) -> Dict[str, float]:
    """XLA cost analysis (flops / bytes accessed) for a jitted function."""
    lowered = jitted_fn.lower(*args, **kwargs)
    compiled = lowered.compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):  # per-device list on some backends
        analysis = analysis[0] if analysis else {}
    if not analysis:  # backends without a cost model return None
        return {}
    out = {}
    for key in ("flops", "bytes accessed", "optimal_seconds"):
        if key in analysis:
            out[key.replace(" ", "_")] = float(analysis[key])
    return out
