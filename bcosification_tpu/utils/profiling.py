"""Profiling / tracing utilities.

The reference has no profiling beyond tqdm rates (SURVEY.md §5); the
TPU-native replacement is `jax.profiler` device traces (viewable in
TensorBoard/XProf) plus a lightweight host-side step timer for
img/s accounting.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax

__all__ = ["trace", "StepTimer"]


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace: `with trace('/tmp/trace'): run_steps()`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Throughput accounting with warmup exclusion."""

    def __init__(self, warmup_steps: int = 2):
        self.warmup_steps = warmup_steps
        self._count = 0
        self._items = 0
        self._t0: Optional[float] = None

    def step(self, n_items: int) -> None:
        self._count += 1
        if self._count == self.warmup_steps:
            self._t0 = time.perf_counter()
            self._items = 0
        elif self._count > self.warmup_steps:
            self._items += n_items

    def throughput(self) -> Optional[float]:
        if self._t0 is None or self._items == 0:
            return None
        return self._items / (time.perf_counter() - self._t0)

    def summary(self) -> Dict[str, float]:
        tp = self.throughput()
        return {"items_per_s": tp or float("nan"), "steps": self._count}
