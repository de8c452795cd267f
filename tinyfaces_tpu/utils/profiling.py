"""Tracing / profiling subsystem (SURVEY.md §5: absent in the reference —
first-class here).

* `trace(logdir)`: context manager around jax.profiler for TensorBoard-
  compatible device traces.
* `StepTimer`: wall-clock per-step timing with warmup discard; reports
  steps/sec and items/sec (the images/sec/chip meter used by bench.py and
  the trainer's throughput logging).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(logdir: Optional[str] = None) -> Iterator[None]:
    """Capture a jax.profiler trace when a logdir is given; no-op otherwise."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Running throughput meter.

    >>> timer = StepTimer(warmup=2)
    >>> for batch in data:
    ...     step(batch); timer.tick(items=batch_size)
    >>> timer.items_per_sec
    """

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.reset()

    def reset(self) -> None:
        self._count = 0
        self._items = 0
        self._t0 = None
        self._last = None

    def tick(self, items: int = 1) -> None:
        now = time.perf_counter()
        self._count += 1
        self._last = now
        if self._count == self.warmup:
            self._t0 = now
            self._items = 0
        elif self._count > self.warmup:
            self._items += items

    @property
    def measured_steps(self) -> int:
        return max(0, self._count - self.warmup)

    @property
    def elapsed(self) -> float:
        if self._t0 is None or self._last is None:
            return 0.0
        return self._last - self._t0

    @property
    def steps_per_sec(self) -> float:
        return self.measured_steps / self.elapsed if self.elapsed > 0 else 0.0

    @property
    def items_per_sec(self) -> float:
        return self._items / self.elapsed if self.elapsed > 0 else 0.0
