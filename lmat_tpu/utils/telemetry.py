"""Timers, throughput counters, and profiler hooks.

The reference's observability is StopWatch wall timers + printed totals
(SURVEY.md §5); here: the same wall timers plus reads/s and k-mer-lookups/s
counters and an optional jax.profiler trace context for TPU timelines.
"""

from __future__ import annotations

import contextlib
import time


class StopWatch:
    """Wall timer with the reference's start/stop interface."""

    def __init__(self):
        self._t0 = None
        self.elapsed = 0.0

    def start(self):
        self._t0 = time.time()
        return self

    def stop(self) -> float:
        if self._t0 is not None:
            self.elapsed += time.time() - self._t0
            self._t0 = None
        return self.elapsed


class Throughput:
    """Accumulate item counts against wall time; report rates."""

    def __init__(self):
        self.items = {}
        self.t0 = time.time()

    def add(self, key: str, n: int):
        self.items[key] = self.items.get(key, 0) + n

    def rates(self) -> dict[str, float]:
        dt = max(time.time() - self.t0, 1e-9)
        return {k: v / dt for k, v in self.items.items()}

    def report(self, out=None) -> str:
        lines = [f"{k}: {v} total, {r:.1f}/s" for (k, v), r in
                 zip(self.items.items(), self.rates().values())]
        s = "\n".join(lines)
        if out:
            print(s, file=out)
        return s


@contextlib.contextmanager
def profile_trace(logdir: str | None):
    """jax.profiler trace context (no-op when logdir is None)."""
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
