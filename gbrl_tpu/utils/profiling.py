"""Tracing & profiling (first-class here; the reference only has stdout
verbose prints, SURVEY §5).

- ``trace(logdir)``: context manager around jax.profiler for xprof traces.
- ``StepTimer``: lightweight named-phase wall-clock aggregation for training
  loops (host-side; call ``report()`` for a summary).
- ``annotate(name)``: jax.profiler.TraceAnnotation passthrough so custom
  phases show in the trace viewer.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture an xprof/TensorBoard trace of everything inside the block."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Aggregate wall-clock per named phase.

    >>> timer = StepTimer()
    >>> with timer("rollout"): ...
    >>> with timer("update"): ...
    >>> print(timer.report())
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        total = sum(self.totals.values()) or 1.0
        for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:>16}: {t:8.3f}s total  "
                         f"{t / n * 1000:8.2f}ms/call  x{n}  "
                         f"{t / total * 100:5.1f}%")
        return "\n".join(lines)

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()
