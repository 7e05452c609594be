"""Per-stage wall-clock profiling — the observability the reference lacks.

The reference's only instrumentation is four startup banners (SURVEY.md §5);
scans/sec is never measured.  This module provides cheap host-side stage
timers (scans/sec is the north-star metric) and a context-manager hook around
``jax.profiler`` for device traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict


class StageTimer:
    """Accumulates wall-clock per named stage; thread-unsafe by design (the
    deterministic single-driver pipeline has exactly one thread)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            n = self.counts[name]
            tot = self.totals[name]
            lines.append(f"{name:28s} {tot:8.3f}s total  {n:6d}x  "
                         f"{tot / max(n, 1) * 1000:8.2f} ms avg")
        return "\n".join(lines)

    def rates(self) -> Dict[str, float]:
        """Per-stage calls/sec."""
        return {k: self.counts[k] / t for k, t in self.totals.items() if t > 0}


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace wrapper (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
