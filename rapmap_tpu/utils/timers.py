"""Per-stage timing (ScopedTimer role, SURVEY.md §5.1) + jax.profiler hooks."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class StageTimers:
    """Accumulates wall time per named stage; cheap enough to leave on."""

    def __init__(self) -> None:
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> dict[str, dict[str, float]]:
        return {
            k: {"total_s": round(v, 4), "calls": self.counts[k]}
            for k, v in sorted(self.totals.items(), key=lambda kv: -kv[1])
        }

    def log(self, logger) -> None:
        for k, v in self.summary().items():
            logger.info("stage %-12s %8.3fs over %d calls", k, v["total_s"], v["calls"])


@contextlib.contextmanager
def device_trace(trace_dir: str | None):
    """jax.profiler trace when a directory is given; no-op otherwise."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
