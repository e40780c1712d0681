"""Lightweight profiling/observability for the framework.

The reference has no tracing (SURVEY.md §5); here we wrap jax.profiler for
device traces plus a simple phase timer for benchmark drivers.  The library
itself stays pure — only the drivers import this.
"""

from __future__ import annotations

import contextlib
import time


class PhaseTimer:
    """Accumulates wall-clock per named phase; blocking is caller's job."""

    def __init__(self):
        self.totals = {}
        self.counts = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = [f"{'phase':30s} {'total_s':>10s} {'calls':>7s} {'avg_ms':>10s}"]
        for k in sorted(self.totals, key=lambda k: -self.totals[k]):
            t, c = self.totals[k], self.counts[k]
            lines.append(f"{k:30s} {t:10.3f} {c:7d} {t / c * 1e3:10.2f}")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace context (view with tensorboard/xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
