"""Lightweight phase timers + optional JAX profiler hooks.

The reference has no tracing/profiling at all (SURVEY.md §5); this gives
the runtime named phase accounting (motion filter / update / BA / ...)
with negligible overhead, plus a context manager around
jax.profiler.trace for deep dives.
"""

import contextlib
import time
from collections import defaultdict


class PhaseTimers:
    RECENT = 20

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)
        self.recent = defaultdict(list)

    @contextlib.contextmanager
    def phase(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1
            r = self.recent[name]
            r.append(dt)
            if len(r) > self.RECENT:
                r.pop(0)

    def summary(self):
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_ms": round(1e3 * self.totals[name]
                                 / max(self.counts[name], 1), 3),
                "warm_ms": round(
                    1e3 * sum(self.recent[name])
                    / max(len(self.recent[name]), 1), 3,
                ),
            }
            for name in sorted(self.totals)
        }

    def report(self):
        lines = [f"{'phase':24s} {'count':>6s} {'mean ms':>10s} "
                 f"{'warm ms':>10s} {'total s':>9s}"]
        for name, s in self.summary().items():
            lines.append(
                f"{name:24s} {s['count']:6d} {s['mean_ms']:10.2f} "
                f"{s['warm_ms']:10.2f} {s['total_s']:9.2f}"
            )
        return "\n".join(lines)


GLOBAL_TIMERS = PhaseTimers()


@contextlib.contextmanager
def jax_trace(logdir="/tmp/droid_tpu_trace"):
    """Wrap a region in a jax profiler trace (view with TensorBoard)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
