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
    """Per-phase wall-time accounting with compile/steady-state
    separation.

    A phase's FIRST sample almost always contains an XLA compile (tens
    of seconds through the relay vs milliseconds steady-state), and
    mid-stream shape-bucket recompiles can land anywhere — so a mean
    over recent samples overstates warm costs by orders of magnitude
    (round-3 bench: the `filter.delta` warm column showed 8.5 s for an
    8 ms phase).  `warm_ms` is therefore the MEDIAN of the recent
    window (robust to a few compile spikes), and `first_ms`/`max_ms`
    expose the compile cost explicitly instead of smearing it.
    """

    RECENT = 20

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)
        self.recent = defaultdict(list)
        self.first = {}
        self.maxes = defaultdict(float)

    @contextlib.contextmanager
    def phase(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1
            if name not in self.first:
                self.first[name] = dt
            self.maxes[name] = max(self.maxes[name], dt)
            r = self.recent[name]
            r.append(dt)
            if len(r) > self.RECENT:
                r.pop(0)

    @staticmethod
    def _median(xs):
        s = sorted(xs)
        n = len(s)
        if n == 0:
            return 0.0
        return s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])

    def summary(self):
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_ms": round(1e3 * self.totals[name]
                                 / max(self.counts[name], 1), 3),
                "warm_ms": round(1e3 * self._median(self.recent[name]), 3),
                "first_ms": round(1e3 * self.first.get(name, 0.0), 3),
                "max_ms": round(1e3 * self.maxes[name], 3),
            }
            for name in sorted(self.totals)
        }

    def report(self):
        lines = [f"{'phase':24s} {'count':>6s} {'warm ms':>10s} "
                 f"{'mean ms':>10s} {'first ms':>10s} {'max ms':>10s} "
                 f"{'total s':>9s}"]
        for name, s in self.summary().items():
            lines.append(
                f"{name:24s} {s['count']:6d} {s['warm_ms']:10.2f} "
                f"{s['mean_ms']:10.2f} {s['first_ms']:10.2f} "
                f"{s['max_ms']:10.2f} {s['total_s']:9.2f}"
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
