"""Tracing/profiling helpers.

The reference has only ad-hoc wall-clock prints
(generate_blackbox_saliency.py:168,195-198; net_mate_nonmate_dists.py:109).
Here per-map timing is first-class (the benchmark metric) and device traces
come from jax.profiler for perfetto/tensorboard analysis.
"""

from __future__ import annotations

import contextlib
import time


class Timer:
    """Accumulating wall-clock timer with per-key stats."""

    def __init__(self):
        self.totals = {}
        self.counts = {}

    @contextlib.contextmanager
    def time(self, key):
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            self.totals[key] = self.totals.get(key, 0.0) + dt
            self.counts[key] = self.counts.get(key, 0) + 1

    def report(self):
        lines = []
        for k in sorted(self.totals):
            n = self.counts[k]
            lines.append("%-40s %8.3fs total  %8.1f ms/call  (%d calls)"
                         % (k, self.totals[k],
                            1000 * self.totals[k] / max(n, 1), n))
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(logdir):
    """jax.profiler trace context: view with tensorboard/perfetto."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
