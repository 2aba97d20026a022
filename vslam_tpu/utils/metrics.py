"""Metrics / tracing / observability.

The reference's only runtime signals are std::cout prints (inlier counts at
src/FeatureTracker.cpp:577, new-mappoint counts at src/OptimizationBA.cpp:388)
and two live views — no timers, no log levels, no structured output
(SURVEY.md §5). This module provides what it lacks:

- :class:`StageTimer` — per-stage wall-clock accumulators with EWMA and
  percentile summaries (tracking / BA / IO stages);
- :class:`Counters` — monotonically increasing named counters (frames,
  keyframes, landmarks, BA solves) with rates;
- :func:`trace` — context manager wrapping `jax.profiler.trace` for device
  timeline capture when JAX_PROFILER_DIR-style output is wanted;
- structured one-line JSON logging via :func:`log_event`.
"""

from __future__ import annotations

import collections
import contextlib
import json
import sys
import time


class StageTimer:
    """Accumulate wall times per named stage; cheap enough for per-frame use."""

    def __init__(self, window: int = 200):
        self._samples: dict[str, collections.deque] = collections.defaultdict(
            lambda: collections.deque(maxlen=window)
        )
        self._totals: dict[str, float] = collections.defaultdict(float)
        self._counts: dict[str, int] = collections.defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.record(name, time.perf_counter() - t0)

    def record(self, name: str, dt: float):
        """Record one sample directly (for code paths where a context
        manager would force awkward re-indentation)."""
        self._samples[name].append(dt)
        self._totals[name] += dt
        self._counts[name] += 1

    def summary(self) -> dict:
        out = {}
        for name, buf in self._samples.items():
            xs = sorted(buf)
            n = len(xs)
            if not n:
                continue
            out[name] = {
                "count": self._counts[name],
                "total_s": round(self._totals[name], 4),
                "mean_ms": round(1e3 * sum(xs) / n, 3),
                "p50_ms": round(1e3 * xs[n // 2], 3),
                "p90_ms": round(1e3 * xs[min(n - 1, int(0.9 * n))], 3),
            }
        return out


class Counters:
    def __init__(self):
        self._c: dict[str, int] = collections.defaultdict(int)
        self._t0 = time.perf_counter()

    def inc(self, name: str, by: int = 1):
        self._c[name] += by

    def get(self, name: str) -> int:
        return self._c[name]

    def rates(self) -> dict:
        dt = max(time.perf_counter() - self._t0, 1e-9)
        return {f"{k}_per_s": round(v / dt, 3) for k, v in self._c.items()}

    def summary(self) -> dict:
        return dict(self._c) | self.rates()


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device timeline with jax.profiler (view with TensorBoard
    or Perfetto). Replaces the reference's vestigial commented timing code
    (src/VIOSlamMono.cpp:256-260)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def log_event(event: str, stream=None, **fields):
    """One JSON line per event: structured logging the reference never had."""
    rec = {"t": round(time.time(), 3), "event": event} | fields
    print(json.dumps(rec), file=stream or sys.stdout, flush=True)
