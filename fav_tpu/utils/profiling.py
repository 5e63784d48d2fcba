"""Tracing / profiling (SURVEY.md §5.1).

The reference has no backend tracing — only a frontend FPS counter
(reference app.js:54-57,715-723). The TPU build provides:

* :class:`LatencyStats` — lock-free-ish streaming latency histogram with
  log-spaced bins (10 us .. 10 s) giving count / mean / p50 / p95 / p99 per
  pipeline stage,
* :class:`StageTimer` — context manager feeding a stats registry; the
  streaming server wraps analysis / inference / encode / tick with it and
  exposes the registry at ``/api/metrics``,
* :func:`profiler_trace` — a ``jax.profiler`` trace context writing a
  TensorBoard-loadable trace directory for device-level inspection.
"""

from __future__ import annotations

import contextlib
import math
import time

__all__ = ["LatencyStats", "StageTimer", "profiler_trace"]

_BIN_LO = 1e-5  # 10 us
_BIN_HI = 10.0  # 10 s
_NUM_BINS = 96
_LOG_LO = math.log(_BIN_LO)
_LOG_RATIO = (math.log(_BIN_HI) - _LOG_LO) / _NUM_BINS


class LatencyStats:
    """Streaming latency histogram with log-spaced bins."""

    def __init__(self) -> None:
        self.counts = [0] * (_NUM_BINS + 2)  # + underflow/overflow
        self.total = 0
        self.sum = 0.0
        self.max = 0.0

    def record(self, seconds: float) -> None:
        self.total += 1
        self.sum += seconds
        if seconds > self.max:
            self.max = seconds
        if seconds < _BIN_LO:
            idx = 0
        elif seconds >= _BIN_HI:
            idx = _NUM_BINS + 1
        else:
            idx = 1 + int((math.log(seconds) - _LOG_LO) / _LOG_RATIO)
        self.counts[idx] += 1

    def _quantile(self, q: float) -> float:
        if self.total == 0:
            return 0.0
        target = q * self.total
        seen = 0
        for i, c in enumerate(self.counts):
            seen += c
            if seen >= target:
                if i == 0:
                    return _BIN_LO
                if i == _NUM_BINS + 1:
                    return self.max
                return math.exp(_LOG_LO + (i - 0.5) * _LOG_RATIO)
        return self.max

    def summary(self) -> dict:
        return {
            "count": self.total,
            "mean_ms": round(1e3 * self.sum / self.total, 3) if self.total else 0.0,
            "p50_ms": round(1e3 * self._quantile(0.50), 3),
            "p95_ms": round(1e3 * self._quantile(0.95), 3),
            "p99_ms": round(1e3 * self._quantile(0.99), 3),
            "max_ms": round(1e3 * self.max, 3),
        }


class StageTimer:
    """Registry of named LatencyStats + a context manager to feed them.

    >>> timer = StageTimer()
    >>> with timer.stage("analysis"):
    ...     do_work()
    >>> timer.summary()["analysis"]["p95_ms"]
    """

    def __init__(self) -> None:
        self._stats: dict[str, LatencyStats] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.record(name, time.perf_counter() - t0)

    def record(self, name: str, seconds: float) -> None:
        stats = self._stats.get(name)
        if stats is None:
            stats = self._stats[name] = LatencyStats()
        stats.record(seconds)

    def summary(self) -> dict:
        return {name: s.summary() for name, s in self._stats.items()}


@contextlib.contextmanager
def profiler_trace(log_dir: str = "/tmp/fav_trace"):
    """Device-level trace via jax.profiler (TensorBoard format)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
