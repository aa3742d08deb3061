"""Profiling + timing harness.

SURVEY §5.1 parity: the reference records per-phase chrono timings into a
PerformanceMetrics struct (ref: weather_sim.hpp:196-223,
weather_simulation.cpp:74-157) and per-(op,size) moving averages
(gpu_adaptability.cpp:413-450). TPU equivalents:

* ``trace(dir)``         — jax.profiler context (open in TensorBoard /
                           xprof to see fusion + HBM utilization)
* ``time_jitted(fn, *a)`` — compile-excluded best-of timing via
                           block_until_ready
* ``Timer``              — named-phase accumulator (time_breakdown_ms map
                           of proto/common.proto)
* ``OpStats``            — per-(op, shape) moving averages, the analog of
                           AdaptiveKernelManager.updatePerformanceMetrics
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Any, Callable

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace scope."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_jitted(fn: Callable, *args, repeats: int = 5, **kwargs) -> dict:
    """Best-of / mean timing of a jitted callable, excluding compilation."""
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)  # compile + warm-up
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return {
        "best_s": min(times),
        "mean_s": sum(times) / len(times),
        "repeats": repeats,
    }


class Timer:
    """Named-phase wall-clock accumulator."""

    def __init__(self):
        self.totals_ms: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals_ms[name] += (time.perf_counter() - t0) * 1e3
            self.counts[name] += 1

    def breakdown(self) -> dict[str, float]:
        return dict(self.totals_ms)

    def report(self) -> str:
        total = sum(self.totals_ms.values()) or 1e-12
        lines = [f"{'phase':<24}{'ms':>12}{'%':>8}{'calls':>8}"]
        for name, ms in sorted(self.totals_ms.items(),
                               key=lambda kv: -kv[1]):
            lines.append(f"{name:<24}{ms:>12.2f}{100 * ms / total:>7.1f}%"
                         f"{self.counts[name]:>8}")
        return "\n".join(lines)


class OpStats:
    """Per-(op, key) exponential moving averages
    (ref: gpu_adaptability.cpp:413-450 moving-average history)."""

    def __init__(self, alpha: float = 0.2):
        self.alpha = alpha
        self._avg: dict[tuple, float] = {}
        self._n: dict[tuple, int] = defaultdict(int)

    def record(self, op: str, key: Any, ms: float):
        k = (op, key)
        if k in self._avg:
            self._avg[k] = (1 - self.alpha) * self._avg[k] + self.alpha * ms
        else:
            self._avg[k] = ms
        self._n[k] += 1

    def average_ms(self, op: str, key: Any) -> float:
        return self._avg.get((op, key), float("nan"))

    def best_key(self, op: str):
        """The key (e.g. block shape) with the lowest moving average."""
        cands = [(k[1], v) for k, v in self._avg.items() if k[0] == op]
        return min(cands, key=lambda kv: kv[1])[0] if cands else None
