"""Per-stage timing counters (tracing/observability — SURVEY.md §5 gap).

The reference ships no profiling; this adds lightweight wall-clock counters
for the pipeline stages (thumbnail, segment-device, contours, grid, h5-write,
patch-read, embed-device). Thread-safe; aggregated report via `report()` and
logged at the end of a run when ATLASPATCH_PROFILE=1.
"""

from __future__ import annotations

import logging
import os
import threading
import time
from collections import defaultdict
from contextlib import contextmanager

logger = logging.getLogger("atlaspatch_tpu.perf")

_lock = threading.Lock()
_totals: dict[str, float] = defaultdict(float)
_counts: dict[str, int] = defaultdict(int)
_cpu_totals: dict[str, float] = defaultdict(float)


def enabled() -> bool:
    return os.environ.get("ATLASPATCH_PROFILE") == "1"


@contextmanager
def stage(name: str):
    """Time a pipeline stage. Near-zero overhead when profiling is off.

    Records wall time AND the calling thread's CPU time: on a 1-CPU host a
    stage's wall inflates whenever its thread is descheduled by another
    pipeline stage, so cpu_s is the signal for "cycles to cut" while
    total_s - cpu_s is contention/IO wait."""
    if not enabled():
        yield
        return
    t0 = time.perf_counter()
    c0 = time.thread_time()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        dc = time.thread_time() - c0
        with _lock:
            _totals[name] += dt
            _counts[name] += 1
            _cpu_totals[name] += dc


def add(name: str, seconds: float, count: int = 1) -> None:
    with _lock:
        _totals[name] += seconds
        _counts[name] += count


def report() -> dict[str, dict[str, float]]:
    with _lock:
        return {
            name: {
                "total_s": round(_totals[name], 4),
                "cpu_s": round(_cpu_totals[name], 4),
                "count": _counts[name],
                "mean_ms": round(1000 * _totals[name] / max(1, _counts[name]), 3),
            }
            for name in sorted(_totals)
        }


def reset() -> None:
    with _lock:
        _totals.clear()
        _counts.clear()
        _cpu_totals.clear()


@contextmanager
def maybe_trace():
    """XLA-level profiling: when ATLASPATCH_JAX_TRACE=<dir> is set, capture a
    jax.profiler trace (TensorBoard/Perfetto-compatible) around the wrapped
    run. Complements the host-side stage counters above with device timelines
    (HLO op durations, HBM traffic, transfer overlap)."""
    trace_dir = os.environ.get("ATLASPATCH_JAX_TRACE")
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    logger.warning("JAX profiler trace capturing to %s", trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.warning("JAX profiler trace written to %s", trace_dir)


def log_report() -> None:
    if not enabled():
        return
    for name, row in report().items():
        logger.warning(
            "perf %-18s total=%8.3fs n=%6d mean=%8.3fms",
            name,
            row["total_s"],
            row["count"],
            row["mean_ms"],
        )
