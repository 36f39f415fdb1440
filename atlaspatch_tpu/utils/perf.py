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


def enabled() -> bool:
    return os.environ.get("ATLASPATCH_PROFILE") == "1"


@contextmanager
def stage(name: str):
    """Time a pipeline stage. Near-zero overhead when profiling is off."""
    if not enabled():
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        with _lock:
            _totals[name] += dt
            _counts[name] += 1


def add(name: str, seconds: float, count: int = 1) -> None:
    with _lock:
        _totals[name] += seconds
        _counts[name] += count


def report() -> dict[str, dict[str, float]]:
    with _lock:
        return {
            name: {
                "total_s": round(_totals[name], 4),
                "count": _counts[name],
                "mean_ms": round(1000 * _totals[name] / max(1, _counts[name]), 3),
            }
            for name in sorted(_totals)
        }


def reset() -> None:
    with _lock:
        _totals.clear()
        _counts.clear()


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
