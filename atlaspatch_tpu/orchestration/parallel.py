"""Intra-node parallel execution of per-slide extraction.

Parity with the reference's thread-pool pipeline (reference:
atlas_patch/orchestration/parallel.py:20-167): an executor runs per-slide
extraction (host-bound: tile decode + vectorized geometry + H5 writes)
concurrently with the device-bound segmentation batches, with an
InflightTracker providing done-callbacks and backpressure against the
max-open-slides cap.
"""

from __future__ import annotations

import logging
import os
import threading
from concurrent.futures import FIRST_COMPLETED, Future, ThreadPoolExecutor, wait
from dataclasses import dataclass
from pathlib import Path
from typing import Callable

import numpy as np

from atlaspatch_tpu.core.models import ExtractionResult, Slide
from atlaspatch_tpu.io.iwsi import IWSI
from atlaspatch_tpu.services.interfaces import ExtractionService, VisualizationService

logger = logging.getLogger("atlaspatch_tpu.parallel")


@dataclass
class ExtractionTask:
    """A single slide's extraction unit (WSI + mask + held lock)."""

    slide: Slide
    wsi: IWSI
    mask: np.ndarray
    lock_fd: int | None
    lock_path: Path


class InflightTracker:
    """Thread-safe accounting of in-flight extraction futures."""

    def __init__(
        self,
        *,
        results: list[ExtractionResult],
        failures: list[tuple[Slide, Exception | str]],
        progress=None,
    ) -> None:
        self._results = results
        self._failures = failures
        self._progress = progress
        self._inflight: dict[Future, Slide] = {}
        self._lock = threading.Lock()

    def add(self, fut: Future, slide: Slide) -> None:
        with self._lock:
            self._inflight[fut] = slide
        fut.add_done_callback(self._on_done)

    def _on_done(self, fut: Future) -> None:
        with self._lock:
            slide = self._inflight.pop(fut, None)
        if slide is None:
            return
        try:
            res = fut.result()
            self._results.append(res)
            logger.info(
                "Processed %s -> %s (patches=%s)", slide.path.name, res.h5_path, res.num_patches
            )
        except Exception as e:  # noqa: BLE001
            self._failures.append((slide, e))
            logger.error("Failed to process %s: %s", slide.path.name, e)
        finally:
            if self._progress:
                self._progress.update(1)

    def count(self) -> int:
        with self._lock:
            return len(self._inflight)

    def wait_until_at_most(self, limit: int) -> None:
        limit = max(0, int(limit))
        while True:
            with self._lock:
                futs = list(self._inflight.keys())
            if len(futs) <= limit:
                return
            wait(futs, return_when=FIRST_COMPLETED)


class PatchExtractionExecutor:
    """Thread pool running extraction (+ optional visualization) per slide."""

    def __init__(
        self,
        *,
        extractor: ExtractionService,
        visualizer: VisualizationService | None,
        release_lock: Callable[[int | None, Path], None],
        max_workers: int | None = None,
    ) -> None:
        self.extractor = extractor
        self.visualizer = visualizer
        self.release_lock = release_lock
        self.max_workers = max(1, int(max_workers or os.cpu_count() or 4))
        self._executor = ThreadPoolExecutor(
            max_workers=self.max_workers, thread_name_prefix="patch-extract"
        )

    def submit(self, task: ExtractionTask) -> Future:
        return self._executor.submit(self._run_task, task)

    def _run_task(self, task: ExtractionTask) -> ExtractionResult:
        try:
            result = self.extractor.extract(task.wsi, task.mask, slide=task.slide)
            if self.visualizer:
                self.visualizer.visualize(result, wsi=task.wsi, mask=task.mask)
            return result
        finally:
            try:
                task.wsi.cleanup()
            except Exception:
                pass
            self.release_lock(task.lock_fd, task.lock_path)

    def shutdown(self) -> None:
        self._executor.shutdown(wait=True, cancel_futures=False)

    def __enter__(self) -> "PatchExtractionExecutor":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        self.shutdown()
