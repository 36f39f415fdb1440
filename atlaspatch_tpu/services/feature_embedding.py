"""Patch feature embedding into existing per-slide H5 files.

Behavior parity with the reference (reference: atlas_patch/services/
feature_embedding.py:42-316): coords are re-read from the H5 and pixels
re-extracted from the slide; a per-slide `phase=features` lock serializes
writers; complete features (row count == num_patches) are skipped with a
cache; `embed_all` loops extractor-outer / slide-inner so each model loads
once.

TPU-native data path: instead of a per-patch Python loop feeding a DataLoader,
patch pixel blocks are read by a host thread pool (tile reads release the GIL
in the native decoder / PIL), resized to the patch size, and streamed into the
engine's bucketed device batches — the writer pulls feature rows by index
range (services/storage.py), so pixels never accumulate in memory.
"""

from __future__ import annotations

import logging
import os
import time
from concurrent.futures import ThreadPoolExecutor
from contextlib import contextmanager
from threading import Lock
from pathlib import Path

import h5py
import numpy as np

from atlaspatch_tpu.core.config import ExtractionConfig, FeatureExtractionConfig, OutputConfig
from atlaspatch_tpu.core.models import ExtractionResult
from atlaspatch_tpu.core.paths import patch_lock_path
from atlaspatch_tpu.io.iwsi import IWSI
from atlaspatch_tpu.models.encoders import build_default_registry
from atlaspatch_tpu.models.encoders.custom import register_feature_extractors_from_module
from atlaspatch_tpu.models.encoders.registry import PatchFeatureExtractorRegistry
from atlaspatch_tpu.services.interfaces import FeatureEmbeddingService
from atlaspatch_tpu.services.storage import H5PatchWriter
from atlaspatch_tpu.utils.features import get_existing_features

logger = logging.getLogger("atlaspatch_tpu.feature_embedding_service")


def resolve_feature_dtype(device: str, precision: str) -> str:
    """Map requested precision to the on-device compute dtype.

    float16 maps to bfloat16 — the TPU-native reduced precision (MXU);
    float32 stays exact. CPU runs always use float32 (parity with the
    reference's fp16-on-CPU fallback, feature_embedding.py:28-39).
    """
    prec = precision.lower()
    if device.startswith("cpu"):
        return "float32"
    if prec == "int8":
        # W8A8 dynamic quantization for ViT-family towers (2x MXU throughput
        # on v5e); non-ViT towers fall back to bfloat16 at build time.
        return "int8"
    if prec in ("float16", "bfloat16"):
        return "bfloat16"
    return "float32"


class PatchFeatureEmbeddingService(FeatureEmbeddingService):
    def __init__(
        self,
        extraction_cfg: ExtractionConfig,
        output_cfg: OutputConfig,
        feature_cfg: FeatureExtractionConfig,
        registry: PatchFeatureExtractorRegistry | None = None,
    ) -> None:
        self.cfg = extraction_cfg.validated()
        self.output_cfg = output_cfg.validated()
        self.feature_cfg = feature_cfg.validated()
        self.compute_dtype = resolve_feature_dtype(
            self.feature_cfg.device, self.feature_cfg.precision
        )

        self.registry = registry or build_default_registry(
            device=self.feature_cfg.device,
            num_workers=self.feature_cfg.num_workers,
            dtype=self.compute_dtype,
        )
        if registry is None and self.feature_cfg.plugins:
            for plugin_path in self.feature_cfg.plugins:
                register_feature_extractors_from_module(
                    plugin_path,
                    registry=self.registry,
                    device=self.feature_cfg.device,  # plugins honor the device too
                    dtype=self.compute_dtype,
                    num_workers=self.feature_cfg.num_workers,
                )
        self.extractor_names = [n.lower() for n in self.feature_cfg.extractors]
        self._feature_cache: dict[Path, tuple[int | None, set[str]]] = {}
        self._read_pool: ThreadPoolExecutor | None = None
        self._read_pool_lock = Lock()

    def _io_block_rows(self) -> int:
        """Rows per IO/write block: ATLASPATCH_EMBED_BLOCK_CHUNKS (default 8)
        device chunks. The device batch stays feature_cfg.batch_size — the
        engine chunks each block internally on the same 32-stride boundaries,
        so per-patch outputs are bit-identical to block==batch. A multi-chunk
        block is what lets the engine's deferred D2H overlap chunk round-trips
        (measured +53% e2e on the tunnel); with block==batch every
        extract_batch call was single-chunk and the per-block fetch
        serialized with the H5 write. Larger blocks also mean 8x fewer H5
        write calls. Cost: coarser per-encoder mid-slide fault isolation
        (a failing extractor is dropped at block, not batch, granularity)
        and ~25-50 MB more host buffering."""
        mult = max(1, int(os.environ.get("ATLASPATCH_EMBED_BLOCK_CHUNKS", "8")))
        return max(1, int(self.feature_cfg.batch_size)) * mult

    # --- patch pixel loading --------------------------------------------------------
    def _read_patch_block(self, wsi: IWSI, coords: np.ndarray) -> list[np.ndarray]:
        """Read + resize a block of patches concurrently on host threads."""
        import cv2

        from atlaspatch_tpu.utils import perf

        def read_one(row):
            x, y, rw, rh, lv = (int(v) for v in row)
            patch = wsi.extract((x, y), lv=lv, wh=(rw, rh), mode="array")
            if not isinstance(patch, np.ndarray):
                return None
            if patch.shape[0] != self.cfg.patch_size or patch.shape[1] != self.cfg.patch_size:
                patch = cv2.resize(patch, (self.cfg.patch_size, self.cfg.patch_size))
            return patch

        with perf.stage("patch_read"):
            workers = max(1, min(16, self.feature_cfg.num_workers or (os.cpu_count() or 4)))
            if workers == 1 or len(coords) <= 1:
                patches = [read_one(row) for row in coords]
            else:
                # persistent pool: this runs once per BLOCK on the hot path,
                # and per-block thread create/join is pure overhead on small
                # hosts
                if self._read_pool is None:
                    with self._read_pool_lock:
                        if self._read_pool is None:
                            self._read_pool = ThreadPoolExecutor(
                                max_workers=workers, thread_name_prefix="patch-read"
                            )
                patches = list(self._read_pool.map(read_one, coords))
        kept = [p for p in patches if p is not None]
        if len(kept) != len(patches):
            # surface reader-side drops here — downstream they'd show up as a
            # confusing per-extractor row-count mismatch charged to the models
            bad = [tuple(int(v) for v in coords[i]) for i, p in enumerate(patches) if p is None]
            logger.error(
                "patch read dropped %d/%d patches (non-array reads) at %s",
                len(bad),
                len(patches),
                bad[:5],
            )
        return kept

    def _prepare_slide(self, res: ExtractionResult, wsi_loader):
        """Producer stage for the cross-slide pipeline: open the slide, read
        its coords, and pre-read the FIRST pixel block — everything the
        embed loop would otherwise do serially between slides. Runs on a
        background thread while the previous slide's batches are on device
        (the reference re-reads patches strictly serially per slide:
        reference feature_embedding.py:81-96)."""
        wsi = wsi_loader.open(res.slide)
        try:
            with h5py.File(res.h5_path, "r") as f:
                coords = f["coords"][:]
            first = self._read_patch_block(wsi, coords[: self._io_block_rows()])
            return wsi, coords, first
        except Exception:
            try:
                wsi.cleanup()
            except Exception:
                pass
            raise

    def _block_pipeline(self, wsi: IWSI, coords: np.ndarray, first_block):
        """One-block-ahead pixel reader shared by both embed modes.

        Returns (get_block, shutdown): get_block(start, stop) yields the
        pixels for [start, stop) and kicks off the NEXT block's read on a
        background thread, so the device computes block i while the host
        reads block i+1. `first_block`, when given, seeds block 0 (it was
        pre-read by the cross-slide prep thread).
        """
        batch = self._io_block_rows()
        total_rows = int(coords.shape[0])
        prefetcher = ThreadPoolExecutor(max_workers=1, thread_name_prefix="block-read")
        pending: dict[int, object] = {}
        if first_block is not None:
            from concurrent.futures import Future

            seeded: Future = Future()
            seeded.set_result(first_block)
            pending[0] = seeded

        def read_block(start: int) -> list:
            stop = min(start + batch, total_rows)
            return self._read_patch_block(wsi, coords[start:stop])

        def get_block(start: int, stop: int) -> list:
            fut = pending.pop(start, None)
            patches = fut.result() if fut is not None else read_block(start)
            if stop < total_rows and stop not in pending:
                pending[stop] = prefetcher.submit(read_block, stop)
            return patches

        return get_block, lambda: prefetcher.shutdown(wait=True)

    @contextmanager
    def _prepped_slides(self, todo: list, wsi_loader):
        """Cross-slide prep pipeline shared by both embed modes: yields an
        iterator of (result, prep_future) where the prep for slide i+1 runs
        on a background thread while slide i embeds
        (`ATLASPATCH_SLIDE_PREFETCH=0` forces inline/serial prep for A/B).
        The context drains an unconsumed prep on exit so its WSI handle is
        not leaked."""
        prefetch_on = os.environ.get("ATLASPATCH_SLIDE_PREFETCH", "1") != "0"
        prep_pool = ThreadPoolExecutor(max_workers=1, thread_name_prefix="slide-prep")
        # All preps possibly unconsumed on abnormal exit: the one handed out
        # by the last yield (the consumer may not have taken its WSI yet —
        # cleanup() is idempotent if it did) AND the in-flight next-slide
        # prep submitted before the yield.
        state: dict[str, list] = {"futs": []}

        def _submit(index: int):
            if index >= len(todo):
                return None
            if prefetch_on:
                return prep_pool.submit(self._prepare_slide, todo[index], wsi_loader)
            from concurrent.futures import Future

            f: Future = Future()  # serial baseline: prep runs inline, lazily
            try:
                f.set_result(self._prepare_slide(todo[index], wsi_loader))
            except Exception as e:  # noqa: BLE001
                f.set_exception(e)
            return f

        def iterate():
            fut = _submit(0) if (todo and prefetch_on) else None
            for i, res in enumerate(todo):
                next_fut = _submit(i + 1) if prefetch_on else None
                if fut is None:
                    fut = _submit(i)
                state["futs"] = [f for f in (fut, next_fut) if f is not None]
                yield res, fut
                # consumer finished slide i and owns its WSI; only the
                # in-flight prep remains ours to drain
                state["futs"] = [next_fut] if next_fut is not None else []
                fut = next_fut

        try:
            yield iterate()
        finally:
            for f in state["futs"]:
                try:
                    leftover_wsi, _c, _f = f.result()
                    leftover_wsi.cleanup()
                except Exception:
                    pass
            prep_pool.shutdown(wait=True)

    # --- locks ----------------------------------------------------------------------
    def _acquire_feature_lock(self, slide) -> tuple[int | None, Path]:
        lock_path = patch_lock_path(slide, self.output_cfg, self.cfg)
        lock_path.parent.mkdir(parents=True, exist_ok=True)
        payload = f"pid={os.getpid()},time={int(time.time())},slide={slide.path},phase=features"
        try:
            fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, payload.encode())
            os.fsync(fd)
            return fd, lock_path
        except FileExistsError:
            return None, lock_path
        except Exception as e:  # noqa: BLE001
            raise RuntimeError(f"Failed to create feature lock {lock_path}: {e}") from e

    @staticmethod
    def _release_feature_lock(fd: int | None, path: Path | None) -> None:
        if fd is not None:
            try:
                os.close(fd)
            except Exception:
                pass
        if path is None:
            return
        try:
            path.unlink()
        except (FileNotFoundError, OSError):
            pass

    # --- feature presence cache -----------------------------------------------------
    def _existing_features(self, h5_path: Path, expected_total: int | None = None) -> set[str]:
        key = Path(h5_path).resolve()
        cached = self._feature_cache.get(key)
        if cached is not None:
            cached_total, cached_feats = cached
            if expected_total is None or cached_total == expected_total:
                return set(cached_feats)
        feats = get_existing_features(key, expected_total=expected_total)
        self._feature_cache[key] = (expected_total, set(feats))
        return set(feats)

    def _add_feature_to_cache(self, h5_path: Path, name: str, *, expected_total: int) -> None:
        key = Path(h5_path).resolve()
        _, current = self._feature_cache.get(key, (expected_total, set()))
        self._feature_cache[key] = (expected_total, set(current) | {name.lower()})

    def _feature_present(self, result: ExtractionResult, feature_name: str) -> bool:
        return feature_name.lower() in self._existing_features(
            result.h5_path, expected_total=result.num_patches
        )

    def _update_metadata_feature_sets(self, result: ExtractionResult) -> ExtractionResult:
        existing = sorted(
            self._existing_features(result.h5_path, expected_total=result.num_patches)
        )
        if existing:
            result.metadata["feature_sets"] = existing
        return result

    # --- embedding ------------------------------------------------------------------
    def _make_writer(self, result: ExtractionResult, wsi: IWSI) -> H5PatchWriter:
        return H5PatchWriter(
            chunk_rows=self.cfg.write_batch,
            patch_size=self.cfg.patch_size,
            patch_size_level0=result.patch_size_level0 or 0,
            level0_mag=int(wsi.mag) if wsi.mag is not None else 0,
            target_mag=self.cfg.target_magnification,
            level0_wh=wsi.get_size(lv=0),
            overlap=max(
                0, int(self.cfg.patch_size) - int(self.cfg.step_size or self.cfg.patch_size)
            ),
            slide_stem=result.slide.stem,
            wsi_path=str(wsi.path),
        )

    def _embed_with_extractor(
        self, *, result: ExtractionResult, wsi: IWSI, extractor, preloaded=None
    ) -> ExtractionResult:
        lock_fd: int | None = None
        lock_path: Path | None = None
        lock_held = False
        try:
            lock_fd, lock_path = self._acquire_feature_lock(result.slide)
            if lock_fd is None:
                logger.info(
                    "Skipping feature embedding for %s (locked by another process).",
                    result.slide.path.name,
                )
                return self._update_metadata_feature_sets(result)
            lock_held = True

            # The lock makes us the only writer, but another process may have
            # completed this feature since we last probed (work stealing makes
            # that routine): drop the cached presence set so the check below
            # reads the H5 itself.
            self._feature_cache.pop(Path(result.h5_path).resolve(), None)
            if self._feature_present(result, extractor.name):
                logger.info(
                    "Skipping feature embedding for %s (feature '%s' already exists).",
                    result.slide.path.name,
                    extractor.name,
                )
                return self._update_metadata_feature_sets(result)

            if preloaded is not None:
                coords, first_block = preloaded
            else:
                with h5py.File(result.h5_path, "r") as f:
                    coords = f["coords"][:]
                first_block = None

            get_block, shutdown_reader = self._block_pipeline(wsi, coords, first_block)

            def feature_fn(start: int, stop: int) -> np.ndarray:
                return extractor.extract_batch(
                    get_block(start, stop), batch_size=self.feature_cfg.batch_size
                )

            writer = self._make_writer(result, wsi)
            try:
                writer.append_features(
                    output_path=result.h5_path,
                    feature_name=extractor.name,
                    feature_fn=feature_fn,
                    num_rows=int(coords.shape[0]),
                    feature_batch=self._io_block_rows(),
                    feature_attrs={
                        "name": extractor.name,
                        "embedding_dim": extractor.embedding_dim,
                    },
                    expected_total=result.num_patches,
                )
            finally:
                shutdown_reader()
            self._add_feature_to_cache(
                result.h5_path, extractor.name, expected_total=result.num_patches
            )
        finally:
            if lock_held:
                self._release_feature_lock(lock_fd, lock_path)

        return self._update_metadata_feature_sets(result)

    def _embed_with_extractors(
        self, *, result: ExtractionResult, wsi: IWSI, extractors: dict, preloaded=None
    ) -> tuple[set[str], dict[str, Exception]]:
        """Slide-major: embed ALL missing features for one slide in ONE pass
        over its patch pixels (the reference re-reads patches per extractor,
        reference: atlas_patch/services/feature_embedding.py:81-96 — with N
        extractors that is N full pixel reads per slide).

        Returns (completed_names, per_extractor_errors). An extractor that
        raises mid-slide is dropped from the remaining blocks; the survivors'
        features still land atomically (append_features_multi drops the
        failed tmp dataset). Skips — lock held elsewhere, features already
        present — return empty sets without error.
        """
        lock_fd, lock_path = self._acquire_feature_lock(result.slide)
        if lock_fd is None:
            logger.info(
                "Skipping feature embedding for %s (locked by another process).",
                result.slide.path.name,
            )
            self._update_metadata_feature_sets(result)
            return set(), {}
        try:
            # Re-probe under the lock: another process may have completed some
            # features since the pending set was computed.
            self._feature_cache.pop(Path(result.h5_path).resolve(), None)
            existing = self._existing_features(
                result.h5_path, expected_total=result.num_patches
            )
            # Key by the extractor's own (case-preserved) name — the dataset
            # name the single-extractor path writes — not the lowercased
            # registry key, so features/<name> casing is mode-independent.
            todo = {
                ext.name: ext
                for ext in extractors.values()
                if str(ext.name).lower() not in existing
            }
            errors: dict[str, Exception] = {}

            with h5py.File(result.h5_path, "r") as f:
                if preloaded is None:
                    coords = f["coords"][:]
                    first_block = None
                else:
                    coords, first_block = preloaded
                # A dataset that exists but was not counted complete is a
                # stale/partial leftover; fail ONLY that extractor (like the
                # extractor-major loop does) instead of the whole slide.
                present_keys = set(f["features"].keys()) if "features" in f else set()
            for ds_name in [n for n in todo if n in present_keys]:
                errors[ds_name] = ValueError(
                    f"Feature dataset '{ds_name}' already exists in "
                    f"{result.h5_path} (partial/stale rows; delete it to regenerate)."
                )
                del todo[ds_name]
            if not todo:
                self._update_metadata_feature_sets(result)
                return set(), errors

            total_rows = int(coords.shape[0])
            get_block, shutdown_reader = self._block_pipeline(wsi, coords, first_block)

            def block_fn(start: int, stop: int) -> dict[str, np.ndarray]:
                patches = get_block(start, stop)
                out: dict[str, np.ndarray] = {}
                for name, ext in todo.items():
                    if name in errors:
                        continue
                    try:
                        rows = np.asarray(
                            ext.extract_batch(
                                patches, batch_size=self.feature_cfg.batch_size
                            )
                        )
                        # Malformed output (buggy plugin) must fail THIS
                        # extractor, not reach the writer where it would
                        # abort every extractor's tmp dataset.
                        if rows.ndim != 2 or rows.shape[0] != stop - start:
                            raise ValueError(
                                f"extractor returned shape {rows.shape} for a "
                                f"request of {stop - start} rows"
                            )
                        out[name] = rows
                    except Exception as e:  # noqa: BLE001
                        errors[name] = e
                        logger.warning(
                            "Extractor '%s' failed on %s; continuing with the rest: %s",
                            name,
                            result.slide.path.name,
                            e,
                        )
                return out

            writer = self._make_writer(result, wsi)
            try:
                done = writer.append_features_multi(
                    output_path=result.h5_path,
                    feature_names=list(todo),
                    block_fn=block_fn,
                    num_rows=total_rows,
                    feature_batch=self._io_block_rows(),
                    feature_attrs={
                        name: {"name": name, "embedding_dim": ext.embedding_dim}
                        for name, ext in todo.items()
                    },
                    expected_total=result.num_patches,
                )
            finally:
                shutdown_reader()
            for name in done:
                self._add_feature_to_cache(
                    result.h5_path, name, expected_total=result.num_patches
                )
            self._update_metadata_feature_sets(result)
            return set(done), errors
        finally:
            self._release_feature_lock(lock_fd, lock_path)

    def embed_features(self, result: ExtractionResult, *, wsi: IWSI) -> ExtractionResult:
        """Embed with the first configured extractor (single-slide path)."""
        if not self.extractor_names:
            return result
        extractor = self.registry.create(self.extractor_names[0])
        try:
            return self._embed_with_extractor(result=result, wsi=wsi, extractor=extractor)
        finally:
            try:
                extractor.cleanup()
            except Exception:
                pass

    def embed_all(self, results: list[ExtractionResult], *, wsi_loader, progress=None) -> list:
        """Embed all configured extractors over all slides.

        With >1 extractor the default is the slide-major pass: every model is
        loaded once up front and each slide's patch pixels are read ONCE and
        fanned out to all encoders (halves patch-read host work for two
        extractors; the reference reads pixels per (slide, extractor)).
        `ATLASPATCH_SLIDE_MAJOR=0` restores the extractor-major loop — use it
        when the requested models do not fit on the device together, since
        slide-major keeps all of them resident.
        """
        slide_major = (
            len(self.extractor_names) > 1
            and os.environ.get("ATLASPATCH_SLIDE_MAJOR", "1") != "0"
        )
        if slide_major:
            return self._embed_all_slide_major(
                results, wsi_loader=wsi_loader, progress=progress
            )
        return self._embed_all_extractor_major(
            results, wsi_loader=wsi_loader, progress=progress
        )

    def _pending_by_slide(
        self, results: list[ExtractionResult], progress
    ) -> dict[Path, set[str]]:
        """Probe existing features per slide; advance progress for done units."""
        pending: dict[Path, set[str]] = {}
        completed_units = 0
        for res in results:
            existing = self._existing_features(res.h5_path, expected_total=res.num_patches)
            missing = [n for n in self.extractor_names if n not in existing]
            if not missing:
                self._update_metadata_feature_sets(res)
            else:
                pending[res.h5_path] = set(missing)
            completed_units += len(self.extractor_names) - len(missing)
        if progress and completed_units:
            progress.update(completed_units)
        return pending

    def _embed_all_slide_major(
        self, results: list[ExtractionResult], *, wsi_loader, progress=None
    ) -> list:
        failures: list = []
        pending = self._pending_by_slide(results, progress)

        # Load every requested model once, up front; a model that fails to
        # build fails only its own (slide, extractor) units.
        needed = sorted({n for names in pending.values() for n in names})
        extractors: dict[str, object] = {}
        create_errors: dict[str, Exception] = {}
        for name in needed:
            try:
                extractors[name] = self.registry.create(name)
            except Exception as e:  # noqa: BLE001
                create_errors[name] = e
        if create_errors:
            for res in results:
                for name in sorted(pending.get(res.h5_path, set()) & set(create_errors)):
                    failures.append((res.slide, create_errors[name]))
                    if progress:
                        progress.update(1)
            for h5p in list(pending):
                pending[h5p] -= set(create_errors)

        todo = [r for r in results if pending.get(r.h5_path)]
        try:
            with self._prepped_slides(todo, wsi_loader) as slides:
                for res, prep_fut in slides:
                    names = sorted(pending.get(res.h5_path, set()))
                    wsi = None
                    try:
                        wsi, coords, first = prep_fut.result()
                        _done, errors = self._embed_with_extractors(
                            result=res,
                            wsi=wsi,
                            extractors={n: extractors[n] for n in names},
                            preloaded=(coords, first),
                        )
                        # errors is keyed by the extractor's dataset name
                        # (case-preserved), not the registry key — record by
                        # value.
                        failures.extend((res.slide, err) for err in errors.values())
                    except Exception as e:  # noqa: BLE001
                        # Whole-slide failure (prep or writer): every missing
                        # extractor unit for this slide failed, mirroring the
                        # extractor-major loop's one-entry-per-unit accounting.
                        failures.extend((res.slide, e) for _ in names)
                    finally:
                        if wsi is not None:
                            try:
                                wsi.cleanup()
                            except Exception:
                                pass
                    if progress:
                        progress.update(len(names))
        finally:
            for ext in extractors.values():
                try:
                    ext.cleanup()
                except Exception:
                    pass
        return failures

    def _embed_all_extractor_major(
        self, results: list[ExtractionResult], *, wsi_loader, progress=None
    ) -> list:
        """Per-extractor outer loop over all slides; each model loads once."""
        failures: list = []
        pending = self._pending_by_slide(results, progress)

        for name in self.extractor_names:
            try:
                extractor = self.registry.create(name)
            except Exception as e:  # noqa: BLE001
                for res in results:
                    if name in pending.get(res.h5_path, set()):
                        failures.append((res.slide, e))
                        if progress:
                            progress.update(1)
                continue

            # Cross-slide pipeline (shared _prepped_slides): a producer thread
            # opens slide i+1, reads its coords, and pre-reads its first pixel
            # block while slide i's batches are on the device.
            todo = [r for r in results if name in pending.get(r.h5_path, set())]
            try:
                with self._prepped_slides(todo, wsi_loader) as slides:
                    for res, prep_fut in slides:
                        wsi = None
                        try:
                            wsi, coords, first = prep_fut.result()
                            if not self._feature_present(res, extractor.name):
                                self._embed_with_extractor(
                                    result=res,
                                    wsi=wsi,
                                    extractor=extractor,
                                    preloaded=(coords, first),
                                )
                            self._update_metadata_feature_sets(res)
                        except Exception as e:  # noqa: BLE001
                            failures.append((res.slide, e))
                        finally:
                            if wsi is not None:
                                try:
                                    wsi.cleanup()
                                except Exception:
                                    pass
                        if progress:
                            progress.update(1)
            finally:
                try:
                    extractor.cleanup()
                except Exception:
                    pass
        return failures
