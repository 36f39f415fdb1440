"""A/B: slide-major vs extractor-major multi-extractor embedding on the TPU.

Measures the `embed_all` loop-structure difference in isolation: the same
warm, pre-built extractors are served to both modes through a no-op-cleanup
registry, the same coords H5s are re-copied fresh per pass, and modes
alternate A,B,A,B,... so tunnel drift hits both equally. Reports wall time
and the `patch_read` perf-counter share per mode.

Run ISOLATED (no concurrent CPU load — see docs/PERF.md measurement rules):

    ATLASPATCH_PROFILE=1 python tools/ab_slide_major.py
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

os.environ.setdefault("ATLASPATCH_ALLOW_RANDOM_WEIGHTS", "1")
os.environ.setdefault("ATLASPATCH_PROFILE", "1")

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

N_SLIDES = int(os.environ.get("AB_SLIDES", "8"))
PASS_PAIRS = int(os.environ.get("AB_PASSES", "3"))
EXTRACTORS = os.environ.get("AB_EXTRACTORS", "vit_l_16,resnet50").split(",")
DEVICE = os.environ.get("AB_DEVICE", "tpu")  # cpu for a functional smoke run
SLIDE_W, SLIDE_H = 4096, 3072


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def build_corpus(tmp: Path) -> list:
    """Synthetic SVS pyramids → segmentation (thresholded thumbs) → coords H5s."""
    from PIL import Image

    from tiff_builder import write_pyramid

    from atlaspatch_tpu.core.models import Mask
    from atlaspatch_tpu.orchestration.runner import ProcessingRunner
    from atlaspatch_tpu.io.synthetic_wsi import make_tissue_canvas
    from atlaspatch_tpu.services.extraction import PatchExtractionService
    from atlaspatch_tpu.services.interfaces import SegmentationService
    from atlaspatch_tpu.services.wsi_loader import DefaultWSILoader
    from atlaspatch_tpu.core.config import (
        AppConfig, ExtractionConfig, OutputConfig, ProcessingConfig, SegmentationConfig,
    )

    in_dir = tmp / "slides"
    in_dir.mkdir()
    log(f"writing {N_SLIDES} JPEG-tiled SVS pyramids ...")
    canvases = [make_tissue_canvas(SLIDE_W, SLIDE_H, seed=7 + s, n_blobs=3) for s in range(4)]
    for i in range(N_SLIDES):
        write_pyramid(
            in_dir / f"ab{i:03d}.svs", canvases[i % 4], levels=3, tile=256, compression=7,
            description=f"Aperio Image Library v12\r\n{SLIDE_W}x{SLIDE_H} | AppMag = 20 | MPP = 0.5",
        )

    class ThresholdSeg(SegmentationService):
        def segment_thumbnail(self, wsi) -> Mask:
            thumb = np.asarray(wsi.get_thumb((256, 256)).convert("L"), dtype=np.float32)
            mask = (thumb < 220).astype(np.float32)
            return Mask(data=mask, source_shape=mask.shape)

        def segment_batch(self, wsis):
            return [self.segment_thumbnail(w) for w in wsis]

        def close(self):
            pass

    class NullResolver:
        def resolve(self, slide):
            return None

    cfg = AppConfig(
        processing=ProcessingConfig(input_path=in_dir),
        segmentation=SegmentationConfig(device="cpu", batch_size=8),
        extraction=ExtractionConfig(
            patch_size=256, target_magnification=20, tissue_threshold=0.0
        ),
        output=OutputConfig(output_root=tmp / "coords_out", skip_existing=False),
        device="cpu",
    )
    runner = ProcessingRunner(
        config=cfg,
        segmentation=ThresholdSeg(),
        extractor=PatchExtractionService(cfg.extraction, cfg.output),
        visualizer=None,
        mpp_resolver=NullResolver(),
        wsi_loader=DefaultWSILoader(),
    )
    results, failures = runner.run()
    assert not failures, failures
    total = sum(r.num_patches for r in results)
    log(f"corpus ready: {len(results)} slides, {total} patches total")
    return sorted(results, key=lambda r: r.slide.stem), cfg


class WarmRegistry:
    """Serves pre-built warm extractor instances; cleanup() is disarmed so
    both A/B modes reuse the same compiled programs and device params."""

    def __init__(self, extractors: dict):
        self._ext = extractors
        for ext in extractors.values():
            ext.cleanup = lambda: None  # instance-level no-op

    def create(self, name: str):
        return self._ext[name]


def main() -> None:
    from atlaspatch_tpu.core.config import FeatureExtractionConfig
    from atlaspatch_tpu.models.encoders.zoo import build_default_registry
    from atlaspatch_tpu.services.feature_embedding import PatchFeatureEmbeddingService
    from atlaspatch_tpu.services.wsi_loader import DefaultWSILoader
    from atlaspatch_tpu.utils import perf

    tmp = Path(tempfile.mkdtemp(prefix="ab_slide_major_"))
    results, cfg = build_corpus(tmp)
    total_patches = sum(r.num_patches for r in results)

    real_reg = build_default_registry(device=DEVICE, dtype="bfloat16" if DEVICE != "cpu" else "float32")
    warm_patches = list(
        np.random.default_rng(0).integers(0, 255, (64, 256, 256, 3), dtype=np.uint8)
    )
    if len(EXTRACTORS) < 2:
        raise SystemExit(
            "AB_EXTRACTORS needs >= 2 names: with one extractor the service "
            "runs extractor-major in BOTH modes, so the A/B ratio is noise."
        )
    extractors = {}
    for name in EXTRACTORS:
        log(f"building + warming {name} ...")
        ext = real_reg.create(name)
        out = ext.extract_batch(warm_patches, batch_size=32)
        assert np.isfinite(out).all()
        # the embedding service lowercases names before create()
        extractors[name.lower()] = ext
    registry = WarmRegistry(extractors)

    feat_cfg = FeatureExtractionConfig(
        extractors=EXTRACTORS, batch_size=32, device=DEVICE, precision="float16"
    )

    def run_mode(mode: str, tag: str) -> tuple[float, dict]:
        os.environ["ATLASPATCH_SLIDE_MAJOR"] = "1" if mode == "slide" else "0"
        run_results = []
        run_dir = tmp / f"run_{tag}"
        for r in results:
            dst_dir = run_dir / "patches"
            dst_dir.mkdir(parents=True, exist_ok=True)
            dst = dst_dir / r.h5_path.name
            shutil.copyfile(r.h5_path, dst)
            import dataclasses

            run_results.append(
                dataclasses.replace(r, h5_path=dst, metadata=dict(r.metadata))
            )
        svc = PatchFeatureEmbeddingService(
            cfg.extraction,
            type(cfg.output)(output_root=run_dir, skip_existing=False),
            feat_cfg,
            registry=registry,
        )
        perf.reset()
        t0 = time.perf_counter()
        fails = svc.embed_all(run_results, wsi_loader=DefaultWSILoader())
        dt = time.perf_counter() - t0
        assert fails == [], fails
        counters = perf.report()
        return dt, counters

    modes = []
    for p in range(PASS_PAIRS):
        for mode in ("extractor", "slide"):
            dt, counters = run_mode(mode, f"{mode}{p}")
            read = counters.get("patch_read", {})
            rate = total_patches * len(EXTRACTORS) / dt
            log(
                f"pass {p} {mode:9s}: {dt:6.2f}s wall  {rate:7.1f} unit-patches/s  "
                f"patch_read {read.get('total_s', 0):6.2f}s / {int(read.get('count', 0))} blocks"
            )
            modes.append((mode, dt, read.get("total_s", 0.0)))

    for mode in ("extractor", "slide"):
        walls = [d for m, d, _ in modes if m == mode]
        reads = [r for m, _, r in modes if m == mode]
        log(
            f"{mode:9s}: wall median {statistics.median(walls):.2f}s "
            f"(best {min(walls):.2f}s)  patch_read median {statistics.median(reads):.2f}s"
        )
    em = statistics.median([d for m, d, _ in modes if m == "extractor"])
    sm = statistics.median([d for m, d, _ in modes if m == "slide"])
    log(f"slide-major speedup (median wall): {em / sm:.3f}x over {total_patches} patches x {len(EXTRACTORS)} extractors")


if __name__ == "__main__":
    main()
