"""Cross-process coordination and fault isolation (SURVEY.md §5):
concurrent runners dedupe via lock files; per-slide failures don't sink runs;
crashed writes leave no partial H5s."""

import threading
from pathlib import Path

import h5py
import numpy as np
import pytest
from PIL import Image

from atlaspatch_tpu.core.config import AppConfig, ExtractionConfig, OutputConfig, ProcessingConfig, SegmentationConfig
from atlaspatch_tpu.core.models import Mask
from atlaspatch_tpu.io.synthetic_wsi import make_tissue_canvas
from atlaspatch_tpu.orchestration.runner import ProcessingRunner
from atlaspatch_tpu.services.extraction import PatchExtractionService
from atlaspatch_tpu.services.interfaces import SegmentationService
from atlaspatch_tpu.services.mpp import CSVMPPResolver
from atlaspatch_tpu.services.wsi_loader import DefaultWSILoader


class SlowFakeSegmentation(SegmentationService):
    def __init__(self, delay=0.02):
        self.delay = delay

    def segment_thumbnail(self, wsi) -> Mask:
        import time

        time.sleep(self.delay)
        thumb = np.asarray(wsi.get_thumb((128, 128)).convert("L"), dtype=np.float32)
        mask = (thumb < 220).astype(np.float32)
        return Mask(data=mask, source_shape=mask.shape)

    def segment_batch(self, wsis):
        return [self.segment_thumbnail(w) for w in wsis]


def _make_slides(tmp_path: Path, n=6) -> Path:
    sdir = tmp_path / "slides"
    sdir.mkdir()
    for i in range(n):
        Image.fromarray(make_tissue_canvas(512, 512, seed=i, n_blobs=2)).save(
            sdir / f"s{i}.png"
        )
    (tmp_path / "mpp.csv").write_text(
        "wsi,mpp\n" + "\n".join(f"s{i}.png,0.5" for i in range(n))
    )
    return sdir


def _cfg(slide_dir: Path, out: Path) -> AppConfig:
    return AppConfig(
        processing=ProcessingConfig(input_path=slide_dir, mpp_csv=slide_dir.parent / "mpp.csv"),
        segmentation=SegmentationConfig(device="cpu", batch_size=2),
        extraction=ExtractionConfig(patch_size=64, target_magnification=20),
        output=OutputConfig(output_root=out),
        device="cpu",
    )


def _runner(cfg):
    return ProcessingRunner(
        config=cfg,
        segmentation=SlowFakeSegmentation(),
        extractor=PatchExtractionService(cfg.extraction, cfg.output),
        visualizer=None,
        mpp_resolver=CSVMPPResolver(cfg.processing.mpp_csv),
        wsi_loader=DefaultWSILoader(),
    )


def test_concurrent_runners_dedupe_via_locks(tmp_path: Path):
    """Two runners over the same cohort/output: every slide processed exactly
    once between them (lock files + skip-existing), no failures."""
    slide_dir = _make_slides(tmp_path, n=6)
    out = tmp_path / "out"
    outcomes = {}

    def run(tag):
        cfg = _cfg(slide_dir, out)
        outcomes[tag] = _runner(cfg).run()

    t1 = threading.Thread(target=run, args=("a",))
    t2 = threading.Thread(target=run, args=("b",))
    t1.start()
    t2.start()
    t1.join()
    t2.join()

    res_a, fail_a = outcomes["a"]
    res_b, fail_b = outcomes["b"]
    assert fail_a == [] and fail_b == []
    done = sorted(r.slide.stem for r in res_a + res_b)
    assert done == [f"s{i}" for i in range(6)]  # each exactly once
    for i in range(6):
        with h5py.File(out / "patches" / f"s{i}.h5") as f:
            assert f.attrs["num_patches"] > 0


def test_per_slide_fault_isolation(tmp_path: Path, monkeypatch):
    """One slide raising during extraction lands in failures; the rest complete."""
    slide_dir = _make_slides(tmp_path, n=4)
    out = tmp_path / "out"
    cfg = _cfg(slide_dir, out)
    runner = _runner(cfg)

    from atlaspatch_tpu.io.image_wsi import ImageWSI

    original_thumb = ImageWSI.get_thumb

    def flaky_thumb(self, max_hw):
        if "s1" in str(self.path):
            raise RuntimeError("injected thumbnail failure")
        return original_thumb(self, max_hw)

    monkeypatch.setattr(ImageWSI, "get_thumb", flaky_thumb)

    results, failures = runner.run()
    # Segmentation failure fails the whole batch (reference semantics:
    # runner batches share one segment_batch call) — s0 and s1 share a batch.
    assert any("s1" in str(s.path) for s, _ in failures)
    ok = sorted(r.slide.stem for r in results)
    assert "s1" not in ok
    assert {"s2", "s3"} <= set(ok)
    # all locks were released, failed slides included
    assert list((out / "patches").glob("*.lock")) == []


def test_crash_leaves_no_partial_h5(tmp_path: Path, monkeypatch):
    """A writer failure mid-write aborts the tmp file; the target never appears."""
    from atlaspatch_tpu.services.storage import H5PatchWriter

    out = tmp_path / "patches"
    out.mkdir()
    target = out / "s.h5"

    w = H5PatchWriter(
        chunk_rows=4,
        patch_size=64,
        patch_size_level0=64,
        level0_mag=20,
        target_mag=20,
        level0_wh=(512, 512),
        overlap=0,
        slide_stem="s",
        wsi_path="x",
    )

    def exploding_entries():
        yield (0, 0, 64, 64, 0, None)
        raise RuntimeError("boom mid-iteration")

    with pytest.raises(RuntimeError):
        w.write_coords(target, exploding_entries(), batch=4)
    assert not target.exists()
    assert list(out.glob(".*tmp*")) == []
