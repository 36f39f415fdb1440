"""End-to-end pipeline integration: discovery → segmentation (fake service) →
lock → extraction → H5, then feature embedding with a toy encoder, skip/resume
semantics, and CLI wiring."""

from pathlib import Path

import h5py
import numpy as np
import pytest
from PIL import Image

from atlaspatch_tpu.core.config import (
    AppConfig,
    ExtractionConfig,
    FeatureExtractionConfig,
    OutputConfig,
    ProcessingConfig,
    SegmentationConfig,
)
from atlaspatch_tpu.core.models import Mask, Slide
from atlaspatch_tpu.core.paths import patch_lock_path
from atlaspatch_tpu.io.synthetic_wsi import make_tissue_canvas
from atlaspatch_tpu.models.encoders.engine import PreprocessSpec
from atlaspatch_tpu.models.encoders.registry import PatchFeatureExtractorRegistry
from atlaspatch_tpu.orchestration.runner import ProcessingRunner
from atlaspatch_tpu.services.extraction import PatchExtractionService
from atlaspatch_tpu.services.feature_embedding import PatchFeatureEmbeddingService
from atlaspatch_tpu.services.interfaces import SegmentationService
from atlaspatch_tpu.services.mpp import CSVMPPResolver
from atlaspatch_tpu.services.visualization import DefaultVisualizationService
from atlaspatch_tpu.services.wsi_loader import DefaultWSILoader


class FakeSegmentation(SegmentationService):
    """Thresholds the thumbnail itself: non-background pixels are tissue."""

    def segment_thumbnail(self, wsi) -> Mask:
        thumb = np.asarray(wsi.get_thumb((256, 256)).convert("L"), dtype=np.float32)
        mask = (thumb < 220).astype(np.float32)
        return Mask(data=mask, source_shape=mask.shape)

    def segment_batch(self, wsis):
        return [self.segment_thumbnail(w) for w in wsis]

    def close(self):
        pass


class ToyEncoder:
    """Deterministic feature extractor: mean RGB + constant padding."""

    name = "toy"
    embedding_dim = 8

    def extract_batch(self, patches, *, batch_size=None):
        spec = PreprocessSpec(crop=32, resize=32, mode="square")
        out = []
        for p in patches:
            img = spec.apply_host(p).astype(np.float32)
            row = np.concatenate([img.mean(axis=(0, 1)) / 255.0, np.full(5, 0.5)])
            out.append(row)
        return np.stack(out).astype(np.float32)

    def cleanup(self):
        pass


@pytest.fixture
def slide_dir(tmp_path: Path) -> Path:
    sdir = tmp_path / "slides"
    sdir.mkdir()
    for i in range(3):
        canvas = make_tissue_canvas(1024, 768, seed=i, n_blobs=2)
        Image.fromarray(canvas).save(sdir / f"slide{i}.png")
    (tmp_path / "mpp.csv").write_text(
        "wsi,mpp\n" + "\n".join(f"slide{i}.png,0.5" for i in range(3))
    )
    return sdir


def _app_config(slide_dir: Path, out: Path, features=None, **extraction_kw) -> AppConfig:
    kw = dict(patch_size=128, target_magnification=20, tissue_threshold=0.0)
    kw.update(extraction_kw)
    return AppConfig(
        processing=ProcessingConfig(
            input_path=slide_dir, mpp_csv=slide_dir.parent / "mpp.csv"
        ),
        segmentation=SegmentationConfig(device="cpu", batch_size=2),
        extraction=ExtractionConfig(**kw),
        output=OutputConfig(output_root=out),
        features=features,
        device="cpu",
    )


def _runner(cfg: AppConfig, visualizer=None) -> ProcessingRunner:
    return ProcessingRunner(
        config=cfg,
        segmentation=FakeSegmentation(),
        extractor=PatchExtractionService(cfg.extraction, cfg.output),
        visualizer=visualizer,
        mpp_resolver=CSVMPPResolver(cfg.processing.mpp_csv),
        wsi_loader=DefaultWSILoader(),
    )


def test_runner_end_to_end(slide_dir: Path, tmp_path: Path):
    cfg = _app_config(slide_dir, tmp_path / "out")
    results, failures = _runner(cfg).run()
    assert failures == []
    assert len(results) == 3
    for res in sorted(results, key=lambda r: r.slide.stem):
        assert res.h5_path.exists()
        with h5py.File(res.h5_path) as f:
            assert f["coords"].shape[0] == res.num_patches > 0
            assert f.attrs["num_patches"] == res.num_patches
            assert f.attrs["mpp"] == 0.5
            assert f.attrs["level0_magnification"] == 20
        # locks released
        assert not patch_lock_path(res.slide, cfg.output, cfg.extraction).exists()


def test_runner_skip_existing_and_lock(slide_dir: Path, tmp_path: Path):
    cfg = _app_config(slide_dir, tmp_path / "out")
    results, _ = _runner(cfg).run()
    assert len(results) == 3
    # Second run: everything skipped
    results2, failures2 = _runner(cfg).run()
    assert failures2 == []
    assert results2 == []

    # A held lock causes a skip (not a failure)
    cfg_force = _app_config(slide_dir, tmp_path / "out2")
    lock = patch_lock_path(Slide(path=slide_dir / "slide0.png"), cfg_force.output,
                           cfg_force.extraction)
    lock.parent.mkdir(parents=True, exist_ok=True)
    lock.write_text("pid=held")
    results3, failures3 = _runner(cfg_force).run()
    assert failures3 == []
    assert len(results3) == 2
    lock.unlink()


def test_feature_embedding_end_to_end(slide_dir: Path, tmp_path: Path):
    registry = PatchFeatureExtractorRegistry()
    registry.register("toy", ToyEncoder)
    feat_cfg = FeatureExtractionConfig(
        extractors=["toy"], batch_size=16, device="cpu", precision="float32"
    )
    cfg = _app_config(slide_dir, tmp_path / "out", features=feat_cfg)
    results, failures = _runner(cfg).run()
    assert failures == []

    svc = PatchFeatureEmbeddingService(cfg.extraction, cfg.output, feat_cfg, registry=registry)
    fails = svc.embed_all(results, wsi_loader=DefaultWSILoader())
    assert fails == []
    for res in results:
        with h5py.File(res.h5_path) as f:
            feats = f["features/toy"][:]
            assert feats.shape == (res.num_patches, 8)
            assert np.all(feats[:, 3:] == 0.5)
        assert res.metadata["feature_sets"] == ["toy"]

    # Re-embedding is a no-op (complete feature detected)
    fails2 = svc.embed_all(results, wsi_loader=DefaultWSILoader())
    assert fails2 == []


def test_resume_after_partial_feature(slide_dir: Path, tmp_path: Path):
    registry = PatchFeatureExtractorRegistry()
    registry.register("toy", ToyEncoder)
    feat_cfg = FeatureExtractionConfig(
        extractors=["toy"], batch_size=16, device="cpu", precision="float32"
    )
    cfg = _app_config(slide_dir, tmp_path / "out", features=feat_cfg)
    results, _ = _runner(cfg).run()
    res = results[0]
    # Simulate a partial (crashed) feature dataset
    with h5py.File(res.h5_path, "a") as f:
        g = f.require_group("features")
        g.create_dataset("toy", data=np.zeros((1, 8), np.float32), maxshape=(None, 8))
    svc = PatchFeatureEmbeddingService(cfg.extraction, cfg.output, feat_cfg, registry=registry)
    # Partial dataset (wrong row count) must be treated as missing → error on
    # duplicate create; embed_all records the failure rather than crashing.
    fails = svc.embed_all([res], wsi_loader=DefaultWSILoader())
    assert len(fails) == 1  # duplicate dataset rejected, surfaced as failure


def test_visualizations_written(slide_dir: Path, tmp_path: Path):
    out = tmp_path / "out"
    cfg = _app_config(slide_dir, out)
    cfg.output.visualize_grids = True
    cfg.output.visualize_mask = True
    cfg.output.visualize_contours = True
    vis = DefaultVisualizationService(cfg.output, cfg.extraction)
    results, failures = _runner(cfg, visualizer=vis).run()
    assert failures == []
    vis_dir = out / "visualization"
    for i in range(3):
        assert (vis_dir / f"slide{i}.png").exists()  # grid overlay
        assert (vis_dir / f"slide{i}_mask.png").exists()
        assert (vis_dir / f"slide{i}_mask_bw.png").exists()
        assert (vis_dir / f"slide{i}_contours.png").exists()


def test_save_images(slide_dir: Path, tmp_path: Path):
    out = tmp_path / "out"
    cfg = _app_config(slide_dir, out)
    cfg.output.save_images = True
    results, failures = _runner(cfg).run()
    assert failures == []
    for res in results:
        pngs = list((out / "images" / res.slide.stem).glob("*.png"))
        assert len(pngs) == res.num_patches


def test_cli_help_and_info():
    from click.testing import CliRunner

    from atlaspatch_tpu.cli import cli

    runner = CliRunner()
    for cmd in ("segment-and-get-coords", "detect-tissue", "process", "info"):
        result = runner.invoke(cli, [cmd, "--help"])
        assert result.exit_code == 0, result.output
    result = runner.invoke(cli, ["info"])
    assert result.exit_code == 0
    assert "resnet50" in result.output
    assert "uni_v2" in result.output


def test_thumbnail_quantization_buckets_shapes(tmp_path, monkeypatch):
    """Fast-mode (non-float32) thumbnails snap to multiples of the shape
    quantum so heterogeneous corpora land in a handful of jit shapes; the
    reference-exact float32 / host-resize chains stay unquantized."""
    import numpy as np

    from atlaspatch_tpu.core.config import SegmentationConfig
    from atlaspatch_tpu.io.synthetic_wsi import SyntheticWSI
    from atlaspatch_tpu.services.segmentation import SAM2SegmentationService

    monkeypatch.setenv("ATLASPATCH_ALLOW_RANDOM_WEIGHTS", "1")
    monkeypatch.delenv("ATLASPATCH_HOST_RESIZE", raising=False)

    def make_service(precision):
        from atlaspatch_tpu.models.sam2.config import SAM2Config

        cfg = SegmentationConfig(device="cpu", precision=precision)
        return SAM2SegmentationService(cfg, SAM2Config.test_tiny())

    # odd, mutually different level-0 sizes -> distinct native thumb shapes
    wsis = [
        SyntheticWSI(size=(w, h), mag=20, seed=i)
        for i, (w, h) in enumerate([(1013, 757), (991, 731), (1024, 768)])
    ]

    svc = make_service("bfloat16")
    thumbs = svc.prepare_thumbnails(wsis)
    q = svc._thumb_quant()
    assert q > 0
    for t in thumbs:
        assert t.width % q == 0 and t.height % q == 0
    # quantization collapses near-identical shapes into one bucket
    assert len({(t.height, t.width) for t in thumbs}) < len(wsis)

    svc32 = make_service("float32")
    assert svc32._thumb_quant() == 0
    t32 = svc32._prepare_thumbnail(wsis[0])
    # float32 keeps the reference-exact size (1013x757 @ mag20, power 1.25
    # -> ds 16 -> round(1013/16) x round(757/16), capped at 1024)
    assert (t32.width, t32.height) == (round(1013 / 16), round(757 / 16))

    monkeypatch.setenv("ATLASPATCH_HOST_RESIZE", "1")
    assert make_service("bfloat16")._thumb_quant() == 0
    monkeypatch.delenv("ATLASPATCH_HOST_RESIZE", raising=False)
    monkeypatch.setenv("ATLASPATCH_THUMB_QUANT", "0")
    assert make_service("bfloat16")._thumb_quant() == 0
    monkeypatch.delenv("ATLASPATCH_THUMB_QUANT", raising=False)

    # masks come back at the quantized thumbnail shapes and stay valid
    masks = svc.segment_thumbnails(thumbs)
    for m, t in zip(masks, thumbs):
        assert m.data.shape == (t.height, t.width)
        assert np.isfinite(m.data).all()


def test_duplicate_stems_fail_loudly(tmp_path):
    """Recursive discovery of two slides with the same filename stem must
    raise (flat patches/<stem>.h5 layout would silently cross-label them)."""
    import numpy as np
    import pytest
    from PIL import Image

    from atlaspatch_tpu.orchestration.runner import ProcessingRunner

    for sub in ("a", "b"):
        d = tmp_path / sub
        d.mkdir()
        Image.fromarray(np.full((64, 64, 3), 200, np.uint8)).save(d / "slide.png")

    cfg = AppConfig(
        processing=ProcessingConfig(input_path=tmp_path, recursive=True),
        segmentation=SegmentationConfig(device="cpu"),
        extraction=ExtractionConfig(patch_size=64, target_magnification=20),
        output=OutputConfig(output_root=tmp_path / "out"),
    )
    runner = ProcessingRunner.__new__(ProcessingRunner)  # discovery needs only config
    runner.config = cfg
    with pytest.raises(ValueError, match="stems collide"):
        runner.discover_slides()
