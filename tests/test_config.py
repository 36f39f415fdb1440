from pathlib import Path

import pytest

from atlaspatch_tpu.core.config import (
    AppConfig,
    ExtractionConfig,
    FeatureExtractionConfig,
    OutputConfig,
    ProcessingConfig,
    SegmentationConfig,
    VisualizationConfig,
    normalize_device,
)


def test_normalize_device_accepts_tpu_cpu_and_cuda_alias():
    assert normalize_device("cpu") == "cpu"
    assert normalize_device("tpu") == "tpu"
    assert normalize_device("TPU:1") == "tpu:1"
    assert normalize_device("cuda") == "tpu"
    assert normalize_device("cuda:0") == "tpu:0"
    assert normalize_device("gpu") == "tpu"


def test_normalize_device_rejects_garbage():
    with pytest.raises(ValueError):
        normalize_device("mps")
    with pytest.raises(ValueError):
        normalize_device("cuda:abc")


def test_extraction_config_defaults_and_validation():
    cfg = ExtractionConfig(patch_size=256, target_magnification=20).validated()
    assert cfg.step_size == 256
    assert cfg.max_open_slides == 200
    assert cfg.write_batch == 8192
    assert cfg.fast_mode is True

    with pytest.raises(ValueError):
        ExtractionConfig(patch_size=0, target_magnification=20).validated()
    with pytest.raises(ValueError):
        ExtractionConfig(patch_size=256, target_magnification=20, tissue_threshold=2.0).validated()


def test_feature_config_validation(tmp_path: Path):
    with pytest.raises(ValueError):
        FeatureExtractionConfig(extractors=[]).validated()
    cfg = FeatureExtractionConfig(extractors=["resnet50"], precision="BFLOAT16").validated()
    assert cfg.precision == "bfloat16"
    cfg = FeatureExtractionConfig(extractors=["resnet50"], precision="INT8").validated()
    assert cfg.precision == "int8"  # W8A8 serving mode
    with pytest.raises(ValueError):
        FeatureExtractionConfig(extractors=["x"], precision="int4").validated()
    with pytest.raises(FileNotFoundError):
        FeatureExtractionConfig(
            extractors=["x"], plugins=[tmp_path / "missing.py"]
        ).validated()


def test_app_config_roundtrip(tmp_path: Path):
    (tmp_path / "in").mkdir()
    cfg = AppConfig(
        processing=ProcessingConfig(input_path=tmp_path / "in"),
        segmentation=SegmentationConfig(device="cpu"),
        extraction=ExtractionConfig(patch_size=256, target_magnification=20),
        output=OutputConfig(output_root=tmp_path / "out"),
        visualization=VisualizationConfig(),
        device="cpu",
    ).validated()
    assert (tmp_path / "out").is_dir()
    assert cfg.segmentation.batch_size == 1
    assert cfg.segmentation.thumbnail_power == 1.25
    assert cfg.segmentation.thumbnail_max == 1024


def test_none_required_values_rejected(tmp_path: Path):
    """None for a mandatory value must fail AT the validation boundary, not
    later with an opaque error deep in discovery/segmentation."""
    with pytest.raises(ValueError, match="Input path is required"):
        ProcessingConfig(input_path=None).validated()
    # optional paths still skip cleanly when None
    (tmp_path / "in").mkdir()
    ProcessingConfig(input_path=tmp_path / "in", mpp_csv=None).validated()

    with pytest.raises(ValueError, match="segmentation config is required"):
        AppConfig(
            processing=ProcessingConfig(input_path=tmp_path / "in"),
            segmentation=None,
            extraction=ExtractionConfig(patch_size=256, target_magnification=20),
            output=OutputConfig(output_root=tmp_path / "out"),
            device="cpu",
        ).validated()
    # features is the one genuinely optional section
    AppConfig(
        processing=ProcessingConfig(input_path=tmp_path / "in"),
        segmentation=SegmentationConfig(device="cpu"),
        extraction=ExtractionConfig(patch_size=256, target_magnification=20),
        output=OutputConfig(output_root=tmp_path / "out"),
        features=None,
        device="cpu",
    ).validated()
