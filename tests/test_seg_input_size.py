"""Configurable SAM2 inference resolution (SegmentationConfig.input_size).

The reference hardcodes 1024 (atlas_patch/services/segmentation.py:25-237);
thumbnails are at most 1024px, so a lower square size runs the trunk on the
same source pixels with quadratically less MXU work. hiera's pos-embeds
interpolate from the 7x7 background grid at trace time and no parameter
shape involves image_size, so any checkpoint loads at any multiple of 32.
"""

from __future__ import annotations

import numpy as np
import pytest

from atlaspatch_tpu.core.config import SegmentationConfig
from atlaspatch_tpu.models.sam2.config import SAM2Config
from atlaspatch_tpu.services.segmentation import SAM2Predictor


def test_input_size_validation():
    assert SegmentationConfig(input_size=512).validated().input_size == 512
    assert SegmentationConfig().validated().input_size is None
    for bad in (100, 0, -32, 33):
        with pytest.raises(ValueError, match="multiple of 32"):
            SegmentationConfig(input_size=bad).validated()


def test_incompatible_size_raises_clear_error(monkeypatch, tmp_path):
    """Some (window spec, size) pairs cannot tile the stage-transition
    window math (a constraint inherited faithfully from the upstream SAM2
    trunk — torch fails the same way on a bad view). The predictor must turn
    that into an actionable ValueError, not a mid-trace reshape crash."""
    # Shipped hiera-tiny spec: validated sizes pass ...
    for ok in (1024, 768, 512):
        SAM2Config.tiny().validate_input_size(ok)
    # ... the test spec (windows 4,2,7,4 at image 128) works at small sizes
    SAM2Config.test_tiny().validate_input_size(64)
    SAM2Config.test_tiny().validate_input_size(256)
    # but its stage-3 transition (window 7 -> 3 under q-pool) cannot tile 768
    with pytest.raises(ValueError, match="window counts differ"):
        SAM2Config.test_tiny().validate_input_size(768)

    monkeypatch.setenv("ATLASPATCH_ALLOW_RANDOM_WEIGHTS", "1")
    monkeypatch.setenv("HF_HOME", str(tmp_path / "empty-hf"))
    with pytest.raises(ValueError, match="incompatible"):
        SAM2Predictor(
            SegmentationConfig(device="cpu", input_size=768).validated(),
            SAM2Config.test_tiny(),
        )


def test_preset_size_falls_back_to_native(monkeypatch, tmp_path, caplog):
    """A size chosen by the --fast preset (input_size_preset=True) must not
    hard-fail an architecture whose window spec cannot tile it — fall back to
    the native size with a log line; explicit sizes still raise (test above)."""
    import logging

    monkeypatch.setenv("ATLASPATCH_ALLOW_RANDOM_WEIGHTS", "1")
    monkeypatch.setenv("HF_HOME", str(tmp_path / "empty-hf"))
    # target the service logger explicitly: an earlier CLI test may have left
    # the "atlaspatch_tpu" parent at WARNING via configure_logging(False)
    with caplog.at_level(logging.INFO, logger="atlaspatch_tpu.segmentation_service"):
        pred = SAM2Predictor(
            SegmentationConfig(
                device="cpu", input_size=768, input_size_preset=True
            ).validated(),
            SAM2Config.test_tiny(),
        )
    assert pred.input_size == 128  # the architecture's native size
    assert any("does not tile" in r.getMessage() for r in caplog.records)


def test_predictor_honors_input_size_override(monkeypatch, tmp_path):
    monkeypatch.setenv("ATLASPATCH_ALLOW_RANDOM_WEIGHTS", "1")
    monkeypatch.setenv("HF_HOME", str(tmp_path / "empty-hf"))
    cfg = SAM2Config.test_tiny()  # image_size 128, window0 4
    pred = SAM2Predictor(
        SegmentationConfig(device="cpu", input_size=64).validated(), cfg
    )
    assert pred.input_size == 64
    assert pred.sam2_cfg.image_size == 64

    rng = np.random.default_rng(0)
    thumbs = [
        rng.integers(0, 255, (48, 37, 3), dtype=np.uint8),
        rng.integers(0, 255, (21, 64, 3), dtype=np.uint8),
    ]
    masks = pred.predict_batch(thumbs)
    assert masks[0].shape == (48, 37)
    assert masks[1].shape == (21, 64)
    for m in masks:
        assert set(np.unique(m)).issubset({0.0, 1.0})


def test_shipped_tiny_spec_at_512(monkeypatch, tmp_path):
    """Pin the SHIPPED hiera-tiny window spec (8,4,14,7) at a lowered input
    size: its windows don't evenly divide the reduced grids, so this exercises
    the window-padding path the test_tiny() spec (4,2,7,4 at 128) never hits.
    (ADVICE r4: previously only verified manually.)"""
    monkeypatch.setenv("ATLASPATCH_ALLOW_RANDOM_WEIGHTS", "1")
    monkeypatch.setenv("HF_HOME", str(tmp_path / "empty-hf"))
    cfg = SAM2Config.tiny()  # image 1024, windows (8, 4, 14, 7)
    pred = SAM2Predictor(
        SegmentationConfig(device="cpu", input_size=512).validated(), cfg
    )
    assert pred.input_size == 512
    thumb = np.random.default_rng(2).integers(0, 255, (96, 128, 3), dtype=np.uint8)
    mask = pred.predict_image(thumb)
    assert mask.shape == (96, 128)
    assert set(np.unique(mask)).issubset({0.0, 1.0})


def test_same_params_load_at_any_size(monkeypatch, tmp_path):
    """A checkpoint's params are size-agnostic: the same tree must run at two
    different input sizes (pos-embeds interpolate at trace time)."""
    monkeypatch.setenv("ATLASPATCH_ALLOW_RANDOM_WEIGHTS", "1")
    monkeypatch.setenv("HF_HOME", str(tmp_path / "empty-hf"))
    cfg = SAM2Config.test_tiny()
    p128 = SAM2Predictor(SegmentationConfig(device="cpu"), cfg)
    p64 = SAM2Predictor(
        SegmentationConfig(device="cpu", input_size=64).validated(), cfg
    )
    p64.params = p128.params  # literally the same tree
    thumb = np.random.default_rng(1).integers(0, 255, (40, 40, 3), dtype=np.uint8)
    m = p64.predict_image(thumb)
    assert m.shape == (40, 40)
    assert np.isfinite(m).all()
