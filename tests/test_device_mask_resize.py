"""On-device mask NEAREST-resample parity (D2H byte reduction, r2).

The packed thumbnail-sized masks produced by segment_step_packed_to_shape
must be bit-identical to: full-res device mask → host unpack → PIL NEAREST
resize — the reference's mask chain (segmentation.py:112-118).
"""

from __future__ import annotations

import numpy as np
import pytest
from PIL import Image

from atlaspatch_tpu.models.sam2.model import pil_nearest_index


@pytest.mark.parametrize("n_in,n_out", [(1024, 192), (1024, 255), (1024, 1024), (512, 96), (96, 512), (100, 37)])
def test_pil_nearest_index_matches_pil(n_in, n_out, rng):
    src = (rng.random((n_in, n_in)) > 0.5).astype(np.uint8) * 255
    pil = np.asarray(
        Image.fromarray(src, mode="L").resize((n_out, n_out), Image.Resampling.NEAREST)
    )
    idx = pil_nearest_index(n_out, n_in)
    np.testing.assert_array_equal(src[idx[:, None], idx[None, :]], pil)


def test_pil_nearest_index_fuzz(rng):
    for _ in range(60):
        n_in = int(rng.integers(3, 1400))
        n_out = int(rng.integers(1, 2 * n_in))
        src = (rng.random((4, n_in)) > 0.5).astype(np.uint8) * 255
        pil = np.asarray(
            Image.fromarray(src, mode="L").resize((n_out, 4), Image.Resampling.NEAREST)
        )
        idx = pil_nearest_index(n_out, n_in)
        np.testing.assert_array_equal(src[:, idx], pil, err_msg=f"{n_in}->{n_out}")


def test_grouped_device_mask_resize_matches_host_chain(monkeypatch, tmp_path):
    """Full predictor path: device-resized masks == 1024² masks + host PIL
    NEAREST, via the public grouped API on both code paths."""
    from atlaspatch_tpu.core.config import SegmentationConfig
    from atlaspatch_tpu.models.sam2.config import SAM2Config
    from atlaspatch_tpu.services.segmentation import SAM2Predictor

    monkeypatch.setenv("ATLASPATCH_ALLOW_RANDOM_WEIGHTS", "1")
    monkeypatch.setenv("HF_HOME", str(tmp_path / "empty-hf"))
    cfg = SAM2Config.test_tiny()
    pred = SAM2Predictor(SegmentationConfig(device="cpu"), cfg)
    rng = np.random.default_rng(0)
    # two shape groups, odd target widths (exercise byte padding/slicing)
    arrs = [
        rng.integers(0, 255, (24, 31, 3), dtype=np.uint8),
        rng.integers(0, 255, (24, 31, 3), dtype=np.uint8),
        rng.integers(0, 255, (17, 23, 3), dtype=np.uint8),
    ]
    targets = [(24, 31), (24, 31), (17, 23)]

    small = pred.predict_masks_grouped_async(arrs, targets=targets)()
    full = pred.predict_masks_grouped_async(arrs)()  # legacy 1024²-equivalent path

    for got, ref_full, (h, w) in zip(small, full, targets):
        assert got.shape == (h, w)
        want = np.asarray(
            Image.fromarray((ref_full * 255).astype(np.uint8), mode="L").resize(
                (w, h), Image.Resampling.NEAREST
            )
        ) // 255
        np.testing.assert_array_equal(got, want)


def test_device_mask_resize_env_off(monkeypatch, tmp_path):
    from atlaspatch_tpu.core.config import SegmentationConfig
    from atlaspatch_tpu.models.sam2.config import SAM2Config
    from atlaspatch_tpu.services.segmentation import SAM2Predictor

    monkeypatch.setenv("ATLASPATCH_ALLOW_RANDOM_WEIGHTS", "1")
    monkeypatch.setenv("HF_HOME", str(tmp_path / "empty-hf"))
    monkeypatch.setenv("ATLASPATCH_DEVICE_MASK_RESIZE", "0")
    cfg = SAM2Config.test_tiny()
    pred = SAM2Predictor(SegmentationConfig(device="cpu"), cfg)
    rng = np.random.default_rng(0)
    arrs = [rng.integers(0, 255, (24, 31, 3), dtype=np.uint8)]
    masks = pred.predict_masks_grouped_async(arrs, targets=[(24, 31)])()
    # env off ⇒ full-model-size masks come back (service resizes on host)
    assert masks[0].shape == (cfg.image_size, cfg.image_size)


def test_mesh_device_mask_resize_matches_single(monkeypatch, tmp_path):
    """8-device DP serving with on-device mask resample == single-device."""
    import jax
    from jax.sharding import Mesh

    from atlaspatch_tpu.core.config import SegmentationConfig
    from atlaspatch_tpu.models.sam2.config import SAM2Config
    from atlaspatch_tpu.services.segmentation import SAM2Predictor

    monkeypatch.setenv("ATLASPATCH_ALLOW_RANDOM_WEIGHTS", "1")
    monkeypatch.setenv("HF_HOME", str(tmp_path / "empty-hf"))
    cfg = SAM2Config.test_tiny()
    devices = np.asarray(jax.devices()[:8]).reshape(8)
    mesh = Mesh(devices, axis_names=("data",))

    rng = np.random.default_rng(0)
    arrs = [rng.integers(0, 255, (24, 31, 3), dtype=np.uint8) for _ in range(8)]
    targets = [(24, 31)] * 8

    single = SAM2Predictor(SegmentationConfig(device="cpu"), cfg)
    want = single.predict_masks_grouped_async(arrs, targets=targets)()

    sharded = SAM2Predictor(SegmentationConfig(device="cpu"), cfg, mesh=mesh)
    got = sharded.predict_masks_grouped_async(arrs, targets=targets)()

    for g, w in zip(got, want):
        assert g.shape == (24, 31)
        np.testing.assert_array_equal(g, w)
