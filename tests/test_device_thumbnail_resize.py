"""Device-side thumbnail upscaling: interpolate_torch bilinear matches PIL's
BILINEAR upscale within uint8 rounding, and the grouped device path produces
masks in agreement with the host-resize path."""


import numpy as np
from PIL import Image

import jax.numpy as jnp

from atlaspatch_tpu.models.sam2.interp import interpolate_torch


def test_upscale_matches_pil_bilinear(rng):
    for h, w in ((192, 256), (100, 130), (512, 384)):
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        pil = np.asarray(
            Image.fromarray(img).resize((1024, 1024), Image.Resampling.BILINEAR),
            dtype=np.float32,
        )
        dev = np.asarray(
            interpolate_torch(jnp.asarray(img[None], jnp.float32), (1024, 1024), "bilinear")[0]
        )
        # PIL rounds to uint8; the device path stays float — agree within 1 level
        diff = np.abs(dev - pil)
        assert diff.max() <= 1.0 + 1e-3, diff.max()  # pure uint8 rounding
        assert diff.mean() < 0.5


def test_grouped_device_path_agrees_with_host_resize(rng, monkeypatch):
    from atlaspatch_tpu.core.config import SegmentationConfig
    from atlaspatch_tpu.models.sam2.config import SAM2Config
    from atlaspatch_tpu.services.segmentation import SAM2SegmentationService

    monkeypatch.setenv("ATLASPATCH_ALLOW_RANDOM_WEIGHTS", "1")
    cfg = SegmentationConfig(device="cpu", batch_size=2)
    svc = SAM2SegmentationService(cfg, sam2_cfg=SAM2Config.test_tiny())

    thumbs = [
        Image.fromarray(rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)),
        Image.fromarray(rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)),  # distinct shape
        Image.fromarray(rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)),
    ]

    device_masks = svc.segment_thumbnails_async(thumbs)()
    monkeypatch.setenv("ATLASPATCH_HOST_RESIZE", "1")
    host_masks = svc.segment_thumbnails_async(thumbs)()

    for dm, hm in zip(device_masks, host_masks):
        assert dm.data.shape == hm.data.shape
        agreement = (dm.data == hm.data).mean()
        # random weights → noisy logits near 0; resize chains differ by uint8
        # rounding, so demand high-but-not-perfect pixel agreement
        assert agreement > 0.95, agreement
