"""Image-backend (plain PNG/JPEG/...) round-trips for every advertised extension."""

import numpy as np
import pytest


@pytest.mark.parametrize("ext,kwargs,exact", [
    (".png", {}, True),
    (".bmp", {}, True),
    (".webp", {"lossless": True}, True),
    (".gif", {}, True),          # palette-quantized source (<=256 colors)
    (".jpg", {"quality": 95}, False),
    (".jpeg", {"quality": 95}, False),
])
def test_image_backend_all_advertised_extensions(tmp_path, ext, kwargs, exact):
    """Every extension the factory maps to the image backend loads, reports
    the user MPP, and serves pixel-correct regions (bit-exact for lossless
    codecs; loose for JPEG)."""
    from PIL import Image

    from atlaspatch_tpu.io.factory import WSIFactory
    from atlaspatch_tpu.io.image_wsi import ImageWSI

    rng = np.random.default_rng(81)
    if ext == ".gif":  # stay within one 256-color palette frame
        base = rng.integers(0, 8, (96, 128), np.uint8) * 32
        img = np.stack([base, base // 2, 255 - base], axis=-1)
    elif exact:
        img = rng.integers(0, 255, (96, 128, 3), np.uint8)
    else:  # JPEG: smooth content, noise is not a fair lossy-codec input
        yy, xx = np.mgrid[0:96, 0:128]
        img = np.stack(
            [
                (128 + 100 * np.sin(xx / 19.0)),
                (128 + 100 * np.cos(yy / 23.0)),
                ((xx + yy) % 256) // 2 + 64,
            ],
            axis=-1,
        ).astype(np.uint8)
    path = tmp_path / f"slide{ext}"
    Image.fromarray(img).save(path, **kwargs)

    wsi = WSIFactory.load(str(path), mpp=0.5)
    assert isinstance(wsi, ImageWSI)
    wsi._ensure_loaded()
    assert (wsi.w, wsi.h) == (128, 96)
    assert wsi.mpp == 0.5
    out = np.asarray(wsi.extract((20, 10), 0, (60, 40), mode="array"))
    if exact:
        np.testing.assert_array_equal(out, img[10:50, 20:80])
    else:
        assert np.abs(out.astype(int) - img[10:50, 20:80].astype(int)).mean() < 12
    thumb = wsi.get_thumb((32, 32))
    assert max(thumb.size) <= 32
    wsi.cleanup()
