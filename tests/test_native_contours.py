"""Native Suzuki contour tracer: bit-exact parity with cv2.findContours
(RETR_CCOMP, CHAIN_APPROX_NONE) — contours, point order, and parents."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
native = pytest.importorskip("atlaspatch_tpu.io.native")

from atlaspatch_tpu.io.native import native_find_contours  # noqa: E402
from atlaspatch_tpu.ops.contours import find_contours_ccomp, mask_to_contours  # noqa: E402


def _assert_match(m255):
    cv_c, cv_h = cv2.findContours(m255, cv2.RETR_CCOMP, cv2.CHAIN_APPROX_NONE)
    nat = native_find_contours(m255)
    assert nat is not None, "native library unavailable"
    nat_c, nat_p = nat
    cv_p = (
        np.asarray(cv_h).reshape(-1, 4)[:, 3]
        if cv_h is not None
        else np.empty(0, np.int64)
    )
    assert len(cv_c) == len(nat_c)
    np.testing.assert_array_equal(cv_p, nat_p)
    for a, b in zip(cv_c, nat_c):
        np.testing.assert_array_equal(a, b)


def test_exact_parity_random_masks(rng):
    for trial in range(60):
        size = int(rng.integers(5, 120))
        mask = (rng.random((size, size)) > rng.uniform(0.3, 0.8)).astype(np.uint8)
        if trial % 3 == 0:
            mask = cv2.morphologyEx(mask, cv2.MORPH_CLOSE, np.ones((3, 3), np.uint8))
        _assert_match(mask * 255)


def test_degenerate_masks():
    _assert_match(np.zeros((10, 10), np.uint8))
    _assert_match(np.full((10, 10), 255, np.uint8))
    m = np.zeros((7, 7), np.uint8)
    m[3, 3] = 255  # isolated pixel
    _assert_match(m)
    m2 = np.full((9, 9), 255, np.uint8)
    m2[3:6, 3:6] = 0
    m2[4, 4] = 255  # island inside hole (nested outer → top-level in CCOMP)
    _assert_match(m2)


def test_tissue_like_masks(rng):
    yy, xx = np.mgrid[0:96, 0:128]
    mask = np.zeros((96, 128), np.float32)
    for seed in range(4):
        r = np.random.default_rng(seed)
        for _ in range(3):
            cx, cy = r.uniform(10, 118), r.uniform(10, 86)
            rx, ry = r.uniform(8, 40), r.uniform(8, 30)
            mask[((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2 < 1] = 1
        for _ in range(2):
            cx, cy = r.uniform(20, 100), r.uniform(20, 70)
            rr = r.uniform(3, 8)
            mask[((xx - cx) ** 2 + (yy - cy) ** 2) < rr**2] = 0
        _assert_match((mask > 0.5).astype(np.uint8) * 255)


def test_find_contours_ccomp_uses_native(rng):
    """The ops-layer entry point routes through the native tracer and agrees
    with cv2 fallback output."""
    mask = (rng.random((64, 64)) > 0.6).astype(np.uint8) * 255
    contours, parents = find_contours_ccomp(mask)
    cv_c, cv_h = cv2.findContours(mask, cv2.RETR_CCOMP, cv2.CHAIN_APPROX_NONE)
    assert len(contours) == len(cv_c)
    for a, b in zip(contours, cv_c):
        np.testing.assert_array_equal(a, b)


def test_mask_to_contours_native_matches_cv2_path(rng, monkeypatch):
    mask = (rng.random((80, 80)) > 0.55).astype(np.float32)
    tissue_n, holes_n = mask_to_contours(mask, tissue_area_thresh=0.001)

    # Force the cv2 fallback and compare outputs
    def no_native(m):
        return None

    monkeypatch.setattr("atlaspatch_tpu.io.native.native_find_contours", no_native)
    tissue_c, holes_c = mask_to_contours(mask, tissue_area_thresh=0.001)
    assert len(tissue_n) == len(tissue_c)
    for a, b in zip(tissue_n, tissue_c):
        np.testing.assert_array_equal(a, b)
    assert len(holes_n) == len(holes_c)
    for ha, hb in zip(holes_n, holes_c):
        assert len(ha) == len(hb)
        for a, b in zip(ha, hb):
            np.testing.assert_array_equal(a, b)
