"""Black/white patch filter parity against OpenCV's integer arithmetic.

cv2 serves as the golden oracle here; the production path (utils/image.py,
ops/filters.py) must match it bit-exactly because filter decisions change the
emitted coordinate set in --no-fast-mode runs.
"""

import numpy as np
import pytest

from atlaspatch_tpu.utils.image import (
    is_black_patch,
    is_white_patch,
    rgb_to_gray_u8,
    rgb_to_sat_val_u8,
)

cv2 = pytest.importorskip("cv2")


def _random_patches(rng, n=8, size=64):
    out = [rng.integers(0, 256, size=(size, size, 3), dtype=np.uint8) for _ in range(n)]
    # structured extremes
    out.append(np.zeros((size, size, 3), dtype=np.uint8))
    out.append(np.full((size, size, 3), 255, dtype=np.uint8))
    out.append(np.full((size, size, 3), 10, dtype=np.uint8))
    grad = np.linspace(0, 255, size, dtype=np.uint8)
    out.append(np.stack(np.broadcast_arrays(grad[None, :], grad[:, None], grad[None, :]), -1))
    return out


def test_gray_matches_cv2(rng):
    for patch in _random_patches(rng):
        expected = cv2.cvtColor(patch, cv2.COLOR_RGB2GRAY)
        np.testing.assert_array_equal(rgb_to_gray_u8(patch), expected)


def test_sat_val_match_cv2(rng):
    for patch in _random_patches(rng):
        hsv = cv2.cvtColor(patch, cv2.COLOR_RGB2HSV)
        s, v = rgb_to_sat_val_u8(patch)
        np.testing.assert_array_equal(s, hsv[:, :, 1])
        np.testing.assert_array_equal(v, hsv[:, :, 2])


def _cv2_is_black(patch, rgb_thresh=40, min_fraction=0.7):
    gray = cv2.cvtColor(patch, cv2.COLOR_RGB2GRAY)
    return bool(float((gray < rgb_thresh).mean()) >= min_fraction)


def _cv2_is_white(patch, sat_thresh=5, min_fraction=0.7, value_thresh=200):
    hsv = cv2.cvtColor(patch, cv2.COLOR_RGB2HSV)
    mask = (hsv[:, :, 1] < sat_thresh) & (hsv[:, :, 2] >= value_thresh)
    return bool(float(mask.mean()) >= min_fraction)


def test_filters_match_cv2_reference_impl(rng):
    for patch in _random_patches(rng, n=16):
        for thresh in (5, 40, 50, 128):
            assert is_black_patch(patch, rgb_thresh=thresh) == _cv2_is_black(patch, thresh)
        for sat in (5, 15, 50):
            assert is_white_patch(patch, sat_thresh=sat) == _cv2_is_white(patch, sat)


def test_white_patch_detects_white():
    white = np.full((32, 32, 3), 250, dtype=np.uint8)
    assert is_white_patch(white)
    pink = np.zeros((32, 32, 3), dtype=np.uint8)
    pink[..., 0] = 255
    pink[..., 1] = 100
    pink[..., 2] = 180
    assert not is_white_patch(pink)


def test_black_patch_detects_black():
    assert is_black_patch(np.zeros((32, 32, 3), dtype=np.uint8), rgb_thresh=50)
    assert not is_black_patch(np.full((32, 32, 3), 200, dtype=np.uint8), rgb_thresh=50)
