"""Exact-parity tests for the vectorized polygon ops against cv2."""

import numpy as np
import pytest

from atlaspatch_tpu.ops.polygon import (
    bounding_rect,
    contour_area,
    point_polygon_test,
)

cv2 = pytest.importorskip("cv2")


def _random_polygon(rng, n_pts=12, scale=100):
    # random simple-ish polygon: random points sorted by angle around centroid
    pts = rng.integers(0, scale, size=(n_pts, 2)).astype(np.int64)
    c = pts.mean(axis=0)
    ang = np.arctan2(pts[:, 1] - c[1], pts[:, 0] - c[0])
    return pts[np.argsort(ang)].astype(np.int32)


def _mask_contours(rng, size=64):
    mask = (rng.random((size, size)) > 0.6).astype(np.uint8)
    mask = cv2.morphologyEx(mask, cv2.MORPH_CLOSE, np.ones((5, 5), np.uint8))
    contours, _ = cv2.findContours(mask * 255, cv2.RETR_CCOMP, cv2.CHAIN_APPROX_NONE)
    return [c for c in contours if len(c) >= 3]


def test_point_polygon_test_matches_cv2_random_polygons(rng):
    for trial in range(20):
        poly = _random_polygon(rng, n_pts=rng.integers(3, 20))
        pts = rng.integers(-10, 110, size=(200, 2)).astype(np.int64)
        # include polygon vertices and edge midpoints (boundary cases)
        pts = np.vstack([pts, poly, (poly + np.roll(poly, 1, 0)) // 2])
        got = point_polygon_test(poly, pts)
        want = np.array(
            [
                int(cv2.pointPolygonTest(poly.reshape(-1, 1, 2), (int(x), int(y)), False))
                for x, y in pts
            ],
            dtype=np.int8,
        )
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")


def test_point_polygon_test_matches_cv2_real_contours(rng):
    for trial in range(5):
        for cont in _mask_contours(rng):
            pts = rng.integers(-5, 70, size=(150, 2)).astype(np.int64)
            pts = np.vstack([pts, cont.reshape(-1, 2)[:20]])
            got = point_polygon_test(cont, pts)
            want = np.array(
                [int(cv2.pointPolygonTest(cont, (int(x), int(y)), False)) for x, y in pts],
                dtype=np.int8,
            )
            np.testing.assert_array_equal(got, want)


def test_point_polygon_test_scaled_contours(rng):
    # extraction uses contours scaled to level-0 coords (large values)
    for cont in _mask_contours(rng)[:3]:
        scaled = (cont.reshape(-1, 2).astype(np.float32) * 37.5).astype(np.int32)
        pts = rng.integers(0, 3000, size=(100, 2)).astype(np.int64)
        got = point_polygon_test(scaled, pts)
        want = np.array(
            [
                int(cv2.pointPolygonTest(scaled.reshape(-1, 1, 2), (int(x), int(y)), False))
                for x, y in pts
            ],
            dtype=np.int8,
        )
        np.testing.assert_array_equal(got, want)


def test_contour_area_matches_cv2(rng):
    for trial in range(10):
        poly = _random_polygon(rng)
        assert contour_area(poly) == cv2.contourArea(poly.reshape(-1, 1, 2))
    for cont in _mask_contours(rng):
        assert contour_area(cont) == cv2.contourArea(cont)


def test_bounding_rect_matches_cv2(rng):
    for trial in range(10):
        poly = _random_polygon(rng)
        assert bounding_rect(poly) == cv2.boundingRect(poly.reshape(-1, 1, 2))
