"""Vectorized point-in-polygon with OpenCV-exact semantics.

The reference tests patch-grid probes one point at a time through
cv2.pointPolygonTest inside a nested Python loop (reference:
atlas_patch/services/extraction.py:83-128, utils/contours.py:22-38) — the
extraction hot loop. Here the same exact integer crossing-number algorithm
(including the on-edge → 0 convention) is evaluated for *all* grid probes
against *all* polygon edges as one batched computation, in numpy on host or
jnp on device. Results are bit-identical to cv2 for integer polygons/points
(verified in tests), so emitted coordinates match the reference exactly.

Algorithm (OpenCV pointPolygonTest, measureDist=False, integer branch):
for each directed edge v0→v of the closed polygon, an edge is "counted" for
point P unless both endpoints are on the same side of P's horizontal line or
strictly left of P. For counted edges the cross product sign decides the
crossing parity; a zero cross product or the explicit horizontal-edge test
means P lies on the boundary (result 0). Odd crossings ⇒ inside (+1), even ⇒
outside (−1).
"""

from __future__ import annotations

import numpy as np


def _prep(polygon: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    poly = np.asarray(polygon, dtype=np.int64).reshape(-1, 2)
    v = poly
    v0 = np.roll(poly, 1, axis=0)
    return v0, v


def point_polygon_test(polygon: np.ndarray, points: np.ndarray) -> np.ndarray:
    """Batched cv2.pointPolygonTest(..., measureDist=False).

    Args:
      polygon: (N, 2) integer vertices (x, y); OpenCV contours of shape
        (N, 1, 2) are accepted and squeezed.
      points: (M, 2) integer probe points.

    Returns:
      (M,) int8 array: +1 inside, 0 on boundary, -1 outside.

    Prefers the native C++ scan (io/native/atlas_contours.cc) — the numpy
    path below is bit-identical and serves as both fallback and test oracle.
    """
    if np.asarray(polygon).size == 0:
        # degenerate polygon: everything is outside (the numpy path computes
        # zero crossings; the native scan would reject the empty buffer)
        m = np.asarray(points).reshape(-1, 2).shape[0]
        return np.full(m, -1, dtype=np.int8)
    try:
        from atlaspatch_tpu.io.native import native_points_polygon_test

        out = native_points_polygon_test(polygon, points)
        if out is not None:
            return out
    except ImportError:
        pass
    return point_polygon_test_numpy(polygon, points)


def point_polygon_test_numpy(polygon: np.ndarray, points: np.ndarray) -> np.ndarray:
    """Pure-numpy reference implementation (see point_polygon_test)."""
    v0, v = _prep(polygon)
    pts = np.asarray(points, dtype=np.int64).reshape(-1, 2)
    px = pts[:, 0][:, None]  # (M,1)
    py = pts[:, 1][:, None]

    v0x, v0y = v0[:, 0][None, :], v0[:, 1][None, :]  # (1,N)
    vx, vy = v[:, 0][None, :], v[:, 1][None, :]

    # Edge skipped when both endpoints on same side of the horizontal line,
    # or both strictly left of the point.
    skip = (
        ((v0y <= py) & (vy <= py))
        | ((v0y > py) & (vy > py))
        | ((v0x < px) & (vx < px))
    )

    # On-boundary test that applies even to skipped edges: P coincides with a
    # vertex, or P lies on a horizontal edge at its own y.
    on_vertex = (py == vy) & (px == vx)
    on_horiz = (
        (py == vy)
        & (py == v0y)
        & (((v0x <= px) & (px <= vx)) | ((vx <= px) & (px <= v0x)))
    )
    boundary = on_vertex | on_horiz

    dist = (py - v0y) * (vx - v0x) - (px - v0x) * (vy - v0y)
    dist_signed = np.where(vy < v0y, -dist, dist)

    counted = ~skip
    boundary |= counted & (dist == 0)
    crossings = (counted & (dist_signed > 0)).sum(axis=1)

    on_edge = boundary.any(axis=1)
    inside = (crossings % 2) == 1
    return np.where(on_edge, 0, np.where(inside, 1, -1)).astype(np.int8)


def points_in_any_polygon(
    polygons: list[np.ndarray], points: np.ndarray, *, include_boundary: bool = True
) -> np.ndarray:
    """(M,) bool: point is inside (or on, when include_boundary) any polygon."""
    pts = np.asarray(points, dtype=np.int64).reshape(-1, 2)
    out = np.zeros(pts.shape[0], dtype=bool)
    thresh = 0 if include_boundary else 1
    for poly in polygons:
        out |= point_polygon_test(poly, pts) >= thresh
    return out


def contour_area(polygon: np.ndarray) -> float:
    """cv2.contourArea parity: |shoelace| / 2 over the closed integer polygon."""
    poly = np.asarray(polygon, dtype=np.int64).reshape(-1, 2)
    if poly.shape[0] < 3:
        return 0.0
    x, y = poly[:, 0], poly[:, 1]
    x1, y1 = np.roll(x, -1), np.roll(y, -1)
    return float(abs(int(np.sum(x * y1 - x1 * y)))) / 2.0


def bounding_rect(polygon: np.ndarray) -> tuple[int, int, int, int]:
    """cv2.boundingRect parity: (x, y, w, h) with inclusive max + 1."""
    poly = np.asarray(polygon, dtype=np.int64).reshape(-1, 2)
    x0, y0 = poly.min(axis=0)
    x1, y1 = poly.max(axis=0)
    return int(x0), int(y0), int(x1 - x0 + 1), int(y1 - y0 + 1)
