"""Batched on-device patch content filters.

Device-side counterpart of utils/image.py (reference: atlas_patch/utils/
image.py:7-38): evaluates the black/white heuristics for a whole patch batch
as fused integer reductions — one program, no per-patch Python. Uses the same
OpenCV fixed-point arithmetic, so decisions are bit-identical to the host path
(and to cv2), verified in tests.

Used by the embedding/extraction device path when patches are already on
device; the host path keeps utils/image.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from atlaspatch_tpu.utils.image import _GRAY_SHIFT, _HSV_SHIFT, _R2Y, _G2Y, _B2Y, _SDIV_TABLE


def gray_u8(batch_u8: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, 3) uint8 → (N, H, W) uint8 gray, OpenCV integer rounding."""
    p = batch_u8.astype(jnp.int32)
    y = (
        p[..., 0] * _R2Y + p[..., 1] * _G2Y + p[..., 2] * _B2Y + (1 << (_GRAY_SHIFT - 1))
    ) >> _GRAY_SHIFT
    return y.astype(jnp.uint8)


def sat_val_u8(batch_u8: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(N, H, W, 3) uint8 → (saturation, value) uint8 channels of cv2 HSV."""
    p = batch_u8.astype(jnp.int32)
    v = p.max(axis=-1)
    vmin = p.min(axis=-1)
    diff = v - vmin
    table = jnp.asarray(_SDIV_TABLE, dtype=jnp.int64)
    s = (diff.astype(jnp.int64) * table[v] + (1 << (_HSV_SHIFT - 1))) >> _HSV_SHIFT
    return s.astype(jnp.uint8), v.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("rgb_thresh", "sat_thresh", "value_thresh", "min_fraction"))
def content_filter_mask(
    batch_u8: jnp.ndarray,
    *,
    rgb_thresh: int = 40,  # defaults mirror utils.image.is_black_patch /
    sat_thresh: int = 5,  # is_white_patch so both paths decide identically
    value_thresh: int = 200,
    min_fraction: float = 0.7,
) -> jnp.ndarray:
    """(N, H, W, 3) uint8 → (N,) bool KEEP mask (not black and not white)."""
    n_pix = batch_u8.shape[1] * batch_u8.shape[2]
    gray = gray_u8(batch_u8)
    black_frac = (gray < rgb_thresh).sum(axis=(1, 2)) / n_pix
    s, v = sat_val_u8(batch_u8)
    white_frac = ((s < sat_thresh) & (v >= value_thresh)).sum(axis=(1, 2)) / n_pix
    return (black_frac < min_fraction) & (white_frac < min_fraction)


def content_filter_mask_host(batch_u8: np.ndarray, **kw) -> np.ndarray:
    return np.asarray(content_filter_mask(jnp.asarray(batch_u8), **kw))
