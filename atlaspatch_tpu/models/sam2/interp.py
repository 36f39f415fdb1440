"""Torch-semantics image interpolation as static einsum weights.

torch.nn.functional.interpolate(mode="bicubic"/"bilinear", align_corners=False)
uses half-pixel source mapping with border clamping; bicubic uses the cubic
convolution kernel with a = -0.75 (jax.image.resize uses a = -0.5, so it cannot
be used where parity with torch checkpopo-processing matters). Since all shapes
here are static, the 1-D interpolation weights are precomputed with numpy at
trace time and applied as two dense contractions — MXU-friendly and exact.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    w = np.where(
        ax <= 1,
        (a + 2) * ax3 - (a + 3) * ax2 + 1,
        np.where(ax < 2, a * ax3 - 5 * a * ax2 + 8 * a * ax - 4 * a, 0.0),
    )
    return w


def _interp_weights_1d(in_size: int, out_size: int, mode: str) -> np.ndarray:
    """(out_size, in_size) dense weight matrix for torch interpolate (no antialias)."""
    scale = in_size / out_size
    src = (np.arange(out_size) + 0.5) * scale - 0.5
    W = np.zeros((out_size, in_size), dtype=np.float64)
    if mode == "bilinear":
        i0 = np.floor(src).astype(np.int64)
        frac = src - i0
        for tap, weight in ((i0, 1 - frac), (i0 + 1, frac)):
            idx = np.clip(tap, 0, in_size - 1)
            np.add.at(W, (np.arange(out_size), idx), weight)
    elif mode == "bicubic":
        i0 = np.floor(src).astype(np.int64)
        frac = src - i0
        for k in range(-1, 3):
            tap = i0 + k
            weight = _cubic_kernel(frac - k)
            idx = np.clip(tap, 0, in_size - 1)
            np.add.at(W, (np.arange(out_size), idx), weight)
    else:
        raise ValueError(f"unsupported mode {mode}")
    return W.astype(np.float32)


def interpolate_torch(x: jnp.ndarray, out_hw: tuple[int, int], mode: str) -> jnp.ndarray:
    """Resize (B, H, W, C) with torch-interpolate semantics (align_corners=False,
    antialias=False). `mode` is "bilinear" or "bicubic"."""
    B, H, W, C = x.shape
    out_h, out_w = out_hw
    if (H, W) == (out_h, out_w):
        return x
    Wh = jnp.asarray(_interp_weights_1d(H, out_h, mode))
    Ww = jnp.asarray(_interp_weights_1d(W, out_w, mode))
    y = jnp.einsum("oh,bhwc->bowc", Wh, x.astype(jnp.float32))
    y = jnp.einsum("ow,bhwc->bhoc", Ww, y)
    return y.astype(x.dtype)
