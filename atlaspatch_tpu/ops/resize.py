"""Device-side image resizing ops.

Re-exports the torch-semantics interpolation used across the SAM2 path and
adds mask-oriented helpers. All weights are static einsum contractions —
MXU-friendly, exact (models/sam2/interp.py holds the kernel math).
"""

from __future__ import annotations

import jax.numpy as jnp

from atlaspatch_tpu.models.sam2.interp import interpolate_torch  # noqa: F401


def resize_nearest(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """(B, H, W[, C]) nearest-neighbor resize with PIL/torch half-pixel mapping
    (floor((i + 0.5) * scale))."""
    B, H, W = x.shape[0], x.shape[1], x.shape[2]
    out_h, out_w = out_hw
    rows = jnp.clip(((jnp.arange(out_h) + 0.5) * (H / out_h)).astype(jnp.int32), 0, H - 1)
    cols = jnp.clip(((jnp.arange(out_w) + 0.5) * (W / out_w)).astype(jnp.int32), 0, W - 1)
    return x[:, rows][:, :, cols]
