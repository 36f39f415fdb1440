"""Overlay renderers for masks, patch grids, and contours (reference parity:
atlas_patch/utils/visualization/); each submodule draws one overlay type on a
slide thumbnail and returns the written path."""

from atlaspatch_tpu.utils.visualization.contours import visualize_contours_on_thumbnail
from atlaspatch_tpu.utils.visualization.mask import visualize_mask_on_thumbnail
from atlaspatch_tpu.utils.visualization.patches import visualize_patches_on_thumbnail

__all__ = [
    "visualize_contours_on_thumbnail",
    "visualize_mask_on_thumbnail",
    "visualize_patches_on_thumbnail",
]
