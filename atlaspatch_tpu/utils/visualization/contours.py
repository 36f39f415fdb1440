"""Contour overlay rendering
(reference: atlas_patch/utils/visualization/contours.py:14-49): red tissue
outlines, blue hole outlines on the thumbnail."""

from __future__ import annotations

from pathlib import Path
from typing import Sequence

import numpy as np
from PIL import ImageDraw

from atlaspatch_tpu.io.iwsi import IWSI
from atlaspatch_tpu.ops.contours import scale_contours


def _draw_polylines(
    draw: ImageDraw.ImageDraw, contours: Sequence[np.ndarray], color, width: int
) -> None:
    for c in contours:
        pts = [tuple(p) for p in c.reshape(-1, 2).tolist()]
        if len(pts) >= 2:
            draw.line(pts + [pts[0]], fill=color, width=width)


def visualize_contours_on_thumbnail(
    *,
    tissue_contours: Sequence[np.ndarray],
    holes_contours: Sequence[Sequence[np.ndarray]],
    wsi: IWSI,
    output_dir: Path,
    thumbnail_size: int,
    mask_shape: tuple[int, int] | None = None,
) -> Path:
    thumb = wsi.get_thumb((thumbnail_size, thumbnail_size)).convert("RGB")
    tw, th = thumb.width, thumb.height
    if mask_shape is not None:
        mh, mw = mask_shape[:2]
        sx, sy = tw / float(mw), th / float(mh)
    else:
        W0, H0 = wsi.get_size(lv=0)
        sx, sy = tw / float(W0), th / float(H0)

    tcs = scale_contours(list(tissue_contours), sx, sy)
    hcs = scale_contours([h for hs in holes_contours for h in hs], sx, sy)

    draw = ImageDraw.Draw(thumb)
    _draw_polylines(draw, tcs, (255, 0, 0), 2)
    _draw_polylines(draw, hcs, (0, 0, 255), 1)

    output_dir.mkdir(parents=True, exist_ok=True)
    out_path = output_dir / f"{Path(wsi.path).stem}_contours.png"
    thumb.save(out_path, quality=95)
    return out_path
