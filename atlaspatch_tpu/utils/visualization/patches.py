"""Patch-grid overlay rendering
(reference: atlas_patch/utils/visualization/patches.py:14-90)."""

from __future__ import annotations

from pathlib import Path
from typing import Any

import numpy as np
from PIL import Image, ImageDraw, ImageFont

from atlaspatch_tpu.io.iwsi import IWSI


def _draw_info_box(image: Image.Image, text: str, padding: int = 10) -> None:
    draw = ImageDraw.Draw(image, "RGBA")
    font = ImageFont.load_default()
    lines = text.split("\n")
    line_height = 16
    max_width = 0
    for line in lines:
        bbox = draw.textbbox((0, 0), line, font=font)
        max_width = max(max_width, bbox[2] - bbox[0])
    box_w = max_width + 2 * padding
    box_h = len(lines) * line_height + 2 * padding
    x1, y1 = image.width - box_w - 10, 10
    x2, y2 = image.width - 10, y1 + box_h
    draw.rectangle(((x1, y1), (x2, y2)), fill=(255, 255, 255, 230), outline=(0, 0, 0, 255), width=2)
    for i, line in enumerate(lines):
        draw.text((x1 + padding, y1 + padding + i * line_height), line, fill=(0, 0, 0, 255), font=font)


def visualize_patches_on_thumbnail(
    *,
    coords: np.ndarray,
    patch_size_level0: int,
    wsi: IWSI,
    output_dir: Path,
    thumbnail_size: int,
    info: dict[str, Any] | None = None,
) -> Path:
    thumbnail = wsi.get_thumb((thumbnail_size, thumbnail_size)).convert("RGB")
    W0, H0 = wsi.get_size(lv=0)
    ds_x = W0 / thumbnail.width
    ds_y = H0 / thumbnail.height

    ct = coords.astype(np.float32)
    ct[:, 0] /= ds_x
    ct[:, 1] /= ds_y
    ps_x = float(patch_size_level0) / ds_x
    ps_y = float(patch_size_level0) / ds_y

    draw = ImageDraw.Draw(thumbnail, "RGBA")
    for cx, cy in ct.astype(float):
        draw.rectangle(
            ((int(cx), int(cy)), (int(cx + ps_x), int(cy + ps_y))),
            outline=(0, 0, 0),
            width=1,
        )

    info_lines = [f"Patches Extracted: {len(coords)}", f"WSI Size: {W0} x {H0}"]
    if info:
        for key, label in (
            ("patch_size", "Patch Size"),
            ("step_size", "Step Size"),
            ("tissue_thresh", "Tissue Threshold"),
        ):
            if key in info:
                info_lines.append(f"{label}: {info[key]}")
    _draw_info_box(thumbnail, "\n".join(info_lines))

    output_dir.mkdir(parents=True, exist_ok=True)
    out_path = output_dir / f"{Path(wsi.path).stem}.png"
    thumbnail.save(out_path, quality=95)
    return out_path
