"""Synthetic annotated WSI-thumbnail corpus for SAM2 training/eval.

The reference's segmentation model was finetuned on ~35,000 semi-manually
annotated WSI thumbnails (reference: CHANGELOG.md:13, docs/index.html:114-115)
that cannot be redistributed. This generator produces a stand-in corpus with
the same *task structure* so the training loop can be driven to a meaningful
mask offline:

  * irregular tissue regions (harmonically-perturbed ellipse unions) in
    H&E-like colors with low-frequency stain variation, nuclei speckle, and
    occasional lumen holes — these ARE tissue (truth = 1);
  * distractors that a naive darkness threshold would call tissue but the
    model must learn to reject (truth = 0): marker-pen strokes, coverslip
    edge shadows, dust specks;
  * clean white-ish scanner background with vignette + sensor noise.

Output layout (what finetune-sam2 and evaluate-masks consume):

  <out>/images/<stem>.png        RGB thumbnail
  <out>/masks/<stem>_mask.png    binary truth mask (255 = tissue)

Usage: python -m atlaspatch_tpu.tools.synthetic_corpus <out> --n 128
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def _blob(xx: np.ndarray, yy: np.ndarray, cx: float, cy: float, rx: float,
          ry: float, rng: np.random.Generator, wobble: float = 0.45) -> np.ndarray:
    """Irregular blob: unit ellipse with smooth radial harmonics."""
    dx = (xx - cx) / rx
    dy = (yy - cy) / ry
    r = np.sqrt(dx * dx + dy * dy)
    theta = np.arctan2(dy, dx)
    edge = np.ones_like(r)
    for k in range(1, 5):
        edge += rng.uniform(0.0, wobble / k) * np.sin(k * theta + rng.uniform(0, 2 * np.pi))
    return r < edge


def _stroke(xx: np.ndarray, yy: np.ndarray, pts: np.ndarray, width: float) -> np.ndarray:
    """Thick polyline: union of distance-to-segment bands."""
    hit = np.zeros(xx.shape, dtype=bool)
    for (x0, y0), (x1, y1) in zip(pts[:-1], pts[1:]):
        vx, vy = x1 - x0, y1 - y0
        L2 = vx * vx + vy * vy + 1e-6
        t = np.clip(((xx - x0) * vx + (yy - y0) * vy) / L2, 0.0, 1.0)
        d2 = (xx - (x0 + t * vx)) ** 2 + (yy - (y0 + t * vy)) ** 2
        hit |= d2 < width * width
    return hit


def make_annotated_thumbnail(
    width: int = 1024,
    height: int = 768,
    *,
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """One (RGB uint8 image, bool truth mask) pair."""
    rng = np.random.default_rng(seed)
    xx = np.arange(width, dtype=np.float32)[None, :]
    yy = np.arange(height, dtype=np.float32)[:, None]
    xg = np.broadcast_to(xx, (height, width))
    yg = np.broadcast_to(yy, (height, width))

    # background: warm off-white with a gentle vignette
    bg = rng.uniform(238, 250)
    img = np.full((height, width, 3), bg, dtype=np.float32)
    vign = 1.0 - 0.06 * (((xg / width - 0.5) ** 2 + (yg / height - 0.5) ** 2) * 2)
    img *= vign[..., None]

    tissue = np.zeros((height, width), dtype=bool)
    n_regions = int(rng.integers(1, 5))
    for _ in range(n_regions):
        cx = rng.uniform(0.15, 0.85) * width
        cy = rng.uniform(0.15, 0.85) * height
        rx = rng.uniform(0.08, 0.28) * width
        ry = rng.uniform(0.08, 0.28) * height
        region = _blob(xg, yg, cx, cy, rx, ry, rng)
        # satellite fragments hugging the main section (common in biopsies)
        for _ in range(int(rng.integers(0, 3))):
            fx = cx + rng.uniform(-1.4, 1.4) * rx
            fy = cy + rng.uniform(-1.4, 1.4) * ry
            region |= _blob(xg, yg, fx, fy, rx * rng.uniform(0.1, 0.3),
                            ry * rng.uniform(0.1, 0.3), rng)
        # lumen/fat holes: inside the region but NOT tissue
        holes = np.zeros_like(region)
        for _ in range(int(rng.integers(0, 4))):
            hx = cx + rng.uniform(-0.5, 0.5) * rx
            hy = cy + rng.uniform(-0.5, 0.5) * ry
            holes |= _blob(xg, yg, hx, hy, rx * rng.uniform(0.06, 0.18),
                           ry * rng.uniform(0.06, 0.18), rng)
        holes &= region
        region &= ~holes

        # H&E palette: eosin pink ↔ hematoxylin purple, low-frequency mixing
        base = np.array([
            rng.uniform(150, 210),  # R
            rng.uniform(60, 130),   # G
            rng.uniform(140, 200),  # B
        ], np.float32)
        f1 = np.sin(xg * rng.uniform(0.005, 0.02) + rng.uniform(0, 6)) * np.sin(
            yg * rng.uniform(0.005, 0.02) + rng.uniform(0, 6)
        )
        shade = 1.0 + 0.18 * f1
        color = base[None, None, :] * shade[..., None]
        img[region] = color[region]
        # nuclei speckle: sparse dark dots inside tissue
        speckle = (rng.random((height, width)) < 0.06) & region
        img[speckle] *= rng.uniform(0.45, 0.7)
        tissue |= region

    # distractors (truth = 0): marker-pen strokes in saturated ink colors —
    # always at least one, so a plain darkness threshold is measurably wrong
    # and "meaningful mask" means more than thresholding
    pen_palette = [(30, 90, 40), (30, 50, 140), (150, 30, 30), (20, 20, 20)]
    for _ in range(int(rng.integers(1, 4))):
        n_pts = int(rng.integers(3, 6))
        pts = np.stack([
            rng.uniform(0.05, 0.95, n_pts) * width,
            rng.uniform(0.05, 0.95, n_pts) * height,
        ], axis=1)
        stroke = _stroke(xg, yg, pts, width=rng.uniform(3, 9))
        ink = np.array(pen_palette[int(rng.integers(len(pen_palette)))], np.float32)
        alpha = rng.uniform(0.7, 0.95)
        img[stroke] = (1 - alpha) * img[stroke] + alpha * ink

    # coverslip edge shadow along one border (dark, not tissue)
    if rng.random() < 0.5:
        side = int(rng.integers(4))
        depth = int(rng.uniform(4, 14))
        shade = rng.uniform(0.35, 0.7)
        sl = [np.s_[:depth, :], np.s_[-depth:, :], np.s_[:, :depth], np.s_[:, -depth:]][side]
        img[sl] *= shade

    # dust specks
    n_dust = int(rng.integers(0, 30))
    ys = rng.integers(0, height, n_dust)
    xs_d = rng.integers(0, width, n_dust)
    img[ys, xs_d] *= rng.uniform(0.3, 0.7, (n_dust, 1))

    # sensor noise
    img += rng.normal(0, 2.2, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8), tissue


def generate_corpus(
    out_dir: Path,
    *,
    n: int = 128,
    width: int = 1024,
    height: int = 768,
    seed: int = 0,
    prefix: str = "syn",
) -> tuple[Path, Path]:
    """Write n annotated pairs; returns (images_dir, masks_dir)."""
    from PIL import Image

    images = Path(out_dir) / "images"
    masks = Path(out_dir) / "masks"
    images.mkdir(parents=True, exist_ok=True)
    masks.mkdir(parents=True, exist_ok=True)
    for i in range(n):
        img, mask = make_annotated_thumbnail(width, height, seed=seed + i)
        stem = f"{prefix}{i:04d}"
        Image.fromarray(img).save(images / f"{stem}.png")
        Image.fromarray((mask * 255).astype(np.uint8)).save(masks / f"{stem}_mask.png")
    return images, masks


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("out", type=Path)
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--height", type=int, default=768)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--prefix", default="syn")
    args = ap.parse_args()
    images, masks = generate_corpus(
        args.out, n=args.n, width=args.width, height=args.height,
        seed=args.seed, prefix=args.prefix,
    )
    print(f"{args.n} pairs: {images} | {masks}")


if __name__ == "__main__":
    main()
