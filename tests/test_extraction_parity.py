"""End-to-end coordinate parity: our vectorized extraction vs a cv2-loop oracle.

The oracle below transliterates the reference's per-point loop semantics
(atlas_patch/services/extraction.py + utils/contours.py) using cv2 primitives
directly. Our production path must yield byte-identical coords in the same
order.
"""

from pathlib import Path

import h5py
import numpy as np
import pytest

from atlaspatch_tpu.core.config import ExtractionConfig, OutputConfig
from atlaspatch_tpu.core.models import Slide
from atlaspatch_tpu.io.synthetic_wsi import SyntheticWSI, make_tissue_canvas
from atlaspatch_tpu.services.extraction import PatchExtractionService

cv2 = pytest.importorskip("cv2")


# --- oracle: direct transliteration of the reference loops ------------------------
def oracle_mask_to_contours(mask, tissue_area_thresh):
    mask_uint8 = (mask > 0.5).astype(np.uint8) * 255
    contours, hierarchy = cv2.findContours(mask_uint8, cv2.RETR_CCOMP, cv2.CHAIN_APPROX_NONE)
    if hierarchy is None or len(contours) == 0:
        return [], []
    hier = np.asarray(hierarchy)
    hier = hier[0] if hier.ndim == 3 and hier.shape[0] == 1 else hier.reshape(-1, 4)
    H, W = mask.shape[:2]
    min_area = tissue_area_thresh * float(H * W)
    tissue_idx, holes_by_parent = [], {}
    for i, cont in enumerate(contours):
        area = cv2.contourArea(cont)
        parent = hier[i][3]
        if parent == -1:
            if area >= min_area:
                tissue_idx.append(i)
        elif area >= 16:
            holes_by_parent.setdefault(parent, []).append(cont)
    all_holes = [h for hs in holes_by_parent.values() for h in hs]
    if len(all_holes) > 10:
        allowed = set(map(id, sorted(all_holes, key=cv2.contourArea, reverse=True)[:10]))
        for p, hs in list(holes_by_parent.items()):
            holes_by_parent[p] = [h for h in hs if id(h) in allowed]
    return (
        [contours[i] for i in tissue_idx],
        [list(holes_by_parent.get(i, [])) for i in tissue_idx],
    )


def oracle_scale(contours, sx, sy):
    out = []
    for c in contours:
        c = c.astype(np.float32)
        c[:, :, 0] *= sx
        c[:, :, 1] *= sy
        out.append(c.astype(np.int32))
    return out


def oracle_coords(wsi, mask, patch_size, target_mag, step_size=None, tissue_thresh=0.0):
    tcs_t, hcs_t = oracle_mask_to_contours(mask, tissue_thresh)
    W, H = wsi.get_size(lv=0)
    mh, mw = mask.shape[:2]
    tcs = oracle_scale(tcs_t, W / mw, H / mh)
    hcs = [oracle_scale(hs, W / mw, H / mh) for hs in hcs_t]

    src_mag = wsi.mag
    dd = float(src_mag) / float(target_mag)
    level, _ = wsi.optimal_level(dd)
    level_ds = float((wsi.ds or [1.0])[level])
    psrc = int(round(patch_size * dd))
    step = int(round((step_size or patch_size) * dd))
    read_w = max(1, int(round(psrc / level_ds)))

    out = []
    for contour, holes in zip(tcs, hcs):
        x0, y0, ww, hh = cv2.boundingRect(contour)
        for y in range(y0, y0 + hh, step):
            for x in range(x0, x0 + ww, step):
                cx, cy = x + psrc // 2, y + psrc // 2
                if any(cv2.pointPolygonTest(h, (cx, cy), False) > 0 for h in holes):
                    continue
                shift = int(psrc // 2 * 0.5)
                if shift > 0:
                    probes = [
                        (cx - shift, cy - shift),
                        (cx + shift, cy + shift),
                        (cx + shift, cy - shift),
                        (cx - shift, cy + shift),
                    ]
                else:
                    probes = [(cx, cy)]
                if any(cv2.pointPolygonTest(contour, p, False) >= 0 for p in probes):
                    out.append((x, y, read_w, read_w, level))
    return np.asarray(out, dtype=np.int32).reshape(-1, 5)


def _blob_mask(seed, size=(96, 128), n=4, holes=True):
    rng = np.random.default_rng(seed)
    h, w = size
    yy, xx = np.mgrid[0:h, 0:w]
    mask = np.zeros((h, w), dtype=np.float32)
    for _ in range(n):
        cx, cy = rng.uniform(0.1, 0.9) * w, rng.uniform(0.1, 0.9) * h
        rx, ry = rng.uniform(0.05, 0.3) * w, rng.uniform(0.05, 0.3) * h
        mask[((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2 < 1] = 1.0
    if holes:
        for _ in range(3):
            cx, cy = rng.uniform(0.2, 0.8) * w, rng.uniform(0.2, 0.8) * h
            r = rng.uniform(0.02, 0.08) * w
            mask[((xx - cx) ** 2 + (yy - cy) ** 2) < r**2] = 0.0
    return mask


class _MetaOnlyWSI(SyntheticWSI):
    """Synthetic slide with a tiny canvas but arbitrary reported pyramid metadata,
    for geometry-only tests (fast mode never reads pixels)."""

    def __init__(self, *, dims, mpp=0.5, mag=20):
        super().__init__(size=(64, 64), levels=1, mpp=mpp, mag=mag)
        self._fake_dims = [(int(w), int(h)) for w, h in dims]

    def _setup(self):
        super()._setup()
        self.dims = self._fake_dims
        self.w, self.h = self.dims[0]
        self.nlvl = len(self.dims)
        self.ds = [self.dims[0][0] / w for w, _ in self.dims]


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 7])
@pytest.mark.parametrize(
    "patch_size,target_mag,tissue_thresh",
    [(256, 20, 0.0), (512, 10, 0.0), (224, 20, 0.01), (256, 5, 0.001)],
)
def test_compute_coords_matches_oracle(tmp_path: Path, seed, patch_size, target_mag, tissue_thresh):
    wsi = _MetaOnlyWSI(dims=[(8192, 6144), (4096, 3072), (2048, 1536)], mpp=0.5, mag=20)
    wsi._ensure_loaded()
    mask = _blob_mask(seed)

    svc = PatchExtractionService(
        ExtractionConfig(
            patch_size=patch_size,
            target_magnification=target_mag,
            tissue_threshold=tissue_thresh,
        ),
        OutputConfig(output_root=tmp_path),
    )
    tcs, hcs = svc._prepare_contours(mask, wsi)
    level, (rw, rh), psrc, step, _ = svc._prepare_geometry(wsi)
    coords = svc.compute_coords(tcs, hcs, patch_size_src=psrc, step_src=step)
    ours = np.asarray(
        [(x, y, rw, rh, level) for x, y in coords], dtype=np.int32
    ).reshape(-1, 5)

    want = oracle_coords(
        wsi, mask, patch_size, target_mag, tissue_thresh=tissue_thresh
    )
    np.testing.assert_array_equal(ours, want)
    if tissue_thresh == 0.0:
        assert ours.shape[0] > 0  # non-degenerate


def test_extract_writes_h5(tmp_path: Path):
    wsi = SyntheticWSI(size=(2048, 2048), levels=3, mpp=0.5, seed=0)
    mask = _blob_mask(0, size=(128, 128))
    slide = Slide(path=Path("/data/fake.svs"))
    svc = PatchExtractionService(
        ExtractionConfig(patch_size=256, target_magnification=10),
        OutputConfig(output_root=tmp_path),
    )
    result = svc.extract(wsi, mask, slide=slide)
    assert result.h5_path.exists()
    with h5py.File(result.h5_path) as f:
        assert f["coords"].shape[0] == result.num_patches
        assert f.attrs["num_patches"] == result.num_patches
        assert f.attrs["patch_size"] == 256
        assert f.attrs["target_magnification"] == 10
        assert f.attrs["level0_magnification"] == 20
        assert f.attrs["patch_size_level0"] == 512
        assert f.attrs["mpp"] == 0.5


def test_extract_slow_mode_filters(tmp_path: Path):
    # white canvas with one tissue blob: slow mode should drop white patches
    canvas = make_tissue_canvas(2048, 2048, seed=1, n_blobs=2)
    wsi = SyntheticWSI(level0=canvas, levels=2, mpp=0.5)
    mask = np.ones((64, 64), dtype=np.float32)  # force full-grid candidates
    slide = Slide(path=Path("/data/white.svs"))
    fast = PatchExtractionService(
        ExtractionConfig(patch_size=256, target_magnification=20, fast_mode=True),
        OutputConfig(output_root=tmp_path / "fast"),
    ).extract(wsi, mask, slide=slide)
    slow = PatchExtractionService(
        ExtractionConfig(patch_size=256, target_magnification=20, fast_mode=False),
        OutputConfig(output_root=tmp_path / "slow"),
    ).extract(wsi, mask, slide=slide)
    assert slow.num_patches < fast.num_patches  # white background filtered
    assert slow.num_patches > 0
