"""Decoded-chunk LRU cache in the native TIFF decoder: cached reads must be
bit-identical to uncached ones across overlapping patch-grid regions, under
eviction pressure, and from concurrent reader threads (the embed path reads
patch blocks from a thread pool)."""

import os
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np
import pytest

from atlaspatch_tpu.io.synthetic_wsi import make_tissue_canvas
from tests.tiff_builder import write_pyramid

from atlaspatch_tpu.io.native import AtlasTiffFile  # noqa: E402


@pytest.fixture
def jpeg_slide(tmp_path: Path) -> Path:
    path = tmp_path / "s.svs"
    canvas = make_tissue_canvas(1024, 768, seed=3, n_blobs=3)
    write_pyramid(path, canvas, levels=2, tile=128, compression=7,
                  description="Aperio|AppMag = 20|MPP = 0.5")
    return path


def _grid_reads(f: AtlasTiffFile, step: int = 96, size: int = 200):
    """Overlapping unaligned regions spanning tile boundaries (each region
    covers up to 9 tiles; neighbors share tiles)."""
    W, H = f.dimensions
    out = []
    for y in range(0, H - size, step):
        for x in range(0, W - size, step):
            out.append(f.read_region_level(0, x, y, size, size))
    return out


def test_cached_reads_bitexact_vs_uncached(jpeg_slide, monkeypatch):
    monkeypatch.setenv("ATLASPATCH_TIFF_CACHE_MB", "0")
    f0 = AtlasTiffFile(str(jpeg_slide))
    base = _grid_reads(f0)
    f0.close()

    monkeypatch.setenv("ATLASPATCH_TIFF_CACHE_MB", "32")
    f1 = AtlasTiffFile(str(jpeg_slide))
    cached = _grid_reads(f1)
    # Second pass over the same grid: every tile now comes from the cache.
    cached2 = _grid_reads(f1)
    f1.close()

    assert len(base) == len(cached) > 20
    for a, b, c in zip(base, cached, cached2):
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(a, c)


def test_cache_eviction_pressure_stays_correct(jpeg_slide, monkeypatch):
    # 1 MB cap: a 128x128x3 tile is 48 KiB, so ~21 tiles fit and the 8x6-tile
    # level constantly evicts.
    monkeypatch.setenv("ATLASPATCH_TIFF_CACHE_MB", "1")
    f1 = AtlasTiffFile(str(jpeg_slide))
    monkeypatch.setenv("ATLASPATCH_TIFF_CACHE_MB", "0")
    f0 = AtlasTiffFile(str(jpeg_slide))
    for _ in range(2):
        for a, b in zip(_grid_reads(f0, step=160), _grid_reads(f1, step=160)):
            np.testing.assert_array_equal(a, b)
    f0.close()
    f1.close()


def test_concurrent_cached_reads_match(jpeg_slide, monkeypatch):
    monkeypatch.setenv("ATLASPATCH_TIFF_CACHE_MB", "4")
    f = AtlasTiffFile(str(jpeg_slide))
    W, H = f.dimensions
    rng = np.random.default_rng(0)
    boxes = [(int(rng.integers(0, W - 160)), int(rng.integers(0, H - 160)))
             for _ in range(64)]

    def read(box):
        x, y = box
        return f.read_region_level(0, x, y, 160, 160)

    serial = [read(b) for b in boxes]
    with ThreadPoolExecutor(max_workers=8) as ex:
        parallel = list(ex.map(read, boxes))
    f.close()
    for a, b in zip(serial, parallel):
        np.testing.assert_array_equal(a, b)
