"""Full `process` CLI on the virtual 8-device mesh (VERDICT r4 #6).

The multichip dryrun compiles the seg/embed steps on a mesh; this drives the
ENTIRE production path — runner, seg service with --seg-data-parallel,
extraction, embedding engine with --feature-parallel tensor, H5 writers —
through the real CLI on 8 virtual CPU devices, and pins the outputs to a
single-device run: coordinates byte-identical, features finite and
numerically equivalent (TP changes only the reduction order).

vit_l_32 is the smallest zoo tower whose TP plan divides an 8-way mesh
(dim 1024 / 8 = 128, heads 16 / 8 = 2; ViT-B's 12 heads do not split 8 ways).
"""

from __future__ import annotations

from pathlib import Path

import h5py
import numpy as np
import pytest
from PIL import Image

from atlaspatch_tpu.io.synthetic_wsi import make_tissue_canvas


@pytest.fixture
def tiny_sam2(monkeypatch):
    from atlaspatch_tpu.models.sam2.config import SAM2Config

    monkeypatch.setattr(SAM2Config, "tiny", SAM2Config.test_tiny)


@pytest.fixture
def slide_dir(tmp_path: Path) -> Path:
    sdir = tmp_path / "slides"
    sdir.mkdir()
    for i in range(2):
        Image.fromarray(make_tissue_canvas(768, 512, seed=i, n_blobs=2)).save(
            sdir / f"s{i}.png"
        )
    (tmp_path / "mpp.csv").write_text("wsi,mpp\ns0.png,0.5\ns1.png,0.5\n")
    return sdir


def _run_process(slide_dir: Path, out: Path, parallel: bool) -> None:
    from click.testing import CliRunner

    from atlaspatch_tpu.cli import cli

    args = [
        "process", str(slide_dir),
        "--output", str(out),
        "--patch-size", "64", "--target-mag", "20",
        "--device", "cpu", "--seg-batch-size", "8",
        "--feature-extractors", "vit_l_32", "--feature-batch-size", "16",
        "--mpp-csv", str(slide_dir.parent / "mpp.csv"),
        "--verbose",
    ]
    if parallel:
        args += ["--seg-data-parallel", "--feature-parallel", "tensor"]
    result = CliRunner().invoke(cli, args, catch_exceptions=False)
    assert result.exit_code == 0, result.output
    assert "failures: 0" in result.output


def test_process_on_8_device_mesh_matches_single_device(
    slide_dir: Path, tmp_path: Path, tiny_sam2, monkeypatch
):
    monkeypatch.setenv("ATLASPATCH_ALLOW_RANDOM_WEIGHTS", "1")
    import jax

    assert jax.device_count() >= 8, "conftest must provide the 8-device mesh"

    _run_process(slide_dir, tmp_path / "single", parallel=False)
    _run_process(slide_dir, tmp_path / "mesh", parallel=True)

    for i in range(2):
        with h5py.File(tmp_path / "single" / "patches" / f"s{i}.h5") as a, \
                h5py.File(tmp_path / "mesh" / "patches" / f"s{i}.h5") as b:
            ca, cb = a["coords"][:], b["coords"][:]
            assert ca.shape[0] > 0
            np.testing.assert_array_equal(ca, cb)  # byte-identical coords
            fa = a["features/vit_l_32"][:]
            fb = b["features/vit_l_32"][:]
            assert fa.shape == fb.shape == (ca.shape[0], 1024)
            assert np.isfinite(fa).all() and np.isfinite(fb).all()
            # TP re-orders the psum reductions; everything else is identical
            cos = np.sum(fa * fb, -1) / (
                np.linalg.norm(fa, axis=-1) * np.linalg.norm(fb, axis=-1)
            )
            assert cos.min() > 0.9999, f"slide {i}: min cosine {cos.min()}"
