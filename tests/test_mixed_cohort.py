"""One CLI run over a directory mixing EVERY supported slide container.

The reference feeds whatever OpenSlide opens through one pipeline
(reference: atlas_patch/core/wsi/wsi_factory.py:20-39); this proves our
factory + native decoders do the same in a single cohort: tiled-JPEG SVS,
NDPI (SourceLens levels; plus a striped giant-JPEG variant), Leica SCN,
MIRAX, Hamamatsu VMS and VMU, DICOM WSI, Ventana BIF (striped overview
before the tiled pyramid), Philips TIFF (UFS XML pixel spacing), Trestle
(per-level OverlapsXY tile overlaps), OME-TIFF, palette-color TIFF, and a
plain PNG with CSV MPP."""

from __future__ import annotations

import io
from pathlib import Path

import h5py
import numpy as np
import pytest
from PIL import Image

from atlaspatch_tpu.io.synthetic_wsi import make_tissue_canvas
from tests.container_builders import write_dicom_level, write_mirax, write_vms, write_vmu
from tests.test_vendor_formats import (
    BIF_XMP,
    PHILIPS_XML,
    TYPE_ASCII,
    _ndpi_tags,
    _scn_xml,
    _zero_sof_dims,
)
from tests.tiff_builder import TiffWriter, write_pyramid


@pytest.fixture
def tiny_sam2(monkeypatch):
    from atlaspatch_tpu.models.sam2.config import SAM2Config

    monkeypatch.setattr(SAM2Config, "tiny", SAM2Config.test_tiny)


def _build_cohort(root: Path) -> list[str]:
    sdir = root / "slides"
    sdir.mkdir()
    canvas = make_tissue_canvas(512, 384, seed=7, n_blobs=2)
    small = make_tissue_canvas(256, 192, seed=8, n_blobs=1)

    # Aperio-style tiled JPEG SVS
    write_pyramid(
        sdir / "a.svs",
        canvas,
        levels=2,
        tile=64,
        compression=7,
        description="Aperio Image Library\r\n512x384 | AppMag = 20 | MPP = 0.5",
    )

    # NDPI: SourceLens levels + macro
    w = TiffWriter()
    w.add_level(canvas, extra_tags=_ndpi_tags(20.0), resolution=(20000.0, 20000.0, 3))
    w.add_level(canvas[::4, ::4].copy(), extra_tags=_ndpi_tags(5.0))
    w.add_level(np.full((40, 100, 3), 200, np.uint8), extra_tags=_ndpi_tags(-1.0))
    w.save(sdir / "b.ndpi")

    # NDPI giant-JPEG variant: single strip, zeroed SOF, restart markers
    buf = io.BytesIO()
    Image.fromarray(canvas).save(
        buf, "JPEG", quality=95, subsampling=0, restart_marker_rows=1
    )
    w2 = TiffWriter()
    w2.add_level_raw_strips(
        [_zero_sof_dims(buf.getvalue())],
        width=512,
        height=384,
        rows_per_strip=384,
        extra_tags=_ndpi_tags(20.0),
        resolution=(20000.0, 20000.0, 3),
    )
    w2.save(sdir / "c.ndpi")

    # Leica SCN: macro first, XML selects the scanned region
    xml = _scn_xml((100, 80), [(512, 384, 1), (128, 96, 2)], 20)
    w3 = TiffWriter()
    w3.add_level(np.full((80, 100, 3), 180, np.uint8), description=xml)
    w3.add_level(canvas, resolution=(20000.0, 20000.0, 3))
    w3.add_level(canvas[::4, ::4].copy())
    w3.save(sdir / "d.scn")

    # Non-TIFF containers
    write_mirax(sdir / "e.mrxs", small, tile_w=64, tile_h=48, n_levels=1,
                mpp=0.5, objective=20)
    write_vms(sdir / "f.vms", small, cols=2, rows=1, mpp=0.5, lens=20)
    write_vmu(sdir / "g.vmu", small, column_width=32, mpp=0.5, lens=20)
    write_dicom_level(sdir / "h.dcm", small, tile=64, mpp=0.5, objective=20.0)

    # Ventana/Roche BIF: striped overview at directory 0, tiled full-res
    # after it, iScan mag/MPP in the overview's XMP packet
    bif_xmp = BIF_XMP.replace('Magnification="40"', 'Magnification="20"').replace(
        'ScanRes="0.25"', 'ScanRes="0.5"'
    )
    w4 = TiffWriter()
    w4.add_level(
        canvas[::8, ::8].copy(), extra_tags=[(700, TYPE_ASCII, [bif_xmp])]
    )
    w4.add_level(canvas, tile=64)
    w4.add_level(canvas[::4, ::4].copy(), tile=64)
    w4.save(sdir / "j.bif")

    # Philips TIFF: Software tag + UFS XML pixel spacing in IFD0
    philips_xml = PHILIPS_XML.replace("0.00025", "0.0005")
    w5 = TiffWriter()
    w5.add_level(
        canvas,
        tile=64,
        description=philips_xml,
        extra_tags=[(305, TYPE_ASCII, ["Philips DP v1.0"])],
    )
    w5.add_level(canvas[::4, ::4].copy(), tile=64)
    w5.save(sdir / "k.tiff")

    # Plain image with CSV-resolved MPP
    Image.fromarray(small).save(sdir / "i.png")
    (root / "mpp.csv").write_text("wsi,mpp\ni.png,0.5\n")

    # OME-TIFF: SubIFD pyramid, MPP/mag from the OME-XML, sibling plane
    from tests.tiff_builder import write_ome_pyramid

    write_ome_pyramid(
        sdir / "l.ome.tiff", canvas, levels=2, physical_size_x=0.5, mag=20.0,
        extra_planes=1,
    )

    # Palette-color TIFF (photometric 3 + ColorMap), CSV-resolved MPP
    Image.fromarray(small).quantize(colors=200).save(sdir / "m.tiff")
    (root / "mpp.csv").write_text("wsi,mpp\ni.png,0.5\nm.tiff,0.5\n")

    # Trestle .tif: MedScan Software tag; base tiles overlap by the
    # OverlapsXY pair (16, 16), so the 512x384 raw mosaic stitches to a
    # 400x304 canvas; Objective Power feeds magnification
    trestle_truth = make_tissue_canvas(400, 304, seed=9, n_blobs=2)
    mosaic = np.zeros((6 * 64, 8 * 64, 3), np.uint8)
    for r in range(6):
        for c in range(8):
            mosaic[r * 64 : (r + 1) * 64, c * 64 : (c + 1) * 64] = trestle_truth[
                r * 48 : r * 48 + 64, c * 48 : c * 48 + 64
            ]
    w6 = TiffWriter()
    w6.add_level(
        mosaic,
        tile=64,
        description="Background Color=FFFFFF;OverlapsXY=16 16;Objective Power=20",
        extra_tags=[(305, TYPE_ASCII, ["MedScan"])],
    )
    w6.add_level(trestle_truth[::4, ::4].copy(), tile=64)
    w6.save(sdir / "n.tif")

    return ["a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k", "l.ome", "m", "n"]


def test_mixed_format_cohort_single_run(tmp_path: Path, tiny_sam2):
    from click.testing import CliRunner

    from atlaspatch_tpu.cli import cli

    stems = _build_cohort(tmp_path)
    out = tmp_path / "out"
    result = CliRunner().invoke(
        cli,
        [
            "segment-and-get-coords",
            str(tmp_path / "slides"),
            "-o",
            str(out),
            "--patch-size",
            "64",
            "--target-mag",
            "20",
            "--device",
            "cpu",
            "--seg-batch-size",
            "4",
            "--mpp-csv",
            str(tmp_path / "mpp.csv"),
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    assert f"Completed {len(stems)} slide(s), failures: 0" in result.output
    for stem in stems:
        p = out / "patches" / f"{stem}.h5"
        assert p.exists(), f"missing H5 for {stem}"
        with h5py.File(p) as f:
            coords = f["coords"][:]
            assert coords.shape[0] > 0 and coords.shape[1] == 5
            assert f.attrs["level0_magnification"] == 20
