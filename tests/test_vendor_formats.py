"""Vendor-container pyramid selection: Hamamatsu NDPI and Leica SCN.

The reference opens these through OpenSlide (reference:
atlas_patch/core/wsi/wsi_factory.py:20-39). Our native decoder implements
the vendor quirks first-party: NDPI classifies IFDs by the SourceLens tag
(65421) and unwraps 32-bit strip offsets in >4 GiB files; SCN picks the
pyramid out of the XML <collection> in IFD0's ImageDescription. Synthetic
files are built to the published format notes (openslide.org/formats)."""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np
import pytest

from tests.tiff_builder import TYPE_FLOAT, TYPE_LONG, TiffWriter

pytest.importorskip("atlaspatch_tpu.io.native")
from atlaspatch_tpu.io.native import AtlasTiffFile  # noqa: E402
from atlaspatch_tpu.io.tiff_wsi import TiffWSI  # noqa: E402

NDPI_MAGIC = 65420
NDPI_SOURCE_LENS = 65421
NDPI_Z_OFFSET = 65422


def _rand_rgb(rng, h, w):
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


# ----------------------------------------------------------------- NDPI


def _ndpi_tags(lens: float, z: int | None = None):
    tags = [(NDPI_MAGIC, TYPE_LONG, [1]), (NDPI_SOURCE_LENS, TYPE_FLOAT, [lens])]
    if z is not None:
        tags.append((NDPI_Z_OFFSET, TYPE_LONG, [z]))
    return tags


def test_ndpi_sourcelens_level_selection(tmp_path: Path):
    rng = np.random.default_rng(7)
    main = _rand_rgb(rng, 96, 128)
    low = main[::2, ::2].copy()
    zplane = _rand_rgb(rng, 96, 128)  # same shape as main, z != 0
    macro = _rand_rgb(rng, 40, 100)
    smap = _rand_rgb(rng, 30, 80)

    w = TiffWriter()
    w.add_level(main, extra_tags=_ndpi_tags(20.0), resolution=(20000.0, 20000.0, 3))
    w.add_level(zplane, extra_tags=_ndpi_tags(20.0, z=1000))
    w.add_level(low, extra_tags=_ndpi_tags(5.0))
    w.add_level(macro, extra_tags=_ndpi_tags(-1.0))
    w.add_level(smap, extra_tags=_ndpi_tags(-2.0))
    path = tmp_path / "slide.ndpi"
    w.save(path)

    t = AtlasTiffFile(str(path))
    # Only SourceLens > 0 IFDs at z=0 become levels; macro/map/z-plane do not.
    assert t.level_count == 2
    assert t.level_dimensions == [(128, 96), (64, 48)]
    assert t.properties["atlas.vendor"] == "hamamatsu-ndpi"
    assert t.properties["hamamatsu.SourceLens"] == "20"
    np.testing.assert_array_equal(t.read_region_level(0, 0, 0, 128, 96), main)
    np.testing.assert_array_equal(t.read_region_level(1, 0, 0, 64, 48), low)
    t.close()

    wsi = TiffWSI(path=str(path))
    wsi._ensure_loaded()
    assert wsi.mag == 20
    assert wsi.mpp == 0.5  # 20000 px/cm resolution tags → 0.5 µm/px


def test_ndpi_without_sourcelens_falls_back_to_generic(tmp_path: Path):
    rng = np.random.default_rng(8)
    main = _rand_rgb(rng, 64, 96)
    w = TiffWriter()
    # Magic tag present but no SourceLens anywhere → generic reduction chain.
    w.add_level(main, extra_tags=[(NDPI_MAGIC, TYPE_LONG, [1])])
    w.add_level(main[::2, ::2].copy(), extra_tags=[(NDPI_MAGIC, TYPE_LONG, [1])])
    path = tmp_path / "odd.ndpi"
    w.save(path)
    t = AtlasTiffFile(str(path))
    assert t.level_count == 2
    assert t.level_dimensions[0] == (96, 64)
    t.close()


def test_ndpi_strip_offsets_beyond_4gb(tmp_path: Path):
    """NDPI keeps classic-TIFF 32-bit offsets even past 4 GiB; stored values
    are the true offset's low 32 bits. The decoder unwraps them by monotonic
    file order. Built sparse, so the file occupies a few KiB on disk."""
    rng = np.random.default_rng(9)
    img = _rand_rgb(rng, 48, 64)

    w = TiffWriter()
    w.add_level(img, extra_tags=_ndpi_tags(40.0))
    path = tmp_path / "big.ndpi"
    w.save(path)

    raw = bytearray(path.read_bytes())
    ifd_off = struct.unpack_from("<I", raw, 4)[0]
    n = struct.unpack_from("<H", raw, ifd_off)[0]
    entry_at = {}
    for i in range(n):
        tag = struct.unpack_from("<H", raw, ifd_off + 2 + 12 * i)[0]
        entry_at[tag] = ifd_off + 2 + 12 * i
    _, _, cnt, arr_off = struct.unpack_from("<HHII", raw, entry_at[273])
    assert cnt >= 2, "need multiple strips for the unwrap path"
    offsets = list(struct.unpack_from(f"<{cnt}I", raw, arr_off))
    counts = list(
        struct.unpack_from(
            f"<{cnt}I", raw, struct.unpack_from("<HHII", raw, entry_at[279])[3]
        )
    )

    # Relocate every strip after the first to true offsets above 4 GiB and
    # store only the low 32 bits, as NDPI writers do.
    base = 1 << 32
    cursor = base + 8
    with open(path, "r+b") as f:
        for i in range(1, cnt):
            data = raw[offsets[i] : offsets[i] + counts[i]]
            f.seek(cursor)
            f.write(data)
            struct.pack_into("<I", raw, arr_off + 4 * i, cursor & 0xFFFFFFFF)
            cursor += counts[i]
        f.seek(0)
        f.write(raw[: len(raw)])

    assert path.stat().st_size > base
    t = AtlasTiffFile(str(path))
    np.testing.assert_array_equal(t.read_region_level(0, 0, 0, 64, 48), img)
    t.close()


# ----------------------------------------------------------------- Leica SCN


def _scn_xml(macro_wh, main_dims, objective):
    (mw, mh) = macro_wh
    dims = "\n".join(
        f'<dimension sizeX="{w}" sizeY="{h}" r="{r}" ifd="{ifd}"/>'
        for r, (w, h, ifd) in enumerate(main_dims)
    )
    return f"""<?xml version="1.0" encoding="utf-8"?>
<scn xmlns="http://www.leica-microsystems.com/scn/2010/10/01">
<collection sizeX="20000000" sizeY="15000000">
<image name="macro" uuid="u1">
<pixels sizeX="{mw}" sizeY="{mh}">
<dimension sizeX="{mw}" sizeY="{mh}" r="0" ifd="0"/>
</pixels>
<view sizeX="20000000" sizeY="15000000" offsetX="0" offsetY="0"/>
<scanSettings><objectiveSettings><objective>0.8</objective></objectiveSettings></scanSettings>
</image>
<image name="region" uuid="u2">
<pixels sizeX="{main_dims[0][0]}" sizeY="{main_dims[0][1]}">
{dims}
</pixels>
<view sizeX="4000000" sizeY="3000000" offsetX="2000000" offsetY="1000000"/>
<scanSettings><objectiveSettings><objective>{objective}</objective></objectiveSettings></scanSettings>
</image>
</collection>
</scn>"""


def test_scn_selects_main_image_pyramid(tmp_path: Path):
    rng = np.random.default_rng(11)
    macro = _rand_rgb(rng, 100, 60)  # IFD0: whole-glass overview
    main = _rand_rgb(rng, 96, 128)  # IFD1/2: the scanned region pyramid
    low = main[::2, ::2].copy()

    xml = _scn_xml((60, 100), [(128, 96, 1), (64, 48, 2)], 40)
    w = TiffWriter()
    w.add_level(macro, description=xml)
    w.add_level(main, resolution=(40000.0, 40000.0, 3))
    w.add_level(low)
    path = tmp_path / "slide.scn"
    w.save(path)

    t = AtlasTiffFile(str(path))
    # The macro (IFD0) is excluded; the widest image's IFDs are the pyramid.
    assert t.level_count == 2
    assert t.level_dimensions == [(128, 96), (64, 48)]
    assert t.properties["atlas.vendor"] == "leica"
    assert t.properties["leica.objective"] == "40"
    np.testing.assert_array_equal(t.read_region_level(0, 0, 0, 128, 96), main)
    np.testing.assert_array_equal(t.read_region_level(1, 0, 0, 64, 48), low)
    t.close()

    wsi = TiffWSI(path=str(path))
    wsi._ensure_loaded()
    assert wsi.mag == 40  # from leica.objective, not the macro's 0.8
    assert (wsi.w, wsi.h) == (128, 96)
    assert wsi.mpp == 0.25  # resolution tags of the selected base level


def test_scn_single_image_collection(tmp_path: Path):
    rng = np.random.default_rng(12)
    main = _rand_rgb(rng, 64, 96)
    xml = _scn_xml((96, 64), [(96, 64, 0)], 20)
    # Collection with one image: IFD0 IS the main image (no macro stored).
    xml = xml.replace('<image name="region"', "<!-- no second image --><junk")
    w = TiffWriter()
    w.add_level(main, description=xml)
    path = tmp_path / "one.scn"
    w.save(path)
    t = AtlasTiffFile(str(path))
    assert t.level_count == 1
    assert t.level_dimensions == [(96, 64)]
    np.testing.assert_array_equal(t.read_region_level(0, 0, 0, 96, 64), main)
    t.close()


def test_generic_tiff_excludes_thumbnail_description(tmp_path: Path):
    rng = np.random.default_rng(13)
    main = _rand_rgb(rng, 96, 128)
    w = TiffWriter()
    w.add_level(main, tile=64)
    w.add_level(main[::2, ::2].copy(), tile=64, description="Thumbnail Image")
    w.add_level(main[::4, ::4].copy(), tile=64)
    path = tmp_path / "v.bif"
    w.save(path)
    t = AtlasTiffFile(str(path))
    assert t.level_count == 2  # the "Thumbnail Image" IFD is associated
    assert t.level_dimensions == [(128, 96), (32, 24)]
    t.close()


# ------------------------------------------- NDPI single-JPEG striped decode


def _jpeg_with_restarts(img, *, rows=None, blocks=None, subsampling=0, quality=95):
    import io

    from PIL import Image

    buf = io.BytesIO()
    kw = {"quality": quality, "subsampling": subsampling}
    if blocks is not None:
        kw["restart_marker_blocks"] = blocks
    else:
        kw["restart_marker_rows"] = rows
    Image.fromarray(img).save(buf, "JPEG", **kw)
    return buf.getvalue()


def _decode_jpeg(stream):
    import io

    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(stream)).convert("RGB"))


def _zero_sof_dims(jpeg: bytes) -> bytes:
    """Zero the SOF height/width — what NDPI writers emit beyond 65,535 px."""
    data = bytearray(jpeg)
    i = data.find(b"\xff\xc0")
    assert i >= 0
    data[i + 5 : i + 9] = b"\x00\x00\x00\x00"
    return bytes(data)


def _write_single_strip_ndpi(path, stream, w, h, lens=40.0):
    tw = TiffWriter()
    tw.add_level_raw_strips(
        [stream], width=w, height=h, rows_per_strip=h, extra_tags=_ndpi_tags(lens)
    )
    tw.save(path)


def test_ndpi_striped_decode_row_segments(tmp_path: Path):
    """Full-MCU-row restart segments (DRI == MCUs/row), 4:4:4: the striped
    path must reproduce a full libjpeg decode bit-exactly."""
    rng = np.random.default_rng(21)
    h, w = 120, 160
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    stream = _jpeg_with_restarts(img, rows=1, subsampling=0)
    ref = _decode_jpeg(stream)
    path = tmp_path / "giant.ndpi"
    _write_single_strip_ndpi(path, _zero_sof_dims(stream), w, h)

    t = AtlasTiffFile(str(path))
    assert t.level_dimensions == [(w, h)]
    np.testing.assert_array_equal(t.read_region_level(0, 0, 0, w, h), ref)
    # windows not aligned to MCU/segment boundaries
    np.testing.assert_array_equal(
        t.read_region_level(0, 37, 21, 64, 48), ref[21:69, 37:101]
    )
    np.testing.assert_array_equal(
        t.read_region_level(0, 0, 113, 160, 7), ref[113:120, :]
    )
    t.close()


def test_ndpi_striped_decode_subrow_segments(tmp_path: Path):
    """Sub-row restart segments (several per MCU row) — the layout giant-WIDTH
    images need, since a full MCU row would overflow JPEG's 16-bit width."""
    rng = np.random.default_rng(22)
    h, w = 64, 160
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    stream = _jpeg_with_restarts(img, blocks=2, subsampling=0)
    ref = _decode_jpeg(stream)
    path = tmp_path / "wide.ndpi"
    _write_single_strip_ndpi(path, _zero_sof_dims(stream), w, h)

    t = AtlasTiffFile(str(path))
    np.testing.assert_array_equal(t.read_region_level(0, 0, 0, w, h), ref)
    np.testing.assert_array_equal(
        t.read_region_level(0, 9, 5, 70, 33), ref[5:38, 9:79]
    )
    t.close()


def test_ndpi_striped_decode_420_chroma(tmp_path: Path):
    """4:2:0 subsampling: identical except a few LSBs of chroma interpolation
    along segment boundaries (no cross-segment neighbors for fancy
    upsampling)."""
    h, w = 96, 128
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            (xx * 255 / w).astype(np.uint8),
            (yy * 255 / h).astype(np.uint8),
            ((xx + yy) * 127 / (h + w)).astype(np.uint8),
        ],
        axis=-1,
    )
    stream = _jpeg_with_restarts(img, rows=1, subsampling=2)
    ref = _decode_jpeg(stream)
    path = tmp_path / "chroma.ndpi"
    _write_single_strip_ndpi(path, _zero_sof_dims(stream), w, h)

    t = AtlasTiffFile(str(path))
    out = t.read_region_level(0, 0, 0, w, h)
    diff = np.abs(out.astype(np.int16) - ref.astype(np.int16))
    assert diff.max() <= 8 and diff.mean() < 0.5
    t.close()


def test_ndpi_misaligned_restart_interval_sequential_fallback(tmp_path: Path):
    """Restart markers present at an interval striping cannot use (neither a
    whole number of MCU rows nor an even divisor of one): the sequential
    fallback must re-insert the DRI segment into its rebuilt header and
    decode bit-exactly. Regression: the DRI-less striped header made libjpeg
    treat every RSTn as corrupt data — silent garbage pixels past the first
    restart segment."""
    rng = np.random.default_rng(24)
    h, w = 96, 120  # 15 MCUs/row at 4:4:4; DRI=4 divides neither way
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    stream = _jpeg_with_restarts(img, blocks=4, subsampling=0)
    ref = _decode_jpeg(stream)
    path = tmp_path / "misaligned.ndpi"
    _write_single_strip_ndpi(path, _zero_sof_dims(stream), w, h)
    t = AtlasTiffFile(str(path))
    np.testing.assert_array_equal(t.read_region_level(0, 0, 0, w, h), ref)
    np.testing.assert_array_equal(
        t.read_region_level(0, 13, 41, 50, 20), ref[41:61, 13:63]
    )
    t.close()


def test_ndpi_no_restart_markers_sequential_fallback(tmp_path: Path):
    """A mismatched-SOF single-strip JPEG without restart markers decodes via
    the sequential row-capped fallback, bit-exact vs a full libjpeg decode."""
    rng = np.random.default_rng(23)
    h, w = 64, 80
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    import io

    from PIL import Image as PILImage

    buf = io.BytesIO()
    PILImage.fromarray(img).save(buf, "JPEG", quality=90, subsampling=0)
    stream = buf.getvalue()
    ref = _decode_jpeg(stream)
    path = tmp_path / "norst.ndpi"
    _write_single_strip_ndpi(path, _zero_sof_dims(stream), w, h)
    t = AtlasTiffFile(str(path))
    np.testing.assert_array_equal(t.read_region_level(0, 0, 0, w, h), ref)
    # windows: top-left-anchored and interior (rows before y0 are skipped)
    np.testing.assert_array_equal(t.read_region_level(0, 0, 0, 32, 16), ref[:16, :32])
    np.testing.assert_array_equal(
        t.read_region_level(0, 13, 41, 50, 20), ref[41:61, 13:63]
    )
    t.close()


def test_ndpi_striped_fuzz(tmp_path: Path):
    """Random byte corruption of a striped-JPEG NDPI must raise clean Python
    exceptions (or decode) — never hang or crash the process."""
    rng = np.random.default_rng(31)
    h, w = 64, 96
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    stream = _zero_sof_dims(_jpeg_with_restarts(img, rows=1, subsampling=0))
    path = tmp_path / "fuzz.ndpi"
    _write_single_strip_ndpi(path, stream, w, h)
    original = path.read_bytes()

    for _ in range(40):
        raw = bytearray(original)
        for _ in range(int(rng.integers(1, 8))):
            raw[int(rng.integers(0, len(raw)))] = int(rng.integers(0, 256))
        path.write_bytes(bytes(raw))
        try:
            t = AtlasTiffFile(str(path))
            t.read_region_level(0, 0, 0, min(32, w), min(32, h))
            t.close()
        except Exception:
            pass  # any clean Python exception is acceptable

    # Truncations — mid-entropy, mid-header, mid-IFD.
    for cut in (len(original) * 3 // 4, len(original) // 2, 64):
        path.write_bytes(original[:cut])
        try:
            t = AtlasTiffFile(str(path))
            t.read_region_level(0, 0, 0, w, h)
            t.close()
        except Exception:
            pass


def test_single_strip_progressive_jpeg_uses_normal_path(tmp_path: Path):
    """A progressive single-strip JPEG with correct dims must decode through
    the plain libjpeg path — the striped header probe cannot parse it, and
    that must NOT be treated as a dimension mismatch."""
    import io

    from PIL import Image as PILImage

    rng = np.random.default_rng(41)
    h, w = 48, 64
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    buf = io.BytesIO()
    PILImage.fromarray(img).save(buf, "JPEG", quality=92, progressive=True)
    tw = TiffWriter()
    tw.add_level_raw_strips([buf.getvalue()], width=w, height=h, rows_per_strip=h)
    path = tmp_path / "prog.tif"
    tw.save(path)
    t = AtlasTiffFile(str(path))
    ref = _decode_jpeg(buf.getvalue())
    np.testing.assert_array_equal(t.read_region_level(0, 0, 0, w, h), ref)
    t.close()


def test_single_strip_with_restarts_and_correct_dims_normal_path(tmp_path: Path):
    """Correct SOF dims + DRI present: ordinary decode, no striping needed."""
    rng = np.random.default_rng(42)
    h, w = 48, 64
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    stream = _jpeg_with_restarts(img, rows=1, subsampling=0)
    tw = TiffWriter()
    tw.add_level_raw_strips([stream], width=w, height=h, rows_per_strip=h)
    path = tmp_path / "plain.tif"
    tw.save(path)
    t = AtlasTiffFile(str(path))
    np.testing.assert_array_equal(
        t.read_region_level(0, 0, 0, w, h), _decode_jpeg(stream)
    )
    t.close()


def test_generic_huge_single_strip_bitexact_sequential(tmp_path: Path, monkeypatch):
    """A generic (non-NDPI) single-strip JPEG past the 'huge' size trigger
    with CORRECT SOF dims must decode bit-exactly: the row-capped sequential
    path is preferred over striping (whose standalone 4:2:0 segments can
    drift a few LSBs at boundaries) and over the whole-strip decode (which
    allocates the full level). Threshold shrunk via env so a test-sized file
    exercises the >1 GiB branch."""
    monkeypatch.setenv("ATLASPATCH_TIFF_HUGE_BYTES", "1000")
    h, w = 96, 128
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            (xx * 255 / w).astype(np.uint8),
            (yy * 255 / h).astype(np.uint8),
            ((xx + yy) * 127 / (h + w)).astype(np.uint8),
        ],
        axis=-1,
    )
    # 4:2:0 with per-row restarts: the regime where striping is NOT bit-exact
    stream = _jpeg_with_restarts(img, rows=1, subsampling=2)
    ref = _decode_jpeg(stream)
    tw = TiffWriter()
    tw.add_level_raw_strips([stream], width=w, height=h, rows_per_strip=h)
    path = tmp_path / "big_plain.tif"
    tw.save(path)
    t = AtlasTiffFile(str(path))
    np.testing.assert_array_equal(t.read_region_level(0, 0, 0, w, h), ref)
    np.testing.assert_array_equal(
        t.read_region_level(0, 13, 41, 50, 20), ref[41:61, 13:63]
    )
    # no-restart-marker stream through the same size trigger: sequential too
    import io

    from PIL import Image as PILImage

    buf = io.BytesIO()
    PILImage.fromarray(img).save(buf, "JPEG", quality=90, subsampling=2)
    plain = buf.getvalue()
    tw2 = TiffWriter()
    tw2.add_level_raw_strips([plain], width=w, height=h, rows_per_strip=h)
    path2 = tmp_path / "big_plain_nodri.tif"
    tw2.save(path2)
    t2 = AtlasTiffFile(str(path2))
    np.testing.assert_array_equal(
        t2.read_region_level(0, 0, 0, w, h), _decode_jpeg(plain)
    )
    t2.close()
    t.close()


def test_striped_grayscale_min_is_white_inverts(tmp_path: Path):
    """Striped decode applies the MinIsWhite inversion like the generic
    chunk path."""
    import io

    from PIL import Image as PILImage

    rng = np.random.default_rng(43)
    h, w = 32, 48
    gray = rng.integers(0, 256, (h, w), dtype=np.uint8)
    buf = io.BytesIO()
    PILImage.fromarray(gray, mode="L").save(
        buf, "JPEG", quality=95, restart_marker_rows=1
    )
    stream = _zero_sof_dims(buf.getvalue())
    ref = _decode_jpeg(buf.getvalue())  # libjpeg gray→RGB of the same stream
    for photometric, expect in ((1, ref), (0, 255 - ref)):
        tw = TiffWriter()
        tw.add_level_raw_strips(
            [stream], width=w, height=h, rows_per_strip=h, spp=1,
            extra_tags=[(262, 3, [photometric])],  # SHORT overrides default
        )
        path = tmp_path / f"gray{photometric}.ndpi"
        tw.save(path)
        t = AtlasTiffFile(str(path))
        np.testing.assert_array_equal(t.read_region_level(0, 0, 0, w, h), expect)
        t.close()


def test_striped_decode_rescans_on_wrapped_byte_count(tmp_path: Path):
    """NDPI >4 GiB files wrap StripByteCounts like offsets; an undercounted
    strip must trigger the rescan-to-file-end fallback (the entropy scan
    stops at EOI, so the generous window stays correct)."""
    rng = np.random.default_rng(44)
    h, w = 96, 128
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    stream = _jpeg_with_restarts(img, rows=1, subsampling=0)
    ref = _decode_jpeg(stream)
    path = tmp_path / "wrapped.ndpi"
    _write_single_strip_ndpi(path, _zero_sof_dims(stream), w, h)

    # Halve the stored byte count — the scan window truncates mid-entropy.
    raw = bytearray(path.read_bytes())
    ifd_off = struct.unpack_from("<I", raw, 4)[0]
    n = struct.unpack_from("<H", raw, ifd_off)[0]
    for i in range(n):
        at = ifd_off + 2 + 12 * i
        tag, typ, cnt, val = struct.unpack_from("<HHII", raw, at)
        if tag == 279:  # StripByteCounts, single LONG inline
            struct.pack_into("<I", raw, at + 8, val // 2)
    path.write_bytes(bytes(raw))

    t = AtlasTiffFile(str(path))
    np.testing.assert_array_equal(t.read_region_level(0, 0, 0, w, h), ref)
    t.close()


# ------------------------------------------------- Ventana BIF / Philips TIFF

TYPE_ASCII = 2

BIF_XMP = (
    '<?xpacket begin="" id="W5M0MpCehiHzreSzNTczkc9d"?>'
    '<x:xmpmeta xmlns:x="adobe:ns:meta/"><rdf:RDF>'
    '<iScan xmlns="http://ventana.com/iscan/1.0" UnitNumber="1" '
    'CoarseMagnification="4" Magnification="40" ScanRes="0.25" />'
    "</rdf:RDF></x:xmpmeta><?xpacket end=\"w\"?>"
)


def test_ventana_bif_levels_and_metadata(tmp_path: Path):
    """Ventana/Roche BIF (openslide.org/formats/ventana): directory 0 is a
    striped overview; the full-resolution image is the largest TILED
    directory. Magnification/ScanRes come from the iScan element in XMP
    (tag 700). The decoy CoarseMagnification attribute must not match."""
    rng = np.random.default_rng(51)
    overview = _rand_rgb(rng, 48, 64)
    main = _rand_rgb(rng, 192, 256)
    low = main[::2, ::2].copy()
    label = _rand_rgb(rng, 40, 100)

    w = TiffWriter()
    w.add_level(overview, extra_tags=[(700, TYPE_ASCII, [BIF_XMP])])
    w.add_level(main, tile=128)
    w.add_level(low, tile=128)
    w.add_level(label, description="Label Image")
    path = tmp_path / "slide.bif"
    w.save(path)

    t = AtlasTiffFile(str(path))
    assert t.level_count == 2
    assert t.level_dimensions == [(256, 192), (128, 96)]
    assert t.properties["atlas.vendor"] == "ventana"
    assert t.properties["ventana.Magnification"] == "40"
    assert t.properties["ventana.ScanRes"] == "0.25"
    np.testing.assert_array_equal(t.read_region_level(0, 0, 0, 256, 192), main)
    np.testing.assert_array_equal(t.read_region_level(1, 0, 0, 128, 96), low)
    t.close()

    wsi = TiffWSI(path=str(path))
    wsi._ensure_loaded()
    assert wsi.mag == 40
    assert wsi.mpp == 0.25


def test_ventana_bif_without_overview_keeps_ifd0_base(tmp_path: Path):
    """A BIF whose first directory IS the tiled full-res image must behave
    exactly like a generic pyramid (base selection is a no-op)."""
    rng = np.random.default_rng(52)
    main = _rand_rgb(rng, 128, 192)
    low = main[::2, ::2].copy()
    w = TiffWriter()
    w.add_level(main, tile=64, extra_tags=[(700, TYPE_ASCII, [BIF_XMP])])
    w.add_level(low, tile=64)
    path = tmp_path / "flat.bif"
    w.save(path)

    t = AtlasTiffFile(str(path))
    assert t.level_dimensions == [(192, 128), (96, 64)]
    assert t.properties["atlas.vendor"] == "ventana"
    np.testing.assert_array_equal(t.read_region_level(0, 0, 0, 192, 128), main)
    t.close()


def _bif_joint_xmp(joints: list[tuple[str, float, float, float]]) -> str:
    """BIF XMP with an iScan element plus AoiJoinInfo TileJointInfo elements.

    joints: (direction, confidence, overlap_x, overlap_y) per element, the
    layout the Ventana stitcher writes (openslide.org/formats/ventana)."""
    els = "".join(
        f'<TileJointInfo Tile1="{i + 1}" Tile2="{i + 2}" Direction="{d}" '
        f'Confidence="{conf}" OverlapX="{ox}" OverlapY="{oy}" />'
        for i, (d, conf, ox, oy) in enumerate(joints)
    )
    return (
        '<?xpacket begin="" id="W5M0MpCehiHzreSzNTczkc9d"?>'
        '<x:xmpmeta xmlns:x="adobe:ns:meta/"><rdf:RDF>'
        '<iScan xmlns="http://ventana.com/iscan/1.0" UnitNumber="1" '
        'Magnification="40" ScanRes="0.25" />'
        f"<AoiJoinInfo>{els}</AoiJoinInfo>"
        "</rdf:RDF></x:xmpmeta><?xpacket end=\"w\"?>"
    )


def _overlapping_bif(tmp_path: Path, *, tile=64, overlap=16, cols=4, rows=3,
                     joints=None, seed=53):
    """Build a BIF whose base tiles overlap by `overlap` px: tiles are cut at
    `tile - overlap` advances from one ground-truth canvas, then each tile's
    non-visible strips (the parts a right/lower neighbour overwrites) are
    corrupted so the test proves both placement AND paint order."""
    rng = np.random.default_rng(seed)
    adv = tile - overlap
    tw = (cols - 1) * adv + tile  # corrected canvas
    th_ = (rows - 1) * adv + tile
    truth = _rand_rgb(rng, th_, tw)

    mosaic = np.zeros((rows * tile, cols * tile, 3), np.uint8)
    for r in range(rows):
        for c in range(cols):
            t = truth[r * adv : r * adv + tile, c * adv : c * adv + tile].copy()
            # A neighbour's overlap strip wins the paint; junk here must
            # never surface in reads.
            if c < cols - 1:
                t[:, adv:] = rng.integers(0, 256, (tile, overlap, 3), np.uint8)
            if r < rows - 1:
                t[adv:, :] = rng.integers(0, 256, (overlap, tile, 3), np.uint8)
            mosaic[r * tile : (r + 1) * tile, c * tile : (c + 1) * tile] = t

    if joints is None:
        joints = [
            ("RIGHT", 99, overlap - 0.5, 0.3),
            ("RIGHT", 97, overlap + 0.5, -0.1),
            ("UP", 98, 0.2, overlap + 0.25),
            ("UP", 96, -0.4, overlap - 0.25),
            # Unmatched joint: the stitcher writes Confidence 0 with junk
            # overlaps; it must not skew the means.
            ("RIGHT", 0, tile - 1, tile - 1),
        ]
    xmp = _bif_joint_xmp(joints)

    overview = _rand_rgb(rng, 48, 64)
    low = truth[::2, ::2].copy()
    w = TiffWriter()
    w.add_level(overview, extra_tags=[(700, TYPE_ASCII, [xmp])])
    w.add_level(mosaic, tile=tile)
    w.add_level(low, tile=tile)
    path = tmp_path / "aoi.bif"
    w.save(path)
    return path, truth, low


def test_ventana_bif_aoi_join_overlap_correction(tmp_path: Path):
    """TileJointInfo join overlaps (openslide.org/formats/ventana): the base
    level's tiles overlap by the mean measured overlap per axis; the decoder
    must report the stitched canvas size and paint tiles at the corrected
    advances with the right/lower tile winning each overlap strip."""
    path, truth, low = _overlapping_bif(tmp_path)
    th_, tw = truth.shape[:2]  # 160 x 208: 4x3 tiles of 64, advance 48

    t = AtlasTiffFile(str(path))
    assert t.level_dimensions == [(tw, th_), (tw // 2, th_ // 2)]
    assert t.properties["ventana.OverlapX"] == "16"
    assert t.properties["ventana.OverlapY"] == "16"
    np.testing.assert_array_equal(t.read_region_level(0, 0, 0, tw, th_), truth)
    # Windows crossing tile seams and overlap strips, plus out-of-bounds pad.
    np.testing.assert_array_equal(
        t.read_region_level(0, 40, 40, 60, 60), truth[40:100, 40:100]
    )
    np.testing.assert_array_equal(
        t.read_region_level(0, 90, 130, 30, 20), truth[130:150, 90:120]
    )
    edge = t.read_region_level(0, tw - 10, th_ - 5, 20, 10)
    np.testing.assert_array_equal(edge[:5, :10], truth[th_ - 5 :, tw - 10 :])
    assert (edge[5:] == 0).all() and (edge[:, 10:] == 0).all()
    # The scaled fast path assumes an abutting grid; corrected levels must
    # fall back (None) rather than decode at wrong positions.
    assert t.read_region_level_scaled(0, 0, 0, tw, th_, 2) is None
    # Lower levels are stored pre-stitched: no correction there.
    np.testing.assert_array_equal(
        t.read_region_level(1, 0, 0, tw // 2, th_ // 2), low
    )
    t.close()


def test_ventana_bif_multi_aoi_pins_single_grid_approximation(tmp_path: Path):
    """Multi-AOI BIF baseline (VERDICT r3 #9): real Ventana slides group
    TileJointInfo under per-AOI <AreaOfInterest> elements, each AOI with its
    own origin. Without vendor files the per-AOI origins are NOT modeled
    (docs/PARITY.md row 6): the decoder pools every joint into one mean
    overlap per axis and corrects the base as a single uniform grid. This
    test pins that documented approximation on an XMP with two AreaOfInterest
    groups, so any future vendor-file-driven per-AOI fix diffs against a
    recorded baseline rather than silence."""
    tile, overlap = 64, 16
    # Two AOI groups whose joints AVERAGE to (16, 16): AOI1 measures slightly
    # under, AOI2 slightly over. Pooled mean = 16 exactly.
    aoi1 = (
        '<AreaOfInterest Id="1" OriginX="0" OriginY="0">'
        '<TileJointInfo Tile1="1" Tile2="2" Direction="RIGHT" Confidence="99" '
        'OverlapX="15.5" OverlapY="0.2" />'
        '<TileJointInfo Tile1="1" Tile2="5" Direction="UP" Confidence="98" '
        'OverlapX="0.1" OverlapY="15.75" />'
        "</AreaOfInterest>"
    )
    aoi2 = (
        '<AreaOfInterest Id="2" OriginX="4096" OriginY="0">'
        '<TileJointInfo Tile1="7" Tile2="8" Direction="RIGHT" Confidence="97" '
        'OverlapX="16.5" OverlapY="-0.2" />'
        '<TileJointInfo Tile1="7" Tile2="11" Direction="UP" Confidence="96" '
        'OverlapX="-0.1" OverlapY="16.25" />'
        "</AreaOfInterest>"
    )
    xmp = (
        '<?xpacket begin="" id="W5M0MpCehiHzreSzNTczkc9d"?>'
        '<x:xmpmeta xmlns:x="adobe:ns:meta/"><rdf:RDF>'
        '<iScan xmlns="http://ventana.com/iscan/1.0" UnitNumber="1" '
        'Magnification="40" ScanRes="0.25" />'
        f"<AoiJoinInfo>{aoi1}{aoi2}</AoiJoinInfo>"
        "</rdf:RDF></x:xmpmeta><?xpacket end=\"w\"?>"
    )

    # Mosaic built to the single-grid interpretation: uniform 48-px advances.
    rng = np.random.default_rng(57)
    cols, rows = 4, 3
    adv = tile - overlap
    tw, th_ = (cols - 1) * adv + tile, (rows - 1) * adv + tile
    truth = _rand_rgb(rng, th_, tw)
    mosaic = np.zeros((rows * tile, cols * tile, 3), np.uint8)
    for r in range(rows):
        for c in range(cols):
            blk = truth[r * adv : r * adv + tile, c * adv : c * adv + tile].copy()
            if c < cols - 1:
                blk[:, adv:] = rng.integers(0, 256, (tile, overlap, 3), np.uint8)
            if r < rows - 1:
                blk[adv:, :] = rng.integers(0, 256, (overlap, tile, 3), np.uint8)
            mosaic[r * tile : (r + 1) * tile, c * tile : (c + 1) * tile] = blk

    overview = _rand_rgb(rng, 48, 64)
    w = TiffWriter()
    w.add_level(overview, extra_tags=[(700, TYPE_ASCII, [xmp])])
    w.add_level(mosaic, tile=tile)
    path = tmp_path / "multiaoi.bif"
    w.save(path)

    t = AtlasTiffFile(str(path))
    # PINNED approximation: all four joints pool into mean (16, 16) and the
    # whole base is corrected as one grid — per-AOI origins ignored.
    assert t.properties["atlas.vendor"] == "ventana"
    assert t.properties["ventana.OverlapX"] == "16"
    assert t.properties["ventana.OverlapY"] == "16"
    assert t.level_dimensions[0] == (tw, th_)
    np.testing.assert_array_equal(t.read_region_level(0, 0, 0, tw, th_), truth)
    t.close()


def test_ventana_bif_insane_overlap_keeps_abutting_grid(tmp_path: Path):
    """Overlaps ≥ tile−1 (sub-pixel advances) or ≤ 0 are junk — the base must
    stay the plain abutting mosaic rather than collapse or explode the
    canvas. 63.5 of a 64-px tile leaves a 0.5-px advance, where the painter's
    first-tile estimate is no longer exact; it must be rejected too."""
    for ox, oy in [(64, 64), (63.5, 63.5), (-3, -3), (0, 0), (400, 400)]:
        joints = [("RIGHT", 99, ox, 0), ("UP", 99, 0, oy)]
        path, truth, _ = _overlapping_bif(
            tmp_path, joints=joints, seed=54 + int(ox) % 7
        )
        t = AtlasTiffFile(str(path))
        # 4 cols x 3 rows of 64-px tiles, uncorrected.
        assert t.level_dimensions[0] == (256, 192)
        t.close()
        path.unlink()


PHILIPS_XML = (
    '<DataObject ObjectType="DPUfsImport">'
    '<Attribute Name="PIM_DP_IMAGE_TYPE" PMSVR="IString">WSI</Attribute>'
    '<Attribute Name="DICOM_PIXEL_SPACING" Group="0x0028" Element="0x0030" '
    'PMSVR="IDoubleArray">&quot;0.00025&quot; &quot;0.00025&quot;</Attribute>'
    "</DataObject>"
)


def test_philips_tiff_mpp_and_levels(tmp_path: Path):
    """Philips TIFF (openslide.org/formats/philips): Software tag starts with
    "Philips"; pixel spacing comes from the DICOM_PIXEL_SPACING attribute in
    IFD0's UFS XML (mm → µm). Label/macro directories are excluded."""
    rng = np.random.default_rng(53)
    main = _rand_rgb(rng, 192, 256)
    low = main[::2, ::2].copy()
    label = _rand_rgb(rng, 40, 100)

    w = TiffWriter()
    w.add_level(
        main,
        tile=128,
        description=PHILIPS_XML,
        extra_tags=[(305, TYPE_ASCII, ["Philips DP v1.0"])],
    )
    w.add_level(low, tile=128)
    w.add_level(label, description="Philips label image LABELIMAGE")
    path = tmp_path / "slide.tiff"
    w.save(path)

    t = AtlasTiffFile(str(path))
    assert t.level_count == 2
    assert t.level_dimensions == [(256, 192), (128, 96)]
    assert t.properties["atlas.vendor"] == "philips"
    assert t.properties["philips.PixelSpacing"] == "0.25"
    np.testing.assert_array_equal(t.read_region_level(0, 0, 0, 256, 192), main)
    t.close()

    wsi = TiffWSI(path=str(path))
    wsi._ensure_loaded()
    assert wsi.mpp == 0.25
    assert wsi.metadata_attrs().get("vendor") == "philips"


@pytest.mark.parametrize(
    "xmp",
    [
        "<iScan",  # element open with nothing after it
        '<iScan Magnification=',  # attribute with no quote at all
        '<iScan Magnification="40',  # unterminated quoted value
        '<iScan Magnification="" ScanRes="">',  # empty values
        '<iScan CoarseMagnification="4">',  # decoy only — no real attrs
        '<iScan Magnification="1e308" ScanRes="-0.25">',  # absurd numbers
        "x" * 70000 + "<iScan " + 'Magnification="40">',  # attr past 64 KiB
        '<iScan\x00Magnification="40">',  # NUL truncates the ASCII blob
        # Joint-parser adversaries: unterminated element, non-finite and
        # absurd overlaps, a flood of joints (linear scan must stay linear),
        # junk directions, attributes with no quotes.
        '<iScan Magnification="40"/><TileJointInfo Direction="RIGHT" OverlapX="12',
        '<iScan/>' + '<TileJointInfo Direction="RIGHT" OverlapX="nan" '
        'OverlapY="inf" Confidence="99"/>' * 3,
        '<iScan/>' + '<TileJointInfo Direction="SIDEWAYS" OverlapX="1e308"/>' * 5,
        '<iScan/>'
        + '<TileJointInfo Direction="RIGHT" OverlapX="8" Confidence="0"/>' * 5000,
        '<iScan/><TileJointInfo Direction= OverlapX=8>',
        '<iScan/><TileJointInfo ' + "A" * 70000,  # unterminated + huge attrs
    ],
)
def test_ventana_xmp_adversarial_never_crashes(tmp_path: Path, xmp: str):
    """Malformed iScan XMP packets must never crash or hang the parser —
    the file still opens as a generic pyramid and reads correctly."""
    rng = np.random.default_rng(54)
    main = _rand_rgb(rng, 64, 96)
    w = TiffWriter()
    w.add_level(main, tile=64, extra_tags=[(700, TYPE_ASCII, [xmp])])
    path = tmp_path / "weird.bif"
    w.save(path)

    t = AtlasTiffFile(str(path))
    assert t.level_count == 1
    t.properties  # property build must not crash either
    np.testing.assert_array_equal(t.read_region_level(0, 0, 0, 96, 64), main)
    t.close()


@pytest.mark.parametrize(
    "xml",
    [
        '"DICOM_PIXEL_SPACING"',  # attribute name with nothing after it
        '<Attribute Name="DICOM_PIXEL_SPACING"',  # element never closed
        '<Attribute Name="DICOM_PIXEL_SPACING"></Attribute>',  # empty value
        '<Attribute Name="DICOM_PIXEL_SPACING">no digits here</Attribute>',
        '<Attribute Name="DICOM_PIXEL_SPACING">&quot;-3&quot;</Attribute>',
        '<Attribute Name="DICOM_PIXEL_SPACING">' + "." * 5000 + "</Attribute>",
    ],
)
def test_philips_xml_adversarial_never_crashes(tmp_path: Path, xml: str):
    """Malformed Philips UFS XML must never crash: the slide opens, is
    detected as Philips (Software tag), and simply reports no MPP."""
    rng = np.random.default_rng(55)
    main = _rand_rgb(rng, 64, 96)
    w = TiffWriter()
    w.add_level(
        main,
        tile=64,
        description=xml,
        extra_tags=[(305, TYPE_ASCII, ["Philips DP v1.0"])],
    )
    path = tmp_path / "weird.tiff"
    w.save(path)

    t = AtlasTiffFile(str(path))
    assert t.properties["atlas.vendor"] == "philips"
    assert "philips.PixelSpacing" not in t.properties
    np.testing.assert_array_equal(t.read_region_level(0, 0, 0, 96, 64), main)
    t.close()


def test_bif_random_corruption_never_hangs(tmp_path: Path):
    """Byte-level corruption of a BIF (striped overview + tiled base + XMP)
    must either decode or raise a clean Python exception."""
    rng = np.random.default_rng(56)
    overview = _rand_rgb(rng, 24, 32)
    main = _rand_rgb(rng, 96, 128)
    w = TiffWriter()
    w.add_level(overview, extra_tags=[(700, TYPE_ASCII, [BIF_XMP])])
    w.add_level(main, tile=64)
    path = tmp_path / "fuzz.bif"
    w.save(path)
    original = path.read_bytes()

    for _ in range(40):
        raw = bytearray(original)
        for _ in range(int(rng.integers(1, 12))):
            raw[int(rng.integers(0, len(raw)))] = int(rng.integers(0, 256))
        path.write_bytes(bytes(raw))
        try:
            t = AtlasTiffFile(str(path))
            t.properties
            t.read_region_level(0, 0, 0, 32, 32)
            t.close()
        except Exception:
            pass  # clean rejection is the contract

    for cut in (len(original) * 3 // 4, len(original) // 2, 64):
        path.write_bytes(original[:cut])
        try:
            t = AtlasTiffFile(str(path))
            t.properties
            t.close()
        except Exception:
            pass


def test_generic_tiff_base_stays_ifd0_without_iscan(tmp_path: Path):
    """The BIF base rescan is gated on iScan detection: a generic multi-image
    TIFF whose SECOND directory is a larger tiled image (different aspect,
    e.g. an unrelated series) must still open IFD0 as the slide."""
    rng = np.random.default_rng(57)
    main = _rand_rgb(rng, 96, 128)
    intruder = _rand_rgb(rng, 256, 160)  # larger area, different aspect
    w = TiffWriter()
    w.add_level(main)  # striped full-res at IFD0, TIFF convention
    w.add_level(intruder, tile=64)
    path = tmp_path / "generic.tiff"
    w.save(path)

    t = AtlasTiffFile(str(path))
    assert t.level_dimensions[0] == (128, 96)
    np.testing.assert_array_equal(t.read_region_level(0, 0, 0, 128, 96), main)
    t.close()


def test_thumbnail_first_striped_pyramid_still_opens_full_res(tmp_path: Path):
    """A non-Aperio TIFF with a small thumbnail at IFD0 and the striped
    full-resolution image after it (same aspect) must open at full
    resolution — the width-descending sort promotes the larger directory."""
    rng = np.random.default_rng(58)
    full = _rand_rgb(rng, 128, 192)
    thumb = full[::4, ::4].copy()
    w = TiffWriter()
    w.add_level(thumb)
    w.add_level(full)  # striped, larger, same aspect
    path = tmp_path / "thumbfirst.tiff"
    w.save(path)

    t = AtlasTiffFile(str(path))
    assert t.level_dimensions[0] == (192, 128)
    np.testing.assert_array_equal(t.read_region_level(0, 0, 0, 192, 128), full)
    t.close()


def test_iscan_prefix_needs_delimiter(tmp_path: Path):
    """<iScanSettings …> (a name that merely starts with iScan) must not
    classify the file as Ventana."""
    rng = np.random.default_rng(59)
    main = _rand_rgb(rng, 64, 96)
    xmp = '<iScanSettings Magnification="4" ScanRes="9.9"/>'
    w = TiffWriter()
    w.add_level(main, tile=64, extra_tags=[(700, TYPE_ASCII, [xmp])])
    path = tmp_path / "notventana.tiff"
    w.save(path)

    t = AtlasTiffFile(str(path))
    assert "atlas.vendor" not in t.properties or t.properties["atlas.vendor"] != "ventana"
    assert "ventana.Magnification" not in t.properties
    t.close()


def test_sequential_decode_rejects_real_sof_width_mismatch(tmp_path: Path):
    """A single-strip JPEG WITHOUT restart markers whose real (non-zero) SOF
    width disagrees with the TIFF tags must raise — patching the SOF over a
    genuinely different width would unwrap MCU rows at the wrong count and
    return scrambled pixels."""
    import io as _io

    from PIL import Image as _Image

    rng = np.random.default_rng(60)
    img = rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)
    buf = _io.BytesIO()
    _Image.fromarray(img).save(buf, "JPEG", quality=95, subsampling=0)  # no DRI
    path = tmp_path / "mismatch.ndpi"
    # TIFF tags claim 128 px wide; the JPEG's SOF says 96 and stays intact.
    _write_single_strip_ndpi(path, buf.getvalue(), 128, 64)

    t = AtlasTiffFile(str(path))
    with pytest.raises(Exception):
        t.read_region_level(0, 0, 0, 128, 64)
    t.close()


def test_point_polygon_test_empty_polygon_all_outside():
    """Empty/degenerate polygons report every probe as outside (-1) on both
    the native and numpy paths instead of raising."""
    from atlaspatch_tpu.ops.polygon import point_polygon_test

    pts = np.array([[0, 0], [5, 5]], dtype=np.int64)
    for poly in (np.empty((0, 2), np.int64), np.empty((0, 1, 2), np.int32)):
        out = point_polygon_test(poly, pts)
        np.testing.assert_array_equal(out, np.array([-1, -1], np.int8))


# --- Trestle .tif (openslide.org/formats/trestle) ---------------------------
# Software tag "MedScan"; IFD0's ImageDescription is ';'-separated key=value
# pairs. OverlapsXY gives per-level (x, y) tile overlaps in that level's own
# pixels: adjacent tiles share that many pixels, so every level's stitched
# canvas is smaller than its raw tile mosaic. The reference reads these files
# through OpenSlide's trestle driver via the generic .tif mapping
# (reference: atlas_patch/core/wsi/wsi_factory.py:22).


def _trestle_mosaic(truth, tile, ox, oy, raw_w, raw_h, rng):
    """Cut a raw (raw_h, raw_w) tile mosaic from a stitched ground-truth
    canvas with tile advances (tile-ox, tile-oy); corrupt each tile's hidden
    strips (the parts a right/lower neighbour overwrites) so a passing read
    proves both placement AND paint order."""
    adv_x, adv_y = tile - ox, tile - oy
    cols, rows = -(-raw_w // tile), -(-raw_h // tile)
    mosaic = np.zeros((raw_h, raw_w, 3), np.uint8)
    for r in range(rows):
        y0, vh = r * tile, min(tile, raw_h - r * tile)
        for c in range(cols):
            x0, vw = c * tile, min(tile, raw_w - c * tile)
            block = truth[r * adv_y : r * adv_y + vh, c * adv_x : c * adv_x + vw].copy()
            if c < cols - 1 and vw > adv_x:
                block[:, adv_x:] = rng.integers(0, 256, (vh, vw - adv_x, 3), np.uint8)
            if r < rows - 1 and vh > adv_y:
                block[adv_y:] = rng.integers(0, 256, (vh - adv_y, vw, 3), np.uint8)
            mosaic[y0 : y0 + vh, x0 : x0 + vw] = block
    return mosaic


def test_trestle_overlaps_levels_and_metadata(tmp_path: Path):
    """Every level is overlap-corrected by its own OverlapsXY pair: level 0
    (16, 8) shrinks 256x192 raw to a 208x176 canvas; level 1 (8, 12) shrinks
    112x100 raw to the half-res 104x88 canvas. Objective Power feeds mag."""
    rng = np.random.default_rng(71)
    tile = 64
    truth0 = _rand_rgb(rng, 176, 208)
    m0 = _trestle_mosaic(truth0, tile, 16, 8, 256, 192, rng)
    truth1 = truth0[::2, ::2].copy()
    m1 = _trestle_mosaic(truth1, tile, 8, 12, 112, 100, rng)

    desc = "Background Color=FFFFFF;OverlapsXY=16 8 8 12;Objective Power=20"
    w = TiffWriter()
    w.add_level(m0, tile=tile, description=desc,
                extra_tags=[(305, TYPE_ASCII, ["MedScan by Trestle"])])
    w.add_level(m1, tile=tile)
    path = tmp_path / "slide.tif"
    w.save(path)

    t = AtlasTiffFile(str(path))
    assert t.level_dimensions == [(208, 176), (104, 88)]
    assert t.properties["atlas.vendor"] == "trestle"
    assert t.properties["trestle.Objective Power"] == "20"
    assert t.properties["trestle.OverlapsXY"] == "16 8 8 12"
    np.testing.assert_array_equal(t.read_region_level(0, 0, 0, 208, 176), truth0)
    np.testing.assert_array_equal(t.read_region_level(1, 0, 0, 104, 88), truth1)
    # Windows crossing tile seams and overlap strips on both levels.
    np.testing.assert_array_equal(
        t.read_region_level(0, 40, 50, 60, 30), truth0[50:80, 40:100]
    )
    np.testing.assert_array_equal(
        t.read_region_level(1, 50, 40, 40, 40), truth1[40:80, 50:90]
    )
    # The DCT-scaled fast path assumes an abutting grid; corrected levels
    # must fall back (None) rather than decode at wrong positions.
    assert t.read_region_level_scaled(0, 0, 0, 208, 176, 2) is None
    t.close()

    wsi = TiffWSI(path=str(path))
    wsi._ensure_loaded()
    assert wsi.mag == 20


def test_trestle_without_overlaps_is_plain_grid(tmp_path: Path):
    """MedScan software but no OverlapsXY key: a plain abutting pyramid with
    trestle metadata only."""
    rng = np.random.default_rng(72)
    img = _rand_rgb(rng, 128, 192)
    w = TiffWriter()
    w.add_level(img, tile=64, description="JPEG Quality=75",
                extra_tags=[(305, TYPE_ASCII, ["MedScan"])])
    path = tmp_path / "plain.tif"
    w.save(path)
    t = AtlasTiffFile(str(path))
    assert t.properties["atlas.vendor"] == "trestle"
    assert t.level_dimensions == [(192, 128)]
    np.testing.assert_array_equal(t.read_region_level(0, 0, 0, 192, 128), img)
    t.close()


def test_trestle_junk_overlaps_keep_abutting_grid(tmp_path: Path):
    """Overlaps that are zero, >= tile size, absurd, non-numeric, or an odd
    count must leave the raw abutting mosaic untouched."""
    rng = np.random.default_rng(73)
    img = _rand_rgb(rng, 128, 192)
    for desc in (
        "OverlapsXY=64 64",
        "OverlapsXY=0 0",
        "OverlapsXY=9999999 1",
        "OverlapsXY=banana",
        "OverlapsXY=16",
    ):
        w = TiffWriter()
        w.add_level(img, tile=64, description=desc,
                    extra_tags=[(305, TYPE_ASCII, ["MedScan x"])])
        path = tmp_path / "junk.tif"
        w.save(path)
        t = AtlasTiffFile(str(path))
        assert t.level_dimensions[0] == (192, 128)
        np.testing.assert_array_equal(t.read_region_level(0, 0, 0, 192, 128), img)
        t.close()
        path.unlink()


def test_trestle_duplicate_overlaps_key_first_wins(tmp_path: Path):
    """Only the FIRST OverlapsXY key applies: a duplicate key must neither
    concatenate onto the first one's pairs nor repopulate the vector after a
    junk value cleared it (advisor r3)."""
    rng = np.random.default_rng(75)
    tile = 64
    truth = _rand_rgb(rng, 120, 160)
    m = _trestle_mosaic(truth, tile, 16, 8, 192, 128, rng)

    # First key applies (16, 8); the duplicate (4 4) is ignored entirely —
    # with concatenation level 1 would wrongly consume (4, 4).
    w = TiffWriter()
    w.add_level(
        m, tile=tile, description="OverlapsXY=16 8;OverlapsXY=4 4",
        extra_tags=[(305, TYPE_ASCII, ["MedScan"])],
    )
    path = tmp_path / "dup.tif"
    w.save(path)
    t = AtlasTiffFile(str(path))
    assert t.level_dimensions == [(160, 120)]
    np.testing.assert_array_equal(t.read_region_level(0, 0, 0, 160, 120), truth)
    t.close()

    # Junk first key clears; a later duplicate must NOT repopulate.
    rng2 = np.random.default_rng(76)
    img = _rand_rgb(rng2, 128, 192)
    w = TiffWriter()
    w.add_level(
        img, tile=tile, description="OverlapsXY=9999999 1;OverlapsXY=16 8",
        extra_tags=[(305, TYPE_ASCII, ["MedScan"])],
    )
    path2 = tmp_path / "poison.tif"
    w.save(path2)
    t = AtlasTiffFile(str(path2))
    assert t.level_dimensions == [(192, 128)]
    np.testing.assert_array_equal(t.read_region_level(0, 0, 0, 192, 128), img)
    t.close()


def test_trestle_negative_overlap_is_junk(tmp_path: Path):
    """A negative token like '-16' must poison the whole OverlapsXY value
    (OpenSlide's strtoll reads −16 and the ≤0 gate drops it), not be read as
    +16 and shrink the canvas (advisor r3)."""
    rng = np.random.default_rng(77)
    img = _rand_rgb(rng, 128, 192)
    w = TiffWriter()
    w.add_level(img, tile=64, description="OverlapsXY=-16 8",
                extra_tags=[(305, TYPE_ASCII, ["MedScan"])])
    path = tmp_path / "neg.tif"
    w.save(path)
    t = AtlasTiffFile(str(path))
    assert t.level_dimensions == [(192, 128)]
    np.testing.assert_array_equal(t.read_region_level(0, 0, 0, 192, 128), img)
    t.close()


def test_trestle_overlap_pairs_indexed_by_directory_not_kept_level(tmp_path: Path):
    """OverlapsXY pairs are per TIFF directory in file order: when an
    intermediate tiled directory is skipped (wrong aspect), later levels must
    still consume their OWN pair, not the skipped one's (advisor r3)."""
    rng = np.random.default_rng(78)
    tile = 64
    truth0 = _rand_rgb(rng, 176, 208)
    m0 = _trestle_mosaic(truth0, tile, 16, 8, 256, 192, rng)
    # Directory 1: square aspect (1.0 vs base 208/176≈1.18) — skipped by the
    # 5% aspect gate, but still consumes ordinal 1 / pair (0, 0).
    square = _rand_rgb(rng, 96, 96)
    truth1 = truth0[::2, ::2].copy()  # directory 2 = real half-res level
    m1 = _trestle_mosaic(truth1, tile, 8, 12, 112, 100, rng)

    desc = "OverlapsXY=16 8 0 0 8 12;Objective Power=20"
    w = TiffWriter()
    w.add_level(m0, tile=tile, description=desc,
                extra_tags=[(305, TYPE_ASCII, ["MedScan"])])
    w.add_level(square, tile=tile)
    w.add_level(m1, tile=tile)
    path = tmp_path / "skip.tif"
    w.save(path)

    t = AtlasTiffFile(str(path))
    assert t.level_dimensions == [(208, 176), (104, 88)]
    np.testing.assert_array_equal(t.read_region_level(0, 0, 0, 208, 176), truth0)
    np.testing.assert_array_equal(t.read_region_level(1, 0, 0, 104, 88), truth1)
    t.close()


def test_trestle_striped_directory_still_consumes_its_pair(tmp_path: Path):
    """A STRIPED directory between tiled levels must consume its own
    OverlapsXY pair too: OpenSlide's trestle driver makes every raw TIFF
    directory a level, so pair k belongs to directory k regardless of chunk
    layout. A tiled-only ordinal count would hand the striped directory's
    pair to the next tiled level, shrinking it to the wrong canvas."""
    rng = np.random.default_rng(79)
    tile = 64
    truth0 = _rand_rgb(rng, 176, 208)
    m0 = _trestle_mosaic(truth0, tile, 16, 8, 256, 192, rng)
    striped = truth0[::4, ::4].copy()  # directory 1: striped overview, pair (0,0)
    truth1 = truth0[::2, ::2].copy()   # directory 2: tiled half-res, pair (8,12)
    m1 = _trestle_mosaic(truth1, tile, 8, 12, 112, 100, rng)

    desc = "OverlapsXY=16 8 0 0 8 12;Objective Power=20"
    w = TiffWriter()
    w.add_level(m0, tile=tile, description=desc,
                extra_tags=[(305, TYPE_ASCII, ["MedScan"])])
    w.add_level(striped)  # striped (no tile): correction no-ops, pair consumed
    w.add_level(m1, tile=tile)
    path = tmp_path / "striped_mid.tif"
    w.save(path)

    t = AtlasTiffFile(str(path))
    assert t.level_dimensions == [(208, 176), (104, 88), (52, 44)]
    np.testing.assert_array_equal(t.read_region_level(0, 0, 0, 208, 176), truth0)
    np.testing.assert_array_equal(t.read_region_level(1, 0, 0, 104, 88), truth1)
    t.close()


def test_overlaps_description_requires_medscan_software(tmp_path: Path):
    """A generic TIFF whose description happens to contain OverlapsXY must
    not be reinterpreted: the correction is gated on the MedScan Software."""
    rng = np.random.default_rng(74)
    img = _rand_rgb(rng, 128, 192)
    w = TiffWriter()
    w.add_level(img, tile=64, description="OverlapsXY=16 8",
                extra_tags=[(305, TYPE_ASCII, ["OtherScan"])])
    path = tmp_path / "generic.tif"
    w.save(path)
    t = AtlasTiffFile(str(path))
    assert t.properties.get("atlas.vendor") != "trestle"
    assert t.level_dimensions == [(192, 128)]
    np.testing.assert_array_equal(t.read_region_level(0, 0, 0, 192, 128), img)
    t.close()
