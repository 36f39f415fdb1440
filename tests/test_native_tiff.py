"""Native TIFF decoder + TiffWSI backend tests.

Golden-pixel validation against synthetic tiled/striped pyramids (own writer),
PIL-written TIFFs (independent encoder implementation), the MPP extraction
ladder, and the full extraction service running on a TiffWSI slide.
"""

from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from atlaspatch_tpu.io.synthetic_wsi import make_tissue_canvas
from tests.tiff_builder import write_pyramid

native = pytest.importorskip("atlaspatch_tpu.io.native")
from atlaspatch_tpu.io.native import AtlasTiffFile  # noqa: E402
from atlaspatch_tpu.io.tiff_wsi import TiffWSI  # noqa: E402


@pytest.fixture(scope="module")
def canvas():
    return make_tissue_canvas(512, 384, seed=3, n_blobs=2)


@pytest.mark.parametrize("tile", [64, None])
@pytest.mark.parametrize("compression", [1, 8, 32773])
def test_decode_roundtrip(tmp_path: Path, canvas, tile, compression):
    path = tmp_path / "pyr.tiff"
    arrays = write_pyramid(path, canvas, levels=3, tile=tile, compression=compression)
    t = AtlasTiffFile(str(path))
    assert t.level_count == 3
    assert t.dimensions == (512, 384)
    assert t.level_dimensions[1] == (256, 192)
    for lv, arr in enumerate(arrays):
        h, w = arr.shape[:2]
        out = t.read_region_level(lv, 0, 0, w, h)
        np.testing.assert_array_equal(out, arr)
    # sub-region + out-of-bounds (white padding)
    sub = t.read_region_level(0, 100, 50, 64, 64)
    np.testing.assert_array_equal(sub, arrays[0][50:114, 100:164])
    edge = t.read_region_level(0, 480, 350, 64, 64)
    np.testing.assert_array_equal(edge[:34, :32], arrays[0][350:384, 480:512])
    # out-of-bounds padding is black (OpenSlide read_region parity)
    assert (edge[34:] == 0).all() and (edge[:, 32:] == 0).all()
    t.close()


@pytest.mark.parametrize("pil_compression", [None, "tiff_adobe_deflate", "packbits", "tiff_lzw"])
def test_decode_pil_written(tmp_path: Path, canvas, pil_compression):
    """Cross-validate against an independent TIFF encoder (Pillow)."""
    path = tmp_path / "pil.tiff"
    img = Image.fromarray(canvas)
    if pil_compression:
        img.save(path, compression=pil_compression)
    else:
        img.save(path)
    t = AtlasTiffFile(str(path))
    out = t.read_region_level(0, 0, 0, canvas.shape[1], canvas.shape[0])
    np.testing.assert_array_equal(out, canvas)
    t.close()


def test_jpeg_tiff_decode(tmp_path: Path, canvas):
    """JPEG-in-TIFF via Pillow (when its libtiff supports it)."""
    path = tmp_path / "jpeg.tiff"
    try:
        Image.fromarray(canvas).save(path, compression="jpeg", quality=95)
    except OSError:
        pytest.skip("Pillow lacks jpeg-in-tiff write support")
    t = AtlasTiffFile(str(path))
    out = t.read_region_level(0, 0, 0, canvas.shape[1], canvas.shape[0])
    # lossy codec: compare loosely
    assert out.shape == canvas.shape
    assert np.abs(out.astype(int) - canvas.astype(int)).mean() < 8
    t.close()


def test_tiffwsi_mpp_ladder(tmp_path: Path, canvas):
    # 1) aperio-style description → aperio.MPP key
    p1 = tmp_path / "a.svs"
    write_pyramid(
        p1,
        canvas,
        tile=64,
        description="Aperio Image Library v12\r\n512x384 | AppMag = 20 | MPP = 0.4990",
    )
    w = TiffWSI(path=str(p1))
    w._ensure_loaded()
    assert w.mpp == 0.499
    assert w.mag == 20
    attrs = w.metadata_attrs()
    assert attrs["mpp"] == 0.499
    assert attrs["magnification"] == 20

    # 2) free-text regex
    p2 = tmp_path / "b.tiff"
    write_pyramid(p2, canvas, tile=64, description="scanner image mpp=0.25 something")
    w2 = TiffWSI(path=str(p2))
    w2._ensure_loaded()
    assert w2.mpp == 0.25
    assert w2.mag == 40

    # 3) resolution tags (centimeter: 40000 px/cm → 0.25 µm/px)
    p3 = tmp_path / "c.tiff"
    write_pyramid(p3, canvas, tile=64, resolution=(40000.0, 40000.0, 3))
    w3 = TiffWSI(path=str(p3))
    w3._ensure_loaded()
    assert w3.mpp == 0.25

    # 4) user override wins
    w4 = TiffWSI(path=str(p1), mpp=1.0)
    w4._ensure_loaded()
    assert w4.mpp == 1.0


def test_tiffwsi_reads_level0_coords(tmp_path: Path, canvas):
    path = tmp_path / "p.tiff"
    arrays = write_pyramid(path, canvas, levels=3, tile=64,
                           description="Aperio|AppMag = 20|MPP = 0.5")
    w = TiffWSI(path=str(path))
    w._ensure_loaded()
    assert w.ds == [1.0, 2.0, 4.0]
    # level-0 coords map to level coords (OpenSlide convention)
    region = w.extract((128, 64), lv=1, wh=(32, 32), mode="array")
    np.testing.assert_array_equal(region, arrays[1][32:64, 64:96])
    thumb = w.get_thumb((128, 128))
    assert max(thumb.size) <= 128
    w.cleanup()


def test_factory_routes_tiff(tmp_path: Path, canvas):
    from atlaspatch_tpu.io.factory import WSIFactory

    path = tmp_path / "f.svs"
    write_pyramid(path, canvas, tile=64, description="Aperio|AppMag = 20|MPP = 0.5")
    wsi = WSIFactory.load(str(path))
    assert isinstance(wsi, TiffWSI)
    wsi._ensure_loaded()
    assert wsi.mag == 20
    wsi.cleanup()


def test_extraction_on_tiff_slide(tmp_path: Path):
    """Full segment-and-coords flow over the native backend."""
    from atlaspatch_tpu.core.config import ExtractionConfig, OutputConfig
    from atlaspatch_tpu.core.models import Slide
    from atlaspatch_tpu.services.extraction import PatchExtractionService

    canvas = make_tissue_canvas(1024, 1024, seed=5, n_blobs=2)
    path = tmp_path / "slide.svs"
    write_pyramid(path, canvas, levels=2, tile=64,
                  description="Aperio|AppMag = 20|MPP = 0.5")
    wsi = TiffWSI(path=str(path))
    wsi._ensure_loaded()
    thumb = np.asarray(wsi.get_thumb((256, 256)).convert("L"), np.float32)
    mask = (thumb < 220).astype(np.float32)

    svc = PatchExtractionService(
        ExtractionConfig(patch_size=128, target_magnification=20, tissue_threshold=0.0),
        OutputConfig(output_root=tmp_path / "out"),
    )
    result = svc.extract(wsi, mask, slide=Slide(path=path))
    assert result.num_patches > 0
    assert result.h5_path.exists()
    wsi.cleanup()


# ------------------------------------------------------------------ JPEG2000
def _j2k_lib_present() -> bool:
    import ctypes

    try:
        ctypes.CDLL("libopenjp2.so.7")
        return True
    except OSError:
        return False


@pytest.mark.skipif(not _j2k_lib_present(), reason="libopenjp2 not installed")
@pytest.mark.parametrize("tile", [64, None])
def test_j2k_rgb_decode(tmp_path: Path, canvas, tile):
    """Aperio 33005: RGB components in raw J2K codestreams — lossless encode
    via PIL/openjpeg must round-trip bit-exactly through the native decoder."""
    path = tmp_path / "j2k_rgb.svs"
    arrays = write_pyramid(path, canvas, levels=2, tile=tile, compression=33005)
    t = AtlasTiffFile(str(path))
    for lv, arr in enumerate(arrays):
        h, w = arr.shape[:2]
        np.testing.assert_array_equal(t.read_region_level(lv, 0, 0, w, h), arr)
    sub = t.read_region_level(0, 100, 50, 64, 64)
    np.testing.assert_array_equal(sub, arrays[0][50:114, 100:164])
    t.close()


@pytest.mark.skipif(not _j2k_lib_present(), reason="libopenjp2 not installed")
def test_j2k_ycbcr_decode(tmp_path: Path, canvas):
    """Aperio 33003: YCbCr components with the RGB transform applied outside
    the codestream. Oracle: encode YCbCr planes losslessly, invert with the
    decoder's exact libjpeg-style fixed-point math in numpy."""
    from tests.tiff_builder import rgb_to_full_range_ycbcr

    ycc = rgb_to_full_range_ycbcr(canvas)
    path = tmp_path / "j2k_ycc.svs"
    write_pyramid(path, ycc, levels=1, tile=64, compression=33003)

    y = ycc[..., 0].astype(np.int64)
    cb = ycc[..., 1].astype(np.int64) - 128
    cr = ycc[..., 2].astype(np.int64) - 128
    expect = np.clip(
        np.stack(
            [
                y + ((91881 * cr + 32768) >> 16),
                y - ((22554 * cb + 46802 * cr + 32768) >> 16),
                y + ((116130 * cb + 32768) >> 16),
            ],
            axis=-1,
        ),
        0,
        255,
    ).astype(np.uint8)

    t = AtlasTiffFile(str(path))
    out = t.read_region_level(0, 0, 0, canvas.shape[1], canvas.shape[0])
    np.testing.assert_array_equal(out, expect)
    # And the YCbCr→RGB inversion stays within rounding distance of the source
    assert np.abs(out.astype(np.int32) - canvas.astype(np.int32)).max() <= 2
    t.close()


@pytest.mark.skipif(not _j2k_lib_present(), reason="libopenjp2 not installed")
def test_j2k_full_pipeline_extraction(tmp_path: Path):
    """A J2K-compressed SVS flows through TiffWSI → extraction end to end."""
    cv = make_tissue_canvas(512, 512, seed=9, n_blobs=2)
    path = tmp_path / "slide_j2k.svs"
    write_pyramid(
        path,
        cv,
        levels=2,
        tile=64,
        compression=33005,
        description="Aperio Fake |AppMag = 20|MPP = 0.5",
    )
    wsi = TiffWSI(path=str(path))
    region = wsi.extract((64, 64), 0, (128, 128))
    assert wsi.mpp == pytest.approx(0.5)
    np.testing.assert_array_equal(region, cv[64:192, 64:192])
    wsi.cleanup()


def test_decoder_corruption_robustness(tmp_path: Path, canvas):
    """Truncated/bit-flipped files must raise cleanly — never hang, abort, or
    crash the process (regression: corrupt headers once escaped as uncaught
    std::bad_alloc -> std::terminate)."""
    import signal

    good = tmp_path / "good.tiff"
    write_pyramid(good, canvas, levels=2, tile=64, compression=8)
    data = good.read_bytes()
    rng = np.random.default_rng(5)

    class _Timeout(Exception):
        pass

    def _handler(signum, frame):
        raise _Timeout()

    old = signal.signal(signal.SIGALRM, _handler)
    try:
        cases = [data[: int(len(data) * f)] for f in (0.02, 0.3, 0.8)]
        cases.append(data[:4] + bytes(rng.integers(0, 256, 2048, dtype=np.uint8)))
        for _ in range(20):
            buf = bytearray(data)
            for _ in range(int(rng.integers(1, 150))):
                buf[rng.integers(8, len(buf))] ^= 1 << rng.integers(0, 8)
            cases.append(bytes(buf))

        for i, blob in enumerate(cases):
            p = tmp_path / f"fuzz{i}"
            p.write_bytes(blob)
            signal.alarm(20)
            try:
                t = AtlasTiffFile(str(p))
                for lv in range(t.level_count):
                    w, h = t.level_dimensions[lv]
                    t.read_region_level(lv, 0, 0, min(w, 256), min(h, 256))
                t.close()
            except _Timeout:
                raise AssertionError(f"decoder hang on fuzz case {i}")
            except Exception:
                pass  # clean rejection is the contract
            finally:
                signal.alarm(0)
    finally:
        signal.signal(signal.SIGALRM, old)


@pytest.mark.parametrize("compression", [1, 8])
def test_predictor2_strips_decode(tmp_path: Path, canvas, compression):
    """Predictor=2 must be honored for uncompressed strips too (ADVICE r1:
    the uncompressed path used to return before predictor application)."""
    from tests.tiff_builder import TiffWriter

    path = tmp_path / "pred.tiff"
    b = TiffWriter()
    b.add_level(canvas, compression=compression, predictor=2)
    b.save(path)
    t = AtlasTiffFile(str(path))
    out = t.read_region_level(0, 0, 0, canvas.shape[1], canvas.shape[0])
    np.testing.assert_array_equal(out, canvas)


# --- scaled (IDCT-downscaled) reads ---------------------------------------------


@pytest.mark.parametrize("scale", [2, 4, 8])
def test_scaled_read_matches_area_resize(tmp_path: Path, canvas, scale):
    """IDCT-scaled decode tracks full decode + AREA resize within a few LSBs."""
    import cv2

    path = tmp_path / "jp.svs"
    write_pyramid(path, canvas, levels=1, tile=64, compression=7)
    t = AtlasTiffFile(str(path))
    h, w = canvas.shape[:2]
    out = t.read_region_level_scaled(0, 0, 0, w, h, scale)
    assert out is not None
    assert out.shape == ((h + scale - 1) // scale, (w + scale - 1) // scale, 3)
    full = t.read_region_level(0, 0, 0, w, h)
    ref = cv2.resize(full, (out.shape[1], out.shape[0]), interpolation=cv2.INTER_AREA)
    diff = np.abs(ref.astype(np.int16) - out.astype(np.int16))
    assert diff.mean() < 2.0
    assert diff.max() <= 40  # block edges under IDCT scaling vs box average


def test_scaled_read_subwindow_and_oob(tmp_path: Path, canvas):
    """Sub-window scaled reads align with the scaled full read; OOB pads black."""
    path = tmp_path / "jp.svs"
    write_pyramid(path, canvas, levels=1, tile=64, compression=7)
    t = AtlasTiffFile(str(path))
    h, w = canvas.shape[:2]
    whole = t.read_region_level_scaled(0, 0, 0, w, h, 4)
    sub = t.read_region_level_scaled(0, 64, 64, 256, 128, 4)
    np.testing.assert_array_equal(sub, whole[16 : 16 + 32, 16 : 16 + 64])
    # window hanging past the right/bottom edge: zero padding
    over = t.read_region_level_scaled(0, w - 64, h - 64, 256, 256, 4)
    assert over.shape == (64, 64, 3)
    np.testing.assert_array_equal(over[:16, :16], whole[-16:, -16:])
    assert (over[20:, :] == 0).all() and (over[:, 20:] == 0).all()


def test_scaled_read_unsupported_falls_back(tmp_path: Path, canvas):
    """Non-JPEG levels and off-grid windows return None (caller falls back)."""
    path = tmp_path / "raw.tiff"
    write_pyramid(path, canvas, levels=1, tile=64, compression=8)
    t = AtlasTiffFile(str(path))
    assert t.read_region_level_scaled(0, 0, 0, 512, 384, 4) is None
    jp = tmp_path / "jp.svs"
    write_pyramid(jp, canvas, levels=1, tile=64, compression=7)
    tj = AtlasTiffFile(str(jp))
    assert tj.read_region_level_scaled(0, 3, 0, 64, 64, 4) is None  # x not on grid
    assert tj.read_region_level_scaled(0, 0, 0, 64, 64, 3) is None  # odd scale


def test_thumbnail_scaled_decode_parity(tmp_path: Path):
    """get_thumbnail_at_power(scaled_decode=True) ≈ the exact chain, and
    silently falls back for non-JPEG pyramids."""
    big = make_tissue_canvas(2048, 1536, seed=7, n_blobs=3)
    desc = "Aperio Image Library v12\r\n2048x1536 | AppMag = 20 | MPP = 0.5"
    jp = tmp_path / "jp.svs"
    write_pyramid(jp, big, levels=3, tile=64, compression=7, description=desc)
    wsi = TiffWSI(path=str(jp))
    exact = np.asarray(wsi.get_thumbnail_at_power(power=1.25), np.int16)
    fast = np.asarray(wsi.get_thumbnail_at_power(power=1.25, scaled_decode=True), np.int16)
    assert exact.shape == fast.shape
    assert np.abs(exact - fast).mean() < 2.0

    raw = tmp_path / "raw.tiff"
    write_pyramid(raw, big, levels=3, tile=64, compression=8, description=desc)
    wsi_raw = TiffWSI(path=str(raw))
    exact_raw = np.asarray(wsi_raw.get_thumbnail_at_power(power=1.25), np.uint8)
    fast_raw = np.asarray(
        wsi_raw.get_thumbnail_at_power(power=1.25, scaled_decode=True), np.uint8
    )
    np.testing.assert_array_equal(exact_raw, fast_raw)


def test_scaled_and_windowed_corruption_robustness(tmp_path: Path, canvas):
    """Bit-flipped inputs through the round-3 native paths — scaled region
    reads, the windowed standalone-JPEG decode, and the sequential no-DRI
    fallback — must raise cleanly or return data, never hang or crash."""
    import io
    import signal

    from PIL import Image as PILImage

    from atlaspatch_tpu.io.native import jpeg_decode_window

    good = tmp_path / "good.svs"
    write_pyramid(good, canvas, levels=2, tile=64, compression=7)
    tiff_data = good.read_bytes()
    buf = io.BytesIO()
    PILImage.fromarray(canvas).save(buf, "JPEG", quality=90)
    jpeg_data = buf.getvalue()
    rng = np.random.default_rng(11)

    class _Timeout(Exception):
        pass

    old = signal.signal(signal.SIGALRM, lambda s, f: (_ for _ in ()).throw(_Timeout()))
    try:
        for trial in range(25):
            # scaled TIFF reads over corrupted pyramids
            blob = bytearray(tiff_data)
            for _ in range(int(rng.integers(1, 120))):
                blob[rng.integers(8, len(blob))] ^= 1 << rng.integers(0, 8)
            p = tmp_path / f"fz{trial}.svs"
            p.write_bytes(bytes(blob))
            signal.alarm(20)
            try:
                t = AtlasTiffFile(str(p))
                t.read_region_level_scaled(0, 0, 0, 256, 192, 4)
                t.close()
            except (RuntimeError, ValueError):
                pass
            finally:
                signal.alarm(0)

            # windowed standalone JPEG decode over corrupted streams
            jblob = bytearray(jpeg_data)
            for _ in range(int(rng.integers(1, 60))):
                jblob[rng.integers(2, len(jblob))] ^= 1 << rng.integers(0, 8)
            signal.alarm(20)
            try:
                jpeg_decode_window(bytes(jblob), 1, 16, 16, 64, 48)
            except RuntimeError:
                pass
            finally:
                signal.alarm(0)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def test_sequential_fallback_corruption_robustness(tmp_path: Path):
    """No-DRI single-strip NDPI streams with corrupted entropy data must
    decode-or-raise cleanly through the sequential fallback."""
    import io
    import signal

    from PIL import Image as PILImage

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (64, 80, 3), dtype=np.uint8)
    buf = io.BytesIO()
    PILImage.fromarray(img).save(buf, "JPEG", quality=90)
    stream = buf.getvalue()
    from tests.test_vendor_formats import _write_single_strip_ndpi, _zero_sof_dims

    class _Timeout(Exception):
        pass

    old = signal.signal(signal.SIGALRM, lambda s, f: (_ for _ in ()).throw(_Timeout()))
    try:
        for trial in range(25):
            blob = bytearray(_zero_sof_dims(stream))
            for _ in range(int(rng.integers(1, 50))):
                blob[rng.integers(2, len(blob))] ^= 1 << rng.integers(0, 8)
            path = tmp_path / f"seq{trial}.ndpi"
            _write_single_strip_ndpi(path, bytes(blob), 80, 64)
            signal.alarm(20)
            try:
                t = AtlasTiffFile(str(path))
                t.read_region_level(0, 0, 0, 80, 64)
                t.close()
            except (RuntimeError, ValueError):
                pass
            finally:
                signal.alarm(0)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def test_implausible_resolution_tags_fall_through_ladder(tmp_path, canvas):
    """Generic 72-dpi resolution tags (a re-saved TIFF) produce 352.8 µm/px —
    not an MPP. The ladder must skip the implausible tier instead of aborting
    the open: fall to the magnification tier when present, else mpp=None."""
    # 72 dpi + Aperio AppMag: tier 3 implausible -> tier 4 (10/40 = 0.25)
    p = tmp_path / "dpi_mag.svs"
    write_pyramid(
        p, canvas, tile=64,
        resolution=(72.0, 72.0, 2),  # unit 2 = inch
        description="Aperio Image Library\r\n256x192 | AppMag = 40",
    )
    w = TiffWSI(path=str(p))
    w._ensure_loaded()
    assert w.mpp == 0.25
    assert w.mag == 40

    # 72 dpi alone: nothing plausible anywhere -> open succeeds with mpp None
    p2 = tmp_path / "dpi_only.tiff"
    write_pyramid(p2, canvas, tile=64, resolution=(72.0, 72.0, 2))
    w2 = TiffWSI(path=str(p2))
    w2._ensure_loaded()
    assert w2.mpp is None


# ----------------------- corrupt-geometry regression tests (fuzz campaign)
# tools/fuzz_decoders.py found multi-minute stalls where corrupt-but-parseable
# geometry tags made the decoder size buffers or paint loops from garbage.
# Each case below pins the specific validation that now rejects it quickly.


def _patch_ifd_entry(buf: bytearray, ifd_index: int, tag: int, *, value=None, count=None):
    """Patch a classic-TIFF little-endian IFD entry's inline value/count."""
    import struct

    off = struct.unpack_from("<I", buf, 4)[0]
    for _ in range(ifd_index):
        n = struct.unpack_from("<H", buf, off)[0]
        off = struct.unpack_from("<I", buf, off + 2 + 12 * n)[0]
        assert off, "IFD chain ended early"
    n = struct.unpack_from("<H", buf, off)[0]
    for i in range(n):
        eoff = off + 2 + 12 * i
        etag = struct.unpack_from("<H", buf, eoff)[0]
        if etag == tag:
            if count is not None:
                struct.pack_into("<I", buf, eoff + 4, count)
            if value is not None:
                struct.pack_into("<I", buf, eoff + 8, value)
            return
    raise AssertionError(f"tag {tag} not present in IFD {ifd_index}")


def _timed_clean_failure(fn, budget_s=15.0):
    """fn() must finish (either way) well under budget — no stalls."""
    import time

    t0 = time.monotonic()
    try:
        fn()
    except Exception:
        pass
    took = time.monotonic() - t0
    assert took < budget_s, f"took {took:.1f}s (stall regression)"


def test_tiled_dims_beyond_chunk_coverage_rejected(tmp_path: Path):
    """A tiled IFD whose declared grid needs more tiles than its offset
    array holds is garbage (real writers always cover the image); it must
    be rejected at parse instead of painting a terabyte canvas."""
    rng = np.random.default_rng(9)
    path = tmp_path / "wide.svs"
    write_pyramid(path, rng.integers(0, 255, (160, 224, 3), np.uint8),
                  levels=2, tile=64, compression=7)
    buf = bytearray(path.read_bytes())
    _patch_ifd_entry(buf, 0, 256, value=50_000_000)  # ImageWidth
    path.write_bytes(bytes(buf))

    def attempt():
        t = AtlasTiffFile(str(path))
        # Either the whole open fails or the corrupt level is dropped.
        assert all(w < 50_000_000 for (w, _h) in t.level_dimensions)
        for lv in range(t.level_count):
            w, h = t.level_dimensions[lv]
            t.read_region_level(lv, 0, 0, min(w, 64), min(h, 64))
        t.close()

    _timed_clean_failure(attempt)


def test_absurd_tile_dims_rejected(tmp_path: Path):
    """TileLength read through a corrupted entry (count 1 -> 64 turns the
    inline value into a file offset) produced multi-gigabyte per-chunk
    buffers; tile dims are now bounded."""
    rng = np.random.default_rng(10)
    path = tmp_path / "tile.svs"
    write_pyramid(path, rng.integers(0, 255, (160, 224, 3), np.uint8),
                  levels=2, tile=64, compression=7)
    buf = bytearray(path.read_bytes())
    _patch_ifd_entry(buf, 1, 323, value=1 << 20)  # TileLength = 1M px
    path.write_bytes(bytes(buf))

    def attempt():
        t = AtlasTiffFile(str(path))
        for lv in range(t.level_count):
            w, h = t.level_dimensions[lv]
            t.read_region_level(lv, 0, 0, min(w, 64), min(h, 64))
        t.close()

    _timed_clean_failure(attempt)


def test_chunk_byte_count_beyond_eof_fails_fast(tmp_path: Path):
    """A corrupt Strip/TileByteCount must be bounds-checked against the file
    BEFORE the read buffer is allocated (zero-initializing gigabytes just to
    fail the read was a measured 39s stall)."""
    rng = np.random.default_rng(11)
    path = tmp_path / "count.tiff"
    write_pyramid(path, rng.integers(0, 255, (96, 128, 3), np.uint8),
                  levels=1, tile=64, compression=7)
    buf = bytearray(path.read_bytes())
    # TileByteCounts is an array; point its first entry at a huge count by
    # rewriting the count field to 1 so the value becomes inline... simpler:
    # patch the array in place via the entry's data offset.
    import struct

    off = struct.unpack_from("<I", buf, 4)[0]
    n = struct.unpack_from("<H", buf, off)[0]
    for i in range(n):
        eoff = off + 2 + 12 * i
        if struct.unpack_from("<H", buf, eoff)[0] == 325:  # TileByteCounts
            cnt = struct.unpack_from("<I", buf, eoff + 4)[0]
            data_off = struct.unpack_from("<I", buf, eoff + 8)[0]
            assert cnt > 1  # stored out-of-line
            struct.pack_into("<I", buf, data_off, 1 << 30)  # 1 GiB count
            break
    else:
        raise AssertionError("no TileByteCounts entry")
    path.write_bytes(bytes(buf))

    def attempt():
        t = AtlasTiffFile(str(path))
        w, h = t.level_dimensions[0]
        t.read_region_level(0, 0, 0, w, h)
        t.close()

    _timed_clean_failure(attempt, budget_s=5.0)


def test_striped_jpeg_giant_width_rejected_or_capped(tmp_path: Path):
    """A corrupt giant ImageWidth on a multi-strip JPEG level must either be
    rejected at parse (the strip-pixel bound) or refused by the thumbnail
    safety cap — never allocated. Either way, fast and clean."""
    rng = np.random.default_rng(12)
    path = tmp_path / "giant.tiff"
    write_pyramid(path, rng.integers(0, 255, (64, 96, 3), np.uint8),
                  levels=1, tile=None, compression=7)
    buf = bytearray(path.read_bytes())
    t = AtlasTiffFile(str(path))
    assert t.level_count == 1
    t.close()
    _patch_ifd_entry(buf, 0, 256, value=1 << 26)  # width: 67M px
    path.write_bytes(bytes(buf))

    def attempt():
        wsi = TiffWSI(path=str(path))
        wsi._ensure_loaded()  # may cleanly refuse the whole file
        if wsi.nlvl:  # if the level survived parsing, the thumb must refuse
            with pytest.raises(RuntimeError, match="safety cap"):
                wsi.get_thumb((32, 32))
        wsi.cleanup()

    _timed_clean_failure(attempt, budget_s=10.0)


def test_giant_strip_width_rejected(tmp_path: Path):
    """A corrupt ImageWidth inside the total-pixel cap still declared a
    10 GB per-strip decode buffer (width x rows_per_strip); strip pixel
    counts are now bounded at parse."""
    rng = np.random.default_rng(13)
    path = tmp_path / "strip.tiff"
    write_pyramid(path, rng.integers(0, 255, (96, 128, 3), np.uint8),
                  levels=1, tile=None, compression=8)
    buf = bytearray(path.read_bytes())
    _patch_ifd_entry(buf, 0, 256, value=167_772_288)  # ImageWidth
    path.write_bytes(bytes(buf))

    def attempt():
        t = AtlasTiffFile(str(path))
        assert all(w < 167_772_288 for (w, _h) in t.level_dimensions)
        for lv in range(t.level_count):
            w, h = t.level_dimensions[lv]
            t.read_region_level(lv, 0, 0, min(w, 64), min(h, 64))
        t.close()

    _timed_clean_failure(attempt, budget_s=10.0)


def test_single_strip_jpeg_giant_height_fails_before_fill(tmp_path: Path):
    """TRUE single-chunk whole-image JPEGs (the NDPI layout) bypass the
    chunk-coverage check, so a corrupt giant height reaches read_region; the
    decode-path feasibility checks must reject it BEFORE the multi-gigabyte
    background fill (the fill-first ordering was a measured 30-60s stall)."""
    import time

    from tests.test_vendor_formats import (
        _jpeg_with_restarts,
        _write_single_strip_ndpi,
        _zero_sof_dims,
    )

    rng = np.random.default_rng(14)
    img = np.kron(rng.integers(0, 255, (12, 32, 3), np.uint8),
                  np.ones((8, 8, 1), np.uint8))
    stream = _jpeg_with_restarts(img, rows=2)
    path = tmp_path / "tall.ndpi"
    _write_single_strip_ndpi(path, _zero_sof_dims(stream), 256, 96)
    buf = bytearray(path.read_bytes())
    _patch_ifd_entry(buf, 0, 257, value=4_587_616)  # ImageLength: 4.5M rows
    path.write_bytes(bytes(buf))

    t = AtlasTiffFile(str(path))
    assert t.level_count, "single-chunk JPEG level should survive parsing"
    w, h = t.level_dimensions[0]
    assert h == 4_587_616
    t0 = time.monotonic()
    with pytest.raises(RuntimeError):
        t.read_region_level(0, 0, 0, w, h)
    assert time.monotonic() - t0 < 10.0
    t.close()


def test_16bit_tiff_rejected_loudly(tmp_path: Path):
    """Every decode path assumes 8-bit samples; a 16-bit TIFF must fail the
    open loudly instead of byte-wise reinterpreting pixel data as garbage."""
    arr16 = (np.arange(96 * 128, dtype=np.uint32).reshape(96, 128) % 65536).astype(
        np.uint16
    )
    path = tmp_path / "deep.tiff"
    Image.fromarray(arr16, mode="I;16").save(path)
    with pytest.raises(RuntimeError, match="no decodable pyramid levels"):
        AtlasTiffFile(str(path))


def test_bigtiff_roundtrip(tmp_path: Path):
    """BigTIFF (version 43): 8-byte IFD offsets/counts parse and the pixels
    round-trip bit-exactly. The classic writer never exercises this header."""
    from tests.tiff_builder import write_bigtiff_single_level

    rng = np.random.default_rng(15)
    img = rng.integers(0, 255, (96, 160, 3), np.uint8)
    path = tmp_path / "big.tiff"
    write_bigtiff_single_level(path, img)
    t = AtlasTiffFile(str(path))
    assert t.level_dimensions == [(160, 96)]
    np.testing.assert_array_equal(t.read_region_level(0, 0, 0, 160, 96), img)
    np.testing.assert_array_equal(
        t.read_region_level(0, 50, 30, 70, 40), img[30:70, 50:120]
    )
    t.close()


def test_bigendian_tiff_roundtrip(tmp_path: Path):
    """Big-endian classic TIFF ("MM"): every multi-byte field flows through
    the ByteOrder plumbing; pixels round-trip bit-exactly."""
    from tests.tiff_builder import write_bigendian_single_level

    rng = np.random.default_rng(16)
    img = rng.integers(0, 255, (96, 160, 3), np.uint8)
    path = tmp_path / "be.tiff"
    write_bigendian_single_level(path, img)
    t = AtlasTiffFile(str(path))
    assert t.level_dimensions == [(160, 96)]
    np.testing.assert_array_equal(t.read_region_level(0, 0, 0, 160, 96), img)
    np.testing.assert_array_equal(
        t.read_region_level(0, 33, 17, 60, 50), img[17:67, 33:93]
    )
    t.close()


def test_shared_jpegtables_layout(tmp_path: Path, canvas):
    """Tag-347 JPEGTables with abbreviated per-tile streams — the layout
    production Aperio writers use (DQT/DHT stored once). Pixels must match
    the standalone-JFIF encoding of the same tiles exactly (identical
    quantization, so identical decode)."""
    from tests.tiff_builder import TiffWriter

    # Standalone-JFIF reference file.
    ref_path = tmp_path / "standalone.svs"
    w = TiffWriter()
    w.add_level(canvas, tile=64, compression=7)
    w.save(ref_path)
    # Same pixels in the shared-tables layout.
    shared_path = tmp_path / "shared.svs"
    w2 = TiffWriter()
    w2.add_level(canvas, tile=64, compression=7, shared_jpeg_tables=True)
    w2.save(shared_path)
    assert shared_path.stat().st_size < ref_path.stat().st_size  # tables dedup

    t_ref = AtlasTiffFile(str(ref_path))
    t_shared = AtlasTiffFile(str(shared_path))
    h, wd = canvas.shape[:2]
    np.testing.assert_array_equal(
        t_shared.read_region_level(0, 0, 0, wd, h),
        t_ref.read_region_level(0, 0, 0, wd, h),
    )
    np.testing.assert_array_equal(
        t_shared.read_region_level(0, 100, 50, 90, 70),
        t_ref.read_region_level(0, 100, 50, 90, 70),
    )
    # The scaled fast path must honor the shared tables too.
    s_ref = t_ref.read_region_level_scaled(0, 0, 0, wd, h, 2)
    s_shared = t_shared.read_region_level_scaled(0, 0, 0, wd, h, 2)
    if s_ref is not None and s_shared is not None:
        np.testing.assert_array_equal(s_shared, s_ref)
    t_ref.close()
    t_shared.close()


@pytest.mark.skipif(not _j2k_lib_present(), reason="libopenjp2 not installed")
def test_j2k_standard_34712_decode(tmp_path: Path, canvas):
    """Standard TIFF JPEG2000 (compression 34712, RGB components): same
    decode path as Aperio 33005 but through its own compression case."""
    path = tmp_path / "std.tiff"
    arrays = write_pyramid(path, canvas, levels=1, tile=64, compression=34712)
    t = AtlasTiffFile(str(path))
    h, w = arrays[0].shape[:2]
    np.testing.assert_array_equal(t.read_region_level(0, 0, 0, w, h), arrays[0])
    t.close()


def test_rational_tag_with_zero_count_no_crash(tmp_path: Path, canvas):
    """A RATIONAL entry (e.g. YResolution) with a corrupt count of 0 holds no
    data; reading 8 bytes from it was a fuzz-found segfault. Must open and
    read cleanly, just without resolution-derived MPP."""
    path = tmp_path / "r0.tiff"
    write_pyramid(path, canvas, levels=1, tile=64,
                  resolution=(40000.0, 40000.0, 3))
    buf = bytearray(path.read_bytes())
    _patch_ifd_entry(buf, 0, 283, count=0)  # YResolution
    path.write_bytes(bytes(buf))

    t = AtlasTiffFile(str(path))
    h, w = canvas.shape[:2]
    out = t.read_region_level(0, 0, 0, w, h)
    np.testing.assert_array_equal(out, canvas)
    t.close()
    wsi = TiffWSI(path=str(path))
    wsi._ensure_loaded()  # MPP ladder runs over the corrupt tag
    wsi.cleanup()


def test_single_strip_jpeg_giant_width_unparseable_header_fails_fast(tmp_path: Path):
    """Corrupt giant width + an unparseable JPEG header routes to the
    whole-strip fallback, which previously committed a multi-gigabyte fill
    and decode buffer before failing; the buffer cap must refuse first."""
    import time

    from tests.test_vendor_formats import (
        _jpeg_with_restarts,
        _write_single_strip_ndpi,
    )

    rng = np.random.default_rng(17)
    img = np.kron(rng.integers(0, 255, (12, 32, 3), np.uint8),
                  np.ones((8, 8, 1), np.uint8))
    stream = bytearray(_jpeg_with_restarts(img, rows=2))
    stream[2:10] = b"\x00" * 8  # wreck the first header segment (keep SOI)
    path = tmp_path / "wide.ndpi"
    _write_single_strip_ndpi(path, bytes(stream), 1 << 24, 96)

    t = AtlasTiffFile(str(path))
    if t.level_count:
        w, h = t.level_dimensions[0]
        t0 = time.monotonic()
        with pytest.raises(RuntimeError):
            t.read_region_level(0, 0, 0, w, h)
        assert time.monotonic() - t0 < 10.0
    t.close()


def test_palette_tiff_decodes_rgb(tmp_path: Path, canvas):
    """Palette-color TIFFs (photometric 3 + ColorMap) must render through the
    lookup table, matching OpenSlide's RGBA expansion — not expose the raw
    indices as grayscale. PIL writes the 16-bit-per-channel ColorMap."""
    img = Image.fromarray(canvas).quantize(colors=200)
    path = tmp_path / "pal.tiff"
    img.save(path)
    expected = np.asarray(img.convert("RGB"))
    t = AtlasTiffFile(str(path))
    out = t.read_region_level(0, 0, 0, canvas.shape[1], canvas.shape[0])
    np.testing.assert_array_equal(out, expected)
    # sub-window goes through the same expansion
    sub = t.read_region_level(0, 37, 21, 64, 48)
    np.testing.assert_array_equal(sub, expected[21:69, 37:101])
    t.close()


def test_palette_tiff_lzw_decodes_rgb(tmp_path: Path, canvas):
    """Palette + LZW (the common PIL/ImageMagick combination)."""
    img = Image.fromarray(canvas).quantize(colors=64)
    path = tmp_path / "pal_lzw.tiff"
    img.save(path, compression="tiff_lzw")
    expected = np.asarray(img.convert("RGB"))
    t = AtlasTiffFile(str(path))
    out = t.read_region_level(0, 0, 0, canvas.shape[1], canvas.shape[0])
    np.testing.assert_array_equal(out, expected)
    t.close()


def test_gray_alpha_tiff_decodes_rgb(tmp_path: Path, canvas):
    """Gray+alpha (photometric 1, spp 2) must read the luma plane at the
    sample stride — a stride-1 walk renders interleaved gray/alpha bytes as
    a scrambled half-width image."""
    gray = np.asarray(Image.fromarray(canvas).convert("L"))
    la = np.stack([gray, np.full_like(gray, 255)], axis=-1)
    path = tmp_path / "la.tiff"
    Image.fromarray(la, mode="LA").save(path)
    expected = np.repeat(gray[..., None], 3, axis=-1)
    t = AtlasTiffFile(str(path))
    out = t.read_region_level(0, 0, 0, canvas.shape[1], canvas.shape[0])
    np.testing.assert_array_equal(out, expected)
    sub = t.read_region_level(0, 37, 21, 64, 48)
    np.testing.assert_array_equal(sub, expected[21:69, 37:101])
    t.close()


def test_cmyk_tiff_rejected_loudly(tmp_path: Path, canvas):
    """CMYK (photometric 5) has no RGB expansion here; truncating the first
    three channels would silently render garbage, so the open must fail."""
    path = tmp_path / "cmyk.tiff"
    Image.fromarray(canvas).convert("CMYK").save(path)
    with pytest.raises(RuntimeError, match="no decodable pyramid levels"):
        AtlasTiffFile(str(path))


def test_ome_tiff_subifd_pyramid(tmp_path: Path, canvas):
    """OME-TIFF layout: reduced levels in SubIFDs (tag 330) of the base
    directory (the Bio-Formats/bfconvert convention). Every level must
    round-trip, and MPP/mag must come from the OME-XML PhysicalSizeX /
    NominalMagnification (OpenSlide's generic driver exposes neither)."""
    from tests.tiff_builder import write_ome_pyramid

    path = tmp_path / "slide.ome.tiff"
    arrays = write_ome_pyramid(
        path, canvas, levels=3, physical_size_x=0.25, mag=40.0
    )
    t = AtlasTiffFile(str(path))
    assert t.level_count == 3
    assert t.dimensions == (512, 384)
    for lv, arr in enumerate(arrays):
        h, w = arr.shape[:2]
        np.testing.assert_array_equal(t.read_region_level(lv, 0, 0, w, h), arr)
    t.close()

    wsi = TiffWSI(path=str(path))
    wsi._ensure_loaded()
    assert wsi.mpp == 0.25
    assert wsi.mag == 40
    wsi.cleanup()


def test_ome_tiff_unit_scaling(tmp_path: Path, canvas):
    """PhysicalSizeXUnit in nm must normalize to µm."""
    from tests.tiff_builder import write_ome_pyramid

    path = tmp_path / "nm.ome.tiff"
    write_ome_pyramid(path, canvas, levels=1, physical_size_x=500.0, unit="nm")
    wsi = TiffWSI(path=str(path))
    wsi._ensure_loaded()
    assert wsi.mpp == 0.5
    wsi.cleanup()


def test_ome_tiff_sibling_planes_deduped(tmp_path: Path, canvas):
    """Full-size sibling planes on the main chain (OME channels/timepoints)
    must not masquerade as extra pyramid levels of identical size."""
    from tests.tiff_builder import write_ome_pyramid

    path = tmp_path / "multi.ome.tiff"
    arrays = write_ome_pyramid(path, canvas, levels=2, extra_planes=2)
    t = AtlasTiffFile(str(path))
    assert t.level_count == 2  # base + one reduction; siblings deduped
    np.testing.assert_array_equal(
        t.read_region_level(0, 0, 0, 512, 384), arrays[0]
    )
    t.close()
