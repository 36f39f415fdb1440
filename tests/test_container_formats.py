"""Round-trip tests for the non-TIFF slide containers (MIRAX / VMS / VMU /
DICOM WSI): synthetic spec-conformant slides from tests/container_builders.py
must come back with correct pyramid geometry, metadata, and pixels through
the first-party readers (which decode via the native library)."""

from __future__ import annotations

import numpy as np
import pytest

from atlaspatch_tpu.io.factory import WSIFactory
from tests.container_builders import (
    write_dicom_level,
    write_dicom_pyramid,
    write_mirax,
    write_vms,
    write_vmu,
)


def smooth_rgb(w: int, h: int) -> np.ndarray:
    """Low-frequency pattern so JPEG round-trip error stays tiny."""
    yy, xx = np.mgrid[0:h, 0:w]
    r = (128 + 100 * np.sin(xx / 37.0)).astype(np.uint8)
    g = (128 + 100 * np.cos(yy / 29.0)).astype(np.uint8)
    b = ((xx + yy) % 256).astype(np.uint8) // 2 + 64
    return np.stack([r, g, b.astype(np.uint8)], axis=-1)


def assert_close_rgb(a: np.ndarray, b: np.ndarray, tol: float = 8.0) -> None:
    assert a.shape == b.shape
    err = np.abs(a.astype(np.int16) - b.astype(np.int16)).mean()
    assert err < tol, f"mean abs error {err}"


# ------------------------------------------------------------------- MIRAX
class TestMirax:
    @pytest.fixture(scope="class")
    def slide(self, tmp_path_factory):
        img = smooth_rgb(256, 144)
        path = write_mirax(tmp_path_factory.mktemp("mrxs") / "case.mrxs", img,
                           tile_w=64, tile_h=48, n_levels=2, mpp=0.25, objective=20)
        return path, img

    def test_geometry_and_metadata(self, slide):
        path, img = slide
        with WSIFactory.load(str(path)) as wsi:
            assert wsi.get_size(0) == (256, 144)
            assert wsi.nlvl == 2
            assert wsi.ds == [1.0, 2.0]
            assert wsi.get_size(1) == (128, 72)
            assert wsi.mpp == 0.25
            assert wsi.mag == 20
            assert wsi.meta["mirax.SLIDE_ID"].startswith("0123")

    def test_pixels_level0(self, slide):
        path, img = slide
        with WSIFactory.load(str(path)) as wsi:
            region = wsi.extract((32, 16), 0, (96, 80), mode="array")
            assert_close_rgb(region, img[16:96, 32:128])

    def test_pixels_cross_tile(self, slide):
        """A read spanning 4 camera tiles composites seamlessly."""
        path, img = slide
        with WSIFactory.load(str(path)) as wsi:
            region = wsi.extract((48, 32), 0, (64, 48), mode="array")
            assert_close_rgb(region, img[32:80, 48:112])

    def test_level1_downsample(self, slide):
        path, img = slide
        with WSIFactory.load(str(path)) as wsi:
            region = wsi.extract((0, 0), 1, (128, 72), mode="array")
            half = img.astype(np.float32)
            half = (half[0::2, 0::2] + half[1::2, 0::2] + half[0::2, 1::2] + half[1::2, 1::2]) / 4
            assert_close_rgb(region, half.astype(np.uint8), tol=10.0)

    def test_out_of_bounds_fill(self, slide):
        path, _ = slide
        with WSIFactory.load(str(path)) as wsi:
            region = wsi.extract((-32, -32), 0, (32, 32), mode="array")
            assert (region == 255).all()

    def test_thumbnail(self, slide):
        path, _ = slide
        with WSIFactory.load(str(path)) as wsi:
            thumb = wsi.get_thumb((64, 64))
            assert max(thumb.size) <= 64

    def test_without_position_buffer(self, tmp_path):
        img = smooth_rgb(128, 96)
        path = write_mirax(tmp_path / "nopos.mrxs", img, tile_w=64, tile_h=48,
                           n_levels=1, use_position_buffer=False)
        with WSIFactory.load(str(path)) as wsi:
            assert wsi.get_size(0) == (128, 96)
            assert_close_rgb(wsi.extract((0, 0), 0, (128, 96), mode="array"), img)

    def test_compressed_position_buffer(self, tmp_path):
        img = smooth_rgb(128, 96)
        path = write_mirax(tmp_path / "zpos.mrxs", img, tile_w=64, tile_h=48,
                           n_levels=1, compress_positions=True)
        with WSIFactory.load(str(path)) as wsi:
            assert_close_rgb(wsi.extract((0, 0), 0, (128, 96), mode="array"), img)

    def test_slide_id_mismatch_rejected(self, tmp_path):
        img = smooth_rgb(64, 48)
        path = write_mirax(tmp_path / "bad.mrxs", img, tile_w=64, tile_h=48, n_levels=1)
        index = path.with_suffix("") / "Index.dat"
        raw = bytearray(index.read_bytes())
        raw[5] ^= 0xFF  # corrupt the slide id
        index.write_bytes(bytes(raw))
        with pytest.raises(RuntimeError, match="slide id mismatch"):
            WSIFactory.load(str(path))._ensure_loaded()


# ------------------------------------------------------------------ VMS/VMU
class TestHamamatsu:
    @pytest.fixture(scope="class")
    def vms(self, tmp_path_factory):
        img = smooth_rgb(256, 128)
        path = write_vms(tmp_path_factory.mktemp("vms") / "case.vms", img,
                         cols=2, rows=1, mpp=0.5, lens=20)
        return path, img

    def test_vms_levels(self, vms):
        path, img = vms
        with WSIFactory.load(str(path)) as wsi:
            assert wsi.get_size(0) == (256, 128)
            assert wsi.nlvl == 4
            assert wsi.ds == [1.0, 2.0, 4.0, 8.0]
            assert wsi.get_size(3) == (32, 16)
            assert wsi.mpp == 0.5
            assert wsi.mag == 20

    def test_vms_pixels_cross_jpeg(self, vms):
        path, img = vms
        with WSIFactory.load(str(path)) as wsi:
            region = wsi.extract((96, 32), 0, (64, 64), mode="array")
            assert_close_rgb(region, img[32:96, 96:160])

    def test_vms_scaled_level(self, vms):
        path, img = vms
        with WSIFactory.load(str(path)) as wsi:
            region = wsi.extract((0, 0), 1, (128, 64), mode="array")
            half = img.astype(np.float32)
            half = (half[0::2, 0::2] + half[1::2, 0::2] + half[0::2, 1::2] + half[1::2, 1::2]) / 4
            # libjpeg's DCT-space 1/2 is not a box filter; allow looser bound
            assert_close_rgb(region, half.astype(np.uint8), tol=12.0)

    def test_vms_windowed_decode_matches_whole(self, vms):
        """Force the partial-decode path (threshold 0): every region must be
        bit-identical to the whole-tile decode path."""
        path, img = vms
        with WSIFactory.load(str(path)) as wsi:
            wsi._ensure_loaded()
            whole = [wsi.extract((x, y), 0, (64, 48), mode="array")
                     for x, y in ((0, 0), (96, 32), (200, 90))]
            for level in wsi._levels:
                level._window_threshold = 0  # every tile takes the window path
                level.clear_cache()
            for (x, y), ref in zip(((0, 0), (96, 32), (200, 90)), whole):
                got = wsi.extract((x, y), 0, (64, 48), mode="array")
                np.testing.assert_array_equal(got, ref)
            # scaled level through the windowed path too
            region = wsi.extract((0, 0), 1, (128, 64), mode="array")
            assert region.shape == (64, 128, 3)

    def test_vms_window_fallback_crops(self, vms, monkeypatch):
        """When the native windowed decode fails, the fallback must decode
        whole and CROP to the window — regression: returning the full tile
        pasted its top-left corner at the window position (silent pixel
        corruption on any read with a nonzero tile-local offset)."""
        import atlaspatch_tpu.io.native as native

        path, img = vms

        def _boom(*a, **k):
            raise RuntimeError("simulated jpeg_decode_window failure")

        monkeypatch.setattr(native, "jpeg_decode_window", _boom)
        with WSIFactory.load(str(path)) as wsi:
            wsi._ensure_loaded()
            for level in wsi._levels:
                level._window_threshold = 0  # every tile takes the window path
                level.clear_cache()
            # nonzero offsets within both source JPEGs (cols=2 of 128 px)
            region = wsi.extract((96, 32), 0, (64, 64), mode="array")
            assert_close_rgb(region, img[32:96, 96:160])
            region = wsi.extract((200, 90), 0, (40, 30), mode="array")
            assert_close_rgb(region, img[90:120, 200:240])

    def test_vmu_exact_roundtrip(self, tmp_path):
        img = smooth_rgb(128, 64)
        path = write_vmu(tmp_path / "case.vmu", img, column_width=32, mpp=0.3, lens=40)
        with WSIFactory.load(str(path)) as wsi:
            assert wsi.get_size(0) == (128, 64)
            assert wsi.nlvl == 1
            assert wsi.mpp == 0.3
            assert wsi.mag == 40
            got = wsi.extract((0, 0), 0, (128, 64), mode="array")
            np.testing.assert_array_equal(got, img)  # NGR is lossless
            sub = wsi.extract((40, 8), 0, (50, 30), mode="array")
            np.testing.assert_array_equal(sub, img[8:38, 40:90])
            thumb = wsi.get_thumb((32, 32))
            assert max(thumb.size) <= 32


# -------------------------------------------------------------------- DICOM
class TestDicom:
    @pytest.fixture(scope="class")
    def pyramid(self, tmp_path_factory):
        img = smooth_rgb(256, 128)
        path = write_dicom_pyramid(tmp_path_factory.mktemp("dcm") / "series", img,
                                   n_levels=2, tile=64, mpp=0.25)
        return path, img

    def test_pyramid_assembly(self, pyramid):
        path, img = pyramid
        with WSIFactory.load(str(path)) as wsi:
            assert wsi.get_size(0) == (256, 128)
            assert wsi.nlvl == 2  # label.dcm excluded
            assert wsi.ds == [1.0, 2.0]
            assert wsi.mpp == 0.25
            assert wsi.mag == 20

    def test_pixels_jpeg(self, pyramid):
        path, img = pyramid
        with WSIFactory.load(str(path)) as wsi:
            region = wsi.extract((32, 32), 0, (128, 64), mode="array")
            assert_close_rgb(region, img[32:96, 32:160])

    def test_open_via_level1_file(self, pyramid):
        """Opening any instance of the series finds the whole pyramid."""
        path, _ = pyramid
        lv1 = path.parent / "level1.dcm"
        with WSIFactory.load(str(lv1)) as wsi:
            assert wsi.get_size(0) == (256, 128)
            assert wsi.nlvl == 2

    def test_uncompressed_exact(self, tmp_path):
        img = smooth_rgb(128, 64)
        path = write_dicom_level(tmp_path / "raw.dcm", img, tile=64,
                                 encapsulated=False, mpp=0.5)
        with WSIFactory.load(str(path)) as wsi:
            got = wsi.extract((0, 0), 0, (128, 64), mode="array")
            np.testing.assert_array_equal(got, img)
            assert wsi.mpp == 0.5

    def test_tiled_sparse(self, tmp_path):
        img = smooth_rgb(128, 128)
        path = write_dicom_level(tmp_path / "sparse.dcm", img, tile=64,
                                 encapsulated=False, sparse=True)
        with WSIFactory.load(str(path)) as wsi:
            got = wsi.extract((0, 0), 0, (128, 128), mode="array")
            np.testing.assert_array_equal(got, img)

    def test_label_instance_rejected_as_primary(self, tmp_path):
        import os

        img = np.full((32, 32, 3), 99, dtype=np.uint8)
        path = write_dicom_level(tmp_path / "lab.dcm", img, tile=32,
                                 image_type="ORIGINAL\\PRIMARY\\LABEL",
                                 encapsulated=False)
        # repeated rejected probes must not accumulate open handles (the
        # primary is closed on the rejection path, not left to GC)
        fds_before = len(os.listdir("/proc/self/fd"))
        for _ in range(4):
            with pytest.raises(RuntimeError, match="LABEL"):
                WSIFactory.load(str(path))._ensure_loaded()
        assert len(os.listdir("/proc/self/fd")) <= fds_before

    def test_handles_closed_on_cleanup_and_malformed(self, tmp_path):
        """File handles/mmaps must be released: a malformed instance raises
        the diagnostic _DicomError (regression: a missing close() turned it
        into AttributeError) without leaking its fd, and cleanup() closes
        every kept instance."""
        import os

        from atlaspatch_tpu.io.dicom_wsi import _DicomError, _DicomLevel

        junk = tmp_path / "junk.dcm"
        junk.write_bytes(b"\x00" * 200)
        fds_before = len(os.listdir("/proc/self/fd"))
        for _ in range(5):
            with pytest.raises(_DicomError):
                _DicomLevel(junk)
        assert len(os.listdir("/proc/self/fd")) <= fds_before

        img = smooth_rgb(64, 64)
        path = write_dicom_level(tmp_path / "ok.dcm", img, tile=64,
                                 encapsulated=False)
        wsi = WSIFactory.load(str(path))
        wsi._ensure_loaded()
        instances = list(wsi._instances)
        assert instances
        wsi.cleanup()
        for inst in instances:
            assert inst.buf is None and inst._f is None


def test_tiled_decode_window_none_falls_back():
    """A decode_window returning None (documented 'caller falls back'
    contract) must route to the full-tile decode — regression: the tile was
    skipped entirely, silently reading as fill color."""
    from atlaspatch_tpu.io.tiled import TiledLevel

    rng = np.random.default_rng(5)
    tile = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    lvl = TiledLevel(
        32, 32, 1.0, [(0, 0, 32, 32, "k")],
        lambda key: tile,
        decode_window=lambda *a: None,
        window_threshold_bytes=0,  # force the window path for every tile
    )
    np.testing.assert_array_equal(lvl.read_region(4, 6, 10, 12), tile[6:18, 4:14])


# ------------------------------------------------------- pipeline integration
def test_containers_feed_patch_extraction(tmp_path):
    """A MIRAX slide flows through the real extraction service: mask →
    contours → grid → H5 coords, same as TIFF-backed slides."""
    from pathlib import Path

    from atlaspatch_tpu.core.config import ExtractionConfig, OutputConfig
    from atlaspatch_tpu.core.models import Slide
    from atlaspatch_tpu.services.extraction import PatchExtractionService

    img = np.full((256, 256, 3), 230, dtype=np.uint8)
    img[32:224, 32:224] = (180, 60, 120)  # "tissue" block
    path = write_mirax(tmp_path / "tissue.mrxs", img, tile_w=64, tile_h=64,
                       n_levels=1, mpp=0.5, objective=20)
    wsi = WSIFactory.load(str(path))
    wsi._ensure_loaded()
    mask = np.zeros((64, 64), dtype=np.float32)
    mask[8:56, 8:56] = 1.0
    svc = PatchExtractionService(
        ExtractionConfig(patch_size=64, target_magnification=20).validated(),
        OutputConfig(output_root=tmp_path / "out").validated(),
    )
    result = svc.extract(wsi, mask, slide=Slide(path=Path(path), mpp=0.5))
    assert result.num_patches > 0
    import h5py

    with h5py.File(result.h5_path, "r") as f:
        coords = f["coords"][:]
        assert coords.shape[1] == 5
        assert coords.shape[0] == result.num_patches


# ------------------------------------------------------------------ fuzzing
class TestContainerFuzz:
    """Corrupt container files must raise clean exceptions — never hang,
    never crash the process (same hardening bar as the native TIFF decoder,
    tests/test_native_tiff.py fuzz section)."""

    N_MUTATIONS = 40

    def _fuzz_open(self, path, mutate_file):
        rng = np.random.default_rng(1234)
        original = mutate_file.read_bytes()
        for _ in range(self.N_MUTATIONS):
            raw = bytearray(original)
            for _ in range(rng.integers(1, 8)):
                pos = int(rng.integers(0, len(raw)))
                raw[pos] = int(rng.integers(0, 256))
            mutate_file.write_bytes(bytes(raw))
            try:
                wsi = WSIFactory.load(str(path))
                wsi._ensure_loaded()
                # A surviving parse must still serve bounded reads.
                wsi.extract((0, 0), 0, (16, 16), mode="array")
                wsi.cleanup()
            except Exception:
                pass  # any clean Python exception is acceptable
        mutate_file.write_bytes(original)

    def test_mirax_index_fuzz(self, tmp_path):
        img = smooth_rgb(128, 96)
        path = write_mirax(tmp_path / "f.mrxs", img, tile_w=64, tile_h=48, n_levels=2)
        self._fuzz_open(path, path.with_suffix("") / "Index.dat")

    def test_mirax_slidedat_fuzz(self, tmp_path):
        img = smooth_rgb(128, 96)
        path = write_mirax(tmp_path / "g.mrxs", img, tile_w=64, tile_h=48, n_levels=1)
        self._fuzz_open(path, path.with_suffix("") / "Slidedat.ini")

    def test_dicom_fuzz(self, tmp_path):
        img = smooth_rgb(128, 64)
        path = write_dicom_level(tmp_path / "f.dcm", img, tile=64)
        self._fuzz_open(path, path)

    def test_vmu_ngr_fuzz(self, tmp_path):
        img = smooth_rgb(128, 64)
        path = write_vmu(tmp_path / "f.vmu", img, column_width=32)
        self._fuzz_open(path, path.parent / "f.ngr")


def test_dicom_implicit_vr_tiled_sparse(tmp_path: Path):
    """Implicit VR LE (1.2.840.10008.1.2) with TILED_SPARSE: the SL-typed
    frame matrix positions carry no VR bytes and must decode by tag."""
    rng = np.random.default_rng(70)
    img = rng.integers(0, 256, (96, 128, 3), dtype=np.uint8)
    p = write_dicom_level(
        tmp_path / "impl.dcm", img, tile=64, encapsulated=False,
        implicit=True, sparse=True, mpp=0.5, objective=20.0,
    )
    from atlaspatch_tpu.io.dicom_wsi import DicomWSI

    wsi = DicomWSI(path=str(p))
    wsi._ensure_loaded()
    assert wsi.get_size(lv=0) == (128, 96)
    assert wsi.mpp == 0.5
    out = wsi.extract((0, 0), 0, (128, 96))
    np.testing.assert_array_equal(out, img)
    wsi.cleanup()


def test_dicom_nonbase_instance_reports_base_mpp(tmp_path: Path):
    """Opening a downsampled sibling of a multi-file pyramid must report the
    BASE level's MPP — dimensions come from the base, so taking the opened
    instance's spacing would put the patch grid at the wrong scale."""
    rng = np.random.default_rng(71)
    level0 = rng.integers(0, 256, (128, 192, 3), dtype=np.uint8)
    write_dicom_pyramid(tmp_path, level0, n_levels=2, tile=64, mpp=0.25,
                        encapsulated=False)
    from atlaspatch_tpu.io.dicom_wsi import DicomWSI

    wsi = DicomWSI(path=str(tmp_path / "level1.dcm"))
    wsi._ensure_loaded()
    assert wsi.get_size(lv=0) == (192, 128)  # base dims
    assert wsi.mpp == 0.25  # base spacing, not level1's 0.5
    wsi.cleanup()


def test_dicom_series_discovery_keeps_only_base(tmp_path: Path):
    """Slide discovery returns ONE file per DICOM series (the base VOLUME
    instance) — not every level/LABEL file of a multi-file pyramid."""
    rng = np.random.default_rng(72)
    level0 = rng.integers(0, 256, (128, 192, 3), dtype=np.uint8)
    base = write_dicom_pyramid(tmp_path, level0, n_levels=3, tile=64,
                               mpp=0.25, encapsulated=False, with_label=True)
    from atlaspatch_tpu.utils.params import get_wsi_files

    files = get_wsi_files(str(tmp_path))
    assert files == [str(base)]

    # a second, unrelated series in the same directory stays discoverable
    other = rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)
    p2 = write_dicom_level(
        tmp_path / "other.dcm", other, tile=32, encapsulated=False,
        series_uid="9.9.9.9", sop_uid="9.9.9.9.1",
    )
    files = sorted(get_wsi_files(str(tmp_path)))
    assert files == sorted([str(base), str(p2)])


def test_mirax_corrupt_position_buffer_stays_bounded(tmp_path):
    """A corrupt camera position (int32 near 2^31) must not inflate the
    level extent: out-of-grid positions fall back to the regular camera
    pitch and the thumbnail stays allocation-bounded. Regression: the fuzz
    campaign (tools/fuzz_decoders.py) found a multi-minute hang allocating
    the declared terabyte-scale canvas in get_thumb."""
    import struct
    import time

    img = smooth_rgb(128, 96)
    path = write_mirax(tmp_path / "h.mrxs", img, tile_w=64, tile_h=48, n_levels=1)
    data = path.with_suffix("") / "Data0000.dat"
    raw = bytearray(data.read_bytes())
    # The position buffer is the file's tail: 9 bytes/camera, 2x2 grid.
    pos_off = len(raw) - 9 * 4
    assert raw[pos_off] == 1  # camera-present flag where we expect it
    struct.pack_into("<ii", raw, pos_off + 1, 2**31 - 9, 2**31 - 9)
    data.write_bytes(bytes(raw))

    t0 = time.monotonic()
    wsi = WSIFactory.load(str(path))
    wsi._ensure_loaded()
    assert (wsi.w, wsi.h) == (128, 96)  # corrupt camera fell back to pitch
    thumb = wsi.get_thumb((32, 32))
    assert max(thumb.size) <= 32
    assert time.monotonic() - t0 < 30
    wsi.cleanup()


def test_thumbnail_source_pixel_cap():
    """Containers whose metadata declares absurd level dimensions must be
    refused cleanly by the shared thumbnail path, never allocated."""
    from atlaspatch_tpu.io.tiled import TiledLevel, thumb_from_level

    lvl = TiledLevel(2**20, 2**20, 1.0, [], lambda k: None)
    with pytest.raises(RuntimeError, match="safety cap"):
        thumb_from_level(lvl, (32, 32))


def test_dicom_j2k_lossless_roundtrip(tmp_path):
    """JPEG2000 transfer syntax (1.2.840.10008.1.2.4.90): frames decode
    through the native J2K path; lossless encode must round-trip bit-exactly
    (the reader's advertised J2K support previously had no synthetic
    coverage — only JPEG baseline and native frames)."""
    pytest.importorskip("atlaspatch_tpu.io.native")
    import ctypes

    try:
        ctypes.CDLL("libopenjp2.so.7")
    except OSError:
        pytest.skip("libopenjp2 not installed")

    img = smooth_rgb(160, 96)
    path = write_dicom_level(tmp_path / "j.dcm", img, tile=64, codec="j2k")
    wsi = WSIFactory.load(str(path))
    wsi._ensure_loaded()
    assert (wsi.w, wsi.h) == (160, 96)
    out = np.asarray(wsi.extract((0, 0), 0, (160, 96), mode="array"))
    np.testing.assert_array_equal(out, img)
    # Unaligned window across tile seams.
    sub = np.asarray(wsi.extract((40, 30), 0, (90, 50), mode="array"))
    np.testing.assert_array_equal(sub, img[30:80, 40:130])
    wsi.cleanup()


def test_dicom_j2k_ycbcr_transform(tmp_path):
    """.4.91 with YBR photometric: components are YCbCr and the reader must
    apply the RGB transform outside the codestream (force_ycbcr). Oracle:
    encode YCbCr planes losslessly and invert with the decoder's exact
    libjpeg-style fixed-point math in numpy (same oracle as the Aperio
    33003 test, tests/test_native_tiff.py)."""
    pytest.importorskip("atlaspatch_tpu.io.native")
    import ctypes

    try:
        ctypes.CDLL("libopenjp2.so.7")
    except OSError:
        pytest.skip("libopenjp2 not installed")
    from tests.tiff_builder import rgb_to_full_range_ycbcr

    img = smooth_rgb(160, 96)
    path = write_dicom_level(tmp_path / "jy.dcm", img, tile=64, codec="j2k_ycc")

    ycc = rgb_to_full_range_ycbcr(img)
    y = ycc[..., 0].astype(np.int64)
    cb_ = ycc[..., 1].astype(np.int64) - 128
    cr = ycc[..., 2].astype(np.int64) - 128
    expect = np.clip(
        np.stack(
            [
                y + ((91881 * cr + 32768) >> 16),
                y - ((22554 * cb_ + 46802 * cr + 32768) >> 16),
                y + ((116130 * cb_ + 32768) >> 16),
            ],
            axis=-1,
        ),
        0, 255,
    ).astype(np.uint8)

    wsi = WSIFactory.load(str(path))
    wsi._ensure_loaded()
    out = np.asarray(wsi.extract((0, 0), 0, (160, 96), mode="array"))
    np.testing.assert_array_equal(out, expect)
    # The round trip stays within fixed-point rounding of the source image.
    assert np.abs(out.astype(np.int32) - img.astype(np.int32)).max() <= 2
    wsi.cleanup()


@pytest.mark.parametrize("fmt", ["PNG", "BMP"])
def test_mirax_png_bmp_tiles_roundtrip(tmp_path, fmt):
    """Some MIRAX versions store PNG or BMP tiles instead of JPEG
    (IMAGE_FORMAT in Slidedat.ini); lossless codecs must round-trip
    bit-exactly through the reader's PIL fallback path."""
    img = smooth_rgb(128, 96)
    path = write_mirax(tmp_path / "p.mrxs", img, tile_w=64, tile_h=48,
                       n_levels=1, image_format=fmt)
    wsi = WSIFactory.load(str(path))
    wsi._ensure_loaded()
    assert (wsi.w, wsi.h) == (128, 96)
    out = np.asarray(wsi.extract((0, 0), 0, (128, 96), mode="array"))
    np.testing.assert_array_equal(out, img)
    sub = np.asarray(wsi.extract((50, 30), 0, (60, 40), mode="array"))
    np.testing.assert_array_equal(sub, img[30:70, 50:110])
    wsi.cleanup()


@pytest.mark.parametrize("mono", ["MONOCHROME2", "MONOCHROME1"])
def test_dicom_grayscale_frames(tmp_path, mono):
    """Grayscale DICOM WSI (SamplesPerPixel 1, native frames): MONOCHROME2
    maps straight to gray RGB, MONOCHROME1 inverts (0 = white)."""
    rng = np.random.default_rng(71)
    img = rng.integers(0, 255, (96, 160), np.uint8)
    path = write_dicom_level(tmp_path / f"g{mono[-1]}.dcm", img, tile=64,
                             encapsulated=False, monochrome=mono)
    wsi = WSIFactory.load(str(path))
    wsi._ensure_loaded()
    assert (wsi.w, wsi.h) == (160, 96)
    out = np.asarray(wsi.extract((0, 0), 0, (160, 96), mode="array"))
    base = img if mono == "MONOCHROME2" else (255 - img)
    np.testing.assert_array_equal(out, np.repeat(base[:, :, None], 3, axis=2))
    wsi.cleanup()
