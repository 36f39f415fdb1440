"""Native library loader + ctypes bindings for the host I/O and geometry plane.

Builds libatlas_native.so on first use (g++ -O3, linking libjpeg + zlib) and
caches it next to the sources; exposes:

  AtlasTiffFile       — pyramid slide decoder (atlas_tiff.cc)
  native_find_contours — Suzuki border following with CCOMP parents
                         (atlas_contours.cc)

Both release the GIL during calls (ctypes), so Python thread pools get real
decode parallelism.
"""

from __future__ import annotations

import ctypes
import json
import os
import logging
import subprocess
import threading
from pathlib import Path

import numpy as np

logger = logging.getLogger("atlaspatch_tpu.io.native")

_SRC_DIR = Path(__file__).resolve().parent
_LIB_PATH = _SRC_DIR / "libatlas_native.so"
_SOURCES = [
    _SRC_DIR / "atlas_tiff.cc",
    _SRC_DIR / "atlas_contours.cc",
    _SRC_DIR / "atlas_j2k.cc",
]
_BUILD_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_LOAD_FAILED = False


def _needs_build() -> bool:
    if not _LIB_PATH.exists():
        return True
    lib_mtime = _LIB_PATH.stat().st_mtime
    return any(src.stat().st_mtime > lib_mtime for src in _SOURCES)


def build_library(force: bool = False) -> Path:
    with _BUILD_LOCK:
        if force or _needs_build():
            # compile to a temp name + atomic rename: a concurrent process
            # must never dlopen a partially written .so (the _BUILD_LOCK is
            # per-process only)
            tmp = _LIB_PATH.with_name(f".{_LIB_PATH.name}.{os.getpid()}.tmp")
            cmd = [
                "g++",
                "-O3",
                "-std=c++17",
                "-shared",
                "-fPIC",
                "-o",
                str(tmp),
                *[str(s) for s in _SOURCES],
                "-ljpeg",
                "-lz",
                "-ldl",
            ]
            logger.info("Building native library: %s", " ".join(cmd))
            try:
                subprocess.run(cmd, check=True, capture_output=True, text=True)
                os.replace(tmp, _LIB_PATH)
            finally:
                tmp.unlink(missing_ok=True)
    return _LIB_PATH


def load_library() -> ctypes.CDLL:
    global _LIB, _LOAD_FAILED
    if _LIB is not None:
        return _LIB
    if _LOAD_FAILED:
        raise ImportError("native library previously failed to build/load")
    try:
        path = build_library()
        lib = ctypes.CDLL(str(path))
    except Exception as e:  # noqa: BLE001
        _LOAD_FAILED = True
        raise ImportError(f"failed to build/load native library: {e}") from e

    lib.atlas_open.restype = ctypes.c_void_p
    lib.atlas_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int]
    lib.atlas_close.argtypes = [ctypes.c_void_p]
    lib.atlas_num_levels.restype = ctypes.c_int
    lib.atlas_num_levels.argtypes = [ctypes.c_void_p]
    lib.atlas_level_info.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.atlas_properties_json.restype = ctypes.c_char_p
    lib.atlas_properties_json.argtypes = [ctypes.c_void_p]
    lib.atlas_read_region.restype = ctypes.c_int
    lib.atlas_read_region.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_char_p,
        ctypes.c_int,
    ]
    lib.atlas_read_region_scaled.restype = ctypes.c_int
    lib.atlas_read_region_scaled.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_char_p,
        ctypes.c_int,
    ]
    lib.atlas_j2k_decode.restype = ctypes.c_int
    lib.atlas_j2k_decode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_char_p,
        ctypes.c_int,
    ]
    lib.atlas_jpeg_info.restype = ctypes.c_int
    lib.atlas_jpeg_info.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.atlas_jpeg_decode.restype = ctypes.c_int
    lib.atlas_jpeg_decode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.c_int64,
    ]
    lib.atlas_jpeg_decode_window.restype = ctypes.c_int
    lib.atlas_jpeg_decode_window.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.atlas_find_contours.restype = ctypes.c_int
    lib.atlas_find_contours.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
    ]
    lib.atlas_points_polygon_test.restype = ctypes.c_int
    lib.atlas_points_polygon_test.argtypes = [
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int8),
    ]
    _LIB = lib
    return lib


class AtlasTiffFile:
    """Thin RAII wrapper over the native pyramid decoder."""

    def __init__(self, path: str) -> None:
        lib = load_library()
        err = ctypes.create_string_buffer(512)
        handle = lib.atlas_open(str(path).encode(), err, len(err))
        if not handle:
            raise RuntimeError(
                f"atlas_tiff: cannot open {path}: {err.value.decode(errors='replace')}"
            )
        self._lib = lib
        self._handle = ctypes.c_void_p(handle)
        self.path = str(path)
        self.level_count = lib.atlas_num_levels(self._handle)
        self.level_dimensions: list[tuple[int, int]] = []
        self.level_downsamples: list[float] = []
        for lv in range(self.level_count):
            w = ctypes.c_int64()
            h = ctypes.c_int64()
            ds = ctypes.c_double()
            lib.atlas_level_info(self._handle, lv, ctypes.byref(w), ctypes.byref(h), ctypes.byref(ds))
            self.level_dimensions.append((int(w.value), int(h.value)))
            self.level_downsamples.append(float(ds.value))
        self.properties: dict[str, str] = json.loads(
            lib.atlas_properties_json(self._handle).decode(errors="replace")
        )

    @property
    def dimensions(self) -> tuple[int, int]:
        return self.level_dimensions[0]

    def read_region_level(self, level: int, x: int, y: int, w: int, h: int) -> np.ndarray:
        """Read an RGB region; x/y in LEVEL coordinates. Out-of-bounds pads
        black (OpenSlide read_region parity)."""
        out = np.empty((h, w, 3), dtype=np.uint8)
        err = ctypes.create_string_buffer(512)
        rc = self._lib.atlas_read_region(
            self._handle,
            int(level),
            int(x),
            int(y),
            int(w),
            int(h),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            err,
            len(err),
        )
        if rc != 0:
            raise RuntimeError(
                f"atlas_tiff: read_region failed: {err.value.decode(errors='replace')}"
            )
        return out

    def read_region_level_scaled(
        self, level: int, x: int, y: int, w: int, h: int, scale_denom: int
    ) -> "np.ndarray | None":
        """Read an RGB region decoded at 1/scale_denom (libjpeg IDCT scaling).

        x/y/w/h in LEVEL coordinates; output is ceil(w/s) x ceil(h/s) x 3.
        Returns None when the level cannot be decoded scaled (non-JPEG
        compression, off-grid geometry) — callers fall back to
        read_region_level + host resize. Backs the thumbnail fast path
        (reference reads the full level then resizes: iwsi.py:246-323).
        """
        s = int(scale_denom)
        ow = (w + s - 1) // s
        oh = (h + s - 1) // s
        out = np.empty((oh, ow, 3), dtype=np.uint8)
        err = ctypes.create_string_buffer(512)
        rc = self._lib.atlas_read_region_scaled(
            self._handle,
            int(level),
            int(x),
            int(y),
            int(w),
            int(h),
            s,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            err,
            len(err),
        )
        if rc == -2:
            return None
        if rc != 0:
            raise RuntimeError(
                f"atlas_tiff: scaled read failed: {err.value.decode(errors='replace')}"
            )
        return out

    def close(self) -> None:
        if getattr(self, "_handle", None):
            self._lib.atlas_close(self._handle)
            self._handle = None

    def __del__(self) -> None:
        try:
            self.close()
        except Exception:
            pass


def jpeg_image_info(buf: bytes, scale_denom: int = 1) -> tuple[int, int]:
    """(width, height) of a standalone JPEG stream at 1/scale_denom."""
    lib = load_library()
    data = np.frombuffer(buf, dtype=np.uint8)
    w = ctypes.c_int64()
    h = ctypes.c_int64()
    rc = lib.atlas_jpeg_info(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        data.size,
        int(scale_denom),
        ctypes.byref(w),
        ctypes.byref(h),
    )
    if rc != 0:
        raise RuntimeError("atlas_jpeg_info: not a decodable JPEG stream")
    return int(w.value), int(h.value)


def jpeg_decode(buf: bytes, scale_denom: int = 1) -> np.ndarray:
    """Decode a standalone JPEG stream to an RGB uint8 array at 1/scale_denom.

    Backs tile decode for the non-TIFF slide containers (MIRAX / Hamamatsu /
    DICOM); releases the GIL, so thread pools decode in parallel.
    """
    w, h = jpeg_image_info(buf, scale_denom)
    lib = load_library()
    data = np.frombuffer(buf, dtype=np.uint8)
    out = np.empty((h, w, 3), dtype=np.uint8)
    rc = lib.atlas_jpeg_decode(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        data.size,
        int(scale_denom),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        w,
        h,
    )
    if rc != 0:
        raise RuntimeError(f"atlas_jpeg_decode failed ({rc})")
    return out


def jpeg_decode_window(
    buf: bytes, scale_denom: int, x: int, y: int, w: int, h: int
) -> np.ndarray:
    """Decode only an (x, y, w, h) window of a JPEG stream, in coordinates of
    the 1/scale_denom output space (libjpeg-turbo crop + skip-scanlines).

    Cost scales with the window's MCU rows, not the whole image — the
    Hamamatsu VMS backend uses this so multi-gigapixel source JPEGs never
    decode whole per region read.
    """
    lib = load_library()
    data = np.frombuffer(buf, dtype=np.uint8)
    out = np.empty((h, w, 3), dtype=np.uint8)
    rc = lib.atlas_jpeg_decode_window(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        data.size,
        int(scale_denom),
        int(x),
        int(y),
        int(w),
        int(h),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise RuntimeError(f"atlas_jpeg_decode_window failed ({rc})")
    return out


def j2k_decode_rgb(buf: bytes, w: int, h: int, spp: int = 3, force_ycbcr: bool = False) -> np.ndarray:
    """Decode a JPEG2000 codestream of known dimensions to an RGB(ish) array.

    Used by the DICOM backend for .4.90/.4.91 transfer syntaxes; dims come
    from the DICOM dataset. Requires libopenjp2 (dlopen'd; clean error if
    absent)."""
    lib = load_library()
    data = np.frombuffer(buf, dtype=np.uint8)
    out = np.empty((h, w, spp), dtype=np.uint8)
    err = ctypes.create_string_buffer(256)
    rc = lib.atlas_j2k_decode(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        data.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        w,
        h,
        int(spp),
        1 if force_ycbcr else 0,
        err,
        len(err),
    )
    if rc != 0:
        raise RuntimeError(f"atlas_j2k_decode failed: {err.value.decode(errors='replace')}")
    return out


def native_points_polygon_test(polygon: np.ndarray, points: np.ndarray):
    """Batched pointPolygonTest(measureDist=False): (M,) int8 of +1/0/-1.

    Returns None when the native library is unavailable (caller falls back to
    the numpy implementation in ops/polygon.py, which is also the oracle).
    """
    try:
        lib = load_library()
    except ImportError:
        return None
    poly = np.ascontiguousarray(np.asarray(polygon, dtype=np.int64).reshape(-1, 2))
    pts = np.ascontiguousarray(np.asarray(points, dtype=np.int64).reshape(-1, 2))
    out = np.empty(pts.shape[0], dtype=np.int8)
    rc = lib.atlas_points_polygon_test(
        poly.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        poly.shape[0],
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        pts.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
    )
    if rc != 0:
        raise RuntimeError(f"atlas_points_polygon_test failed ({rc})")
    return out


def native_find_contours(mask_u8: np.ndarray):
    """Binary mask {0,255} → (contours as (N,1,2) int32 list, parents int64).

    Matches cv2.findContours(RETR_CCOMP, CHAIN_APPROX_NONE) output. Returns
    None when the native library is unavailable (caller falls back to cv2).
    """
    try:
        lib = load_library()
    except ImportError:
        return None
    mask = np.ascontiguousarray(mask_u8, dtype=np.uint8)
    h, w = mask.shape[:2]
    mask_ptr = mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))

    # First pass: count
    n = lib.atlas_find_contours(mask_ptr, h, w, 1 << 22, None, None, None, None, 0)
    if n < 0:
        raise RuntimeError(f"atlas_find_contours failed ({n})")
    if n == 0:
        return [], np.empty((0,), dtype=np.int64)

    n_points = np.zeros(n, dtype=np.int64)
    parents = np.zeros(n, dtype=np.int64)
    is_hole = np.zeros(n, dtype=np.uint8)
    # Upper bound on total boundary length: all pixels
    capacity = int(mask.size) * 4 + 8 * n
    points = np.zeros(capacity, dtype=np.int64)
    rc = lib.atlas_find_contours(
        mask_ptr,
        h,
        w,
        n,
        n_points.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        parents.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        is_hole.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        points.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        capacity,
    )
    if rc < 0:
        raise RuntimeError(f"atlas_find_contours failed ({rc})")

    contours: list[np.ndarray] = []
    off = 0
    for i in range(n):
        cnt = points[off : off + 2 * n_points[i]].reshape(-1, 2).astype(np.int32)
        contours.append(cnt.reshape(-1, 1, 2))
        off += 2 * int(n_points[i])

    # Reorder to cv2's output sequence: top-level contours in reverse discovery
    # order, each immediately followed by its holes (also reverse discovery).
    children: dict[int, list[int]] = {}
    top: list[int] = []
    for i in range(n):
        if parents[i] == -1:
            top.append(i)
        else:
            children.setdefault(int(parents[i]), []).append(i)
    order: list[int] = []
    for t in reversed(top):
        order.append(t)
        order.extend(reversed(children.get(t, [])))
    new_index = {old: new for new, old in enumerate(order)}
    out_contours = [contours[old] for old in order]
    out_parents = np.array(
        [-1 if parents[old] == -1 else new_index[int(parents[old])] for old in order],
        dtype=np.int64,
    )
    return out_contours, out_parents
