"""Synthetic non-TIFF slide containers for round-trip tests.

Writers for spec-conformant MIRAX (.mrxs), Hamamatsu VMS/VMU, and DICOM WSI
files, following the same public format descriptions the readers in
atlaspatch_tpu/io/{mirax,hamamatsu,dicom}_wsi.py implement. Each builder
takes a level-0 RGB array and produces a slide on disk; tests assert the
reader recovers pixels, pyramid geometry, and MPP.

JPEG tiles are written via PIL (encode side only — the readers decode via
the native library, so round-trip exercises the real decode path).
"""

from __future__ import annotations

import io
import struct
import zlib
from pathlib import Path

import numpy as np
from PIL import Image


def _jpeg_bytes(arr: np.ndarray, quality: int = 95) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def _halve(arr: np.ndarray) -> np.ndarray:
    """2x box downsample (pads odd edges by clamping)."""
    h, w = arr.shape[:2]
    ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
    padded = np.pad(arr, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    a = padded.astype(np.uint16)
    out = (a[0::2, 0::2] + a[1::2, 0::2] + a[0::2, 1::2] + a[1::2, 1::2] + 2) // 4
    return out.astype(np.uint8)


# --------------------------------------------------------------------- MIRAX
def write_mirax(
    path: Path,
    level0: np.ndarray,
    *,
    tile_w: int = 64,
    tile_h: int = 48,
    n_levels: int = 2,
    mpp: float = 0.25,
    objective: int = 20,
    use_position_buffer: bool = True,
    compress_positions: bool = False,
    fill_bgr: int = 0xFFFFFF,
    image_format: str = "JPEG",
) -> Path:
    """Write <path>.mrxs + data directory. level0 is the full slide image;
    the camera grid is derived from tile size (no overlap). image_format
    "PNG" or "BMP" stores lossless tiles (some MIRAX versions do)."""
    path = Path(path)
    assert path.suffix == ".mrxs"
    h0, w0 = level0.shape[:2]
    grid_x = -(-w0 // tile_w)
    grid_y = -(-h0 // tile_h)
    slide_id = "0123456789ABCDEF0123456789ABCDEF"

    data_dir = path.with_suffix("")
    data_dir.mkdir(parents=True, exist_ok=True)

    # ----- data file: tile payloads, one data file for simplicity
    payload = bytearray()
    tile_entries: dict[int, list[tuple[int, int, int, int]]] = {}
    levels = [level0]
    for _ in range(1, n_levels):
        levels.append(_halve(levels[-1]))

    for k in range(n_levels):
        concat = 2**k
        entries = []
        img = levels[k]
        lh, lw = img.shape[:2]
        for cy in range(0, grid_y, concat):
            for cx in range(0, grid_x, concat):
                # tile at level k covering cameras [cx, cx+concat) x [cy, ...)
                x = cx * tile_w // concat
                y = cy * tile_h // concat
                tile = np.full((tile_h, tile_w, 3), 255, dtype=np.uint8)
                sub = img[y : y + tile_h, x : x + tile_w]
                if sub.size == 0:
                    continue
                tile[: sub.shape[0], : sub.shape[1]] = sub
                if image_format == "JPEG":
                    blob = _jpeg_bytes(tile)
                else:  # PNG / BMP lossless variants
                    import io as _io

                    from PIL import Image as _Image

                    b = _io.BytesIO()
                    _Image.fromarray(tile).save(b, image_format)
                    blob = b.getvalue()
                entries.append((cy * grid_x + cx, len(payload), len(blob), 0))
                payload.extend(blob)
        tile_entries[k] = entries

    # Camera position buffer (9 bytes per camera, level-0 pixels).
    pos_buf = bytearray()
    for cy in range(grid_y):
        for cx in range(grid_x):
            pos_buf.append(1)
            pos_buf.extend(struct.pack("<ii", cx * tile_w, cy * tile_h))
    pos_raw = zlib.compress(bytes(pos_buf)) if compress_positions else bytes(pos_buf)
    pos_offset = len(payload)
    payload.extend(pos_raw)
    (data_dir / "Data0000.dat").write_bytes(bytes(payload))

    # ----- Index.dat
    n_hier_records = n_levels
    n_nonhier_records = 1 if use_position_buffer else 0
    header = b"01.02" + slide_id.encode()
    # layout: header | hier_root table | nonhier_root table | record blobs
    hier_root = len(header) + 8
    nonhier_root = hier_root + 4 * n_hier_records
    blob_start = nonhier_root + 4 * n_nonhier_records

    blobs = bytearray()
    hier_ptrs: list[int] = []

    def add_record(entries: list[tuple[int, int, int, int]]) -> int:
        """Append indirection int32 -> page; returns pointer to indirection."""
        ptr = blob_start + len(blobs)
        page_ptr = ptr + 4
        blobs.extend(struct.pack("<i", page_ptr))
        blobs.extend(struct.pack("<ii", len(entries), 0))
        for e in entries:
            blobs.extend(struct.pack("<iiii", *e))
        return ptr

    for k in range(n_levels):
        hier_ptrs.append(add_record(tile_entries[k]))
    nonhier_ptrs = []
    if use_position_buffer:
        nonhier_ptrs.append(add_record([(0, pos_offset, len(pos_raw), 0)]))

    index = bytearray(header)
    index.extend(struct.pack("<ii", hier_root, nonhier_root))
    for p in hier_ptrs:
        index.extend(struct.pack("<i", p))
    for p in nonhier_ptrs:
        index.extend(struct.pack("<i", p))
    index.extend(blobs)
    (data_dir / "Index.dat").write_bytes(bytes(index))

    # ----- Slidedat.ini
    lines = [
        "[GENERAL]",
        "SLIDE_VERSION = 1.9",
        f"SLIDE_ID = {slide_id}",
        f"IMAGENUMBER_X = {grid_x}",
        f"IMAGENUMBER_Y = {grid_y}",
        f"OBJECTIVE_MAGNIFICATION = {objective}",
        "SLIDE_NAME = synthetic",
        "",
        "[HIERARCHICAL]",
        "HIER_COUNT = 1",
        f"NONHIER_COUNT = {1 if use_position_buffer else 0}",
        "HIER_0_NAME = Slide zoom level",
        f"HIER_0_COUNT = {n_levels}",
        "INDEXFILE = Index.dat",
    ]
    for k in range(n_levels):
        lines += [
            f"HIER_0_VAL_{k} = ZoomLevel_{k}",
            f"HIER_0_VAL_{k}_SECTION = LAYER_0_LEVEL_{k}_SECTION",
        ]
    if use_position_buffer:
        lines += [
            "NONHIER_0_NAME = VIMSLIDE_POSITION_BUFFER",
            "NONHIER_0_COUNT = 1",
            "NONHIER_0_VAL_0 = default",
        ]
    lines += [
        "",
        "[DATAFILE]",
        "FILE_COUNT = 1",
        "FILE_0 = Data0000.dat",
    ]
    for k in range(n_levels):
        lines += [
            "",
            f"[LAYER_0_LEVEL_{k}_SECTION]",
            f"DIGITIZER_WIDTH = {tile_w}",
            f"DIGITIZER_HEIGHT = {tile_h}",
            "OVERLAP_X = 0",
            "OVERLAP_Y = 0",
            f"IMAGE_FORMAT = {image_format}",
            f"IMAGE_CONCAT_FACTOR = {2**k}",
            f"IMAGE_FILL_COLOR_BGR = {fill_bgr}",
            f"MICROMETER_PER_PIXEL_X = {mpp * 2**k}",
            f"MICROMETER_PER_PIXEL_Y = {mpp * 2**k}",
        ]
    (data_dir / "Slidedat.ini").write_text("\n".join(lines) + "\n")
    path.write_bytes(b"MIRAX")  # marker file
    return path


# ---------------------------------------------------------------- Hamamatsu
def write_vms(
    path: Path,
    level0: np.ndarray,
    *,
    cols: int = 2,
    rows: int = 1,
    mpp: float = 0.25,
    lens: int = 20,
    quality: int = 95,
) -> Path:
    """Write a .vms map file + JPEG grid. level0 is split evenly."""
    path = Path(path)
    assert path.suffix == ".vms"
    h0, w0 = level0.shape[:2]
    assert w0 % cols == 0 and h0 % rows == 0, "grid must divide the image"
    tw, th = w0 // cols, h0 // rows
    lines = [
        "[Virtual Microscope Specimen]",
        "NoLayers=1",
        f"NoJpegColumns={cols}",
        f"NoJpegRows={rows}",
    ]
    for r in range(rows):
        for c in range(cols):
            name = f"{path.stem}_{c}_{r}.jpg"
            tile = level0[r * th : (r + 1) * th, c * tw : (c + 1) * tw]
            (path.parent / name).write_bytes(_jpeg_bytes(tile, quality))
            if (c, r) == (0, 0):
                lines.append(f"ImageFile={name}")
            elif r == 0:
                lines.append(f"ImageFile({c})={name}")
            else:
                lines.append(f"ImageFile({c},{r})={name}")
    lines += [
        f"SourceLens={lens}",
        f"PhysicalWidth={int(round(w0 * mpp * 1000))}",  # nanometres
        f"PhysicalHeight={int(round(h0 * mpp * 1000))}",
    ]
    path.write_text("\n".join(lines) + "\n")
    return path


def write_vmu(
    path: Path,
    level0: np.ndarray,
    *,
    column_width: int = 32,
    mpp: float = 0.25,
    lens: int = 20,
) -> Path:
    """Write a .vmu map file + NGR raw image (16-bit LE RGB column blocks)."""
    path = Path(path)
    assert path.suffix == ".vmu"
    h0, w0 = level0.shape[:2]
    assert w0 % column_width == 0
    ngr_name = f"{path.stem}.ngr"
    data_offset = 4096
    header = bytearray(data_offset)
    header[0:4] = b"GN\x00\x00"
    struct.pack_into("<i", header, 4, w0)
    struct.pack_into("<i", header, 8, h0)
    struct.pack_into("<i", header, 12, column_width)
    struct.pack_into("<i", header, 24, data_offset)
    px16 = (level0.astype(np.uint16) << 8) | level0.astype(np.uint16)
    blocks = [
        px16[:, blk * column_width : (blk + 1) * column_width, :]
        for blk in range(w0 // column_width)
    ]
    body = np.concatenate([b.reshape(-1) for b in blocks]).astype("<u2").tobytes()
    (path.parent / ngr_name).write_bytes(bytes(header) + body)
    lines = [
        "[Uncompressed Virtual Microscope Specimen]",
        "NoLayers=1",
        f"ImageFile={ngr_name}",
        f"SourceLens={lens}",
        f"PhysicalPitchX={mpp * 1000}",  # nanometres / pixel
        f"PhysicalPitchY={mpp * 1000}",
    ]
    path.write_text("\n".join(lines) + "\n")
    return path


# ------------------------------------------------------------------- DICOM
def _dcm_element(group: int, elem: int, vr: bytes, value: bytes) -> bytes:
    if len(value) % 2:
        value += b"\x00" if vr not in (b"UI",) else b"\x00"
    head = struct.pack("<HH", group, elem)
    if vr in (b"OB", b"OW", b"SQ", b"UN", b"UT", b"UC", b"UR", b"OF", b"OD", b"OL"):
        return head + vr + b"\x00\x00" + struct.pack("<I", len(value)) + value
    return head + vr + struct.pack("<H", len(value)) + value


def _dcm_item(content: bytes) -> bytes:
    return struct.pack("<HHI", 0xFFFE, 0xE000, len(content)) + content


def _dcm_sq(group: int, elem: int, items: list[bytes]) -> bytes:
    body = b"".join(_dcm_item(i) for i in items)
    return _dcm_element(group, elem, b"SQ", body)


def write_dicom_level(
    path: Path,
    level: np.ndarray,
    *,
    tile: int = 64,
    series_uid: str = "1.2.3.4.5",
    sop_uid: str = "1.2.3.4.5.1",
    mpp: float = 0.25,
    objective: float = 20.0,
    encapsulated: bool = True,
    image_type: str = "ORIGINAL\\PRIMARY\\VOLUME",
    sparse: bool = False,
    implicit: bool = False,
    codec: str = "jpeg",
    monochrome: str = "MONOCHROME2",
) -> Path:
    """One DICOM WSI instance (= one pyramid level), TILED_FULL or sparse.

    implicit=True writes the dataset in implicit VR little endian
    (1.2.840.10008.1.2, native pixel data only) — the file meta group stays
    explicit per the standard. codec="j2k" encapsulates frames as lossless
    JPEG2000 codestreams (1.2.840.10008.1.2.4.90, RGB components) instead of
    JPEG baseline."""
    if implicit and encapsulated:
        raise ValueError("implicit VR transfer syntax is native (unencapsulated) only")
    if codec not in ("jpeg", "j2k", "j2k_ycc"):
        raise ValueError(f"unknown codec {codec!r}")
    if codec.startswith("j2k") and not encapsulated:
        raise ValueError("j2k frames require an encapsulated transfer syntax")
    gray = level.ndim == 2
    if gray and encapsulated:
        raise ValueError("grayscale frames are written native-only here")
    h0, w0 = level.shape[:2]
    across = -(-w0 // tile)
    down = -(-h0 // tile)
    frames: list[np.ndarray] = []
    positions: list[tuple[int, int]] = []
    for ty in range(down):
        for tx in range(across):
            shape = (tile, tile) if gray else (tile, tile, 3)
            t = np.full(shape, 255, dtype=np.uint8)
            sub = level[ty * tile : (ty + 1) * tile, tx * tile : (tx + 1) * tile]
            t[: sub.shape[0], : sub.shape[1]] = sub
            frames.append(t)
            positions.append((tx * tile + 1, ty * tile + 1))  # 1-based

    def txt(s: str) -> bytes:
        return s.encode()

    def el(group: int, elem: int, vr: bytes, value: bytes) -> bytes:
        if implicit:
            if len(value) % 2:
                value += b"\x00"
            return struct.pack("<HHI", group, elem, len(value)) + value
        return _dcm_element(group, elem, vr, value)

    def sq(group: int, elem: int, items: list[bytes]) -> bytes:
        body = b"".join(_dcm_item(i) for i in items)
        return el(group, elem, b"SQ", body)

    if implicit:
        ts = "1.2.840.10008.1.2"
    elif codec == "j2k":
        ts = "1.2.840.10008.1.2.4.90"
    elif codec == "j2k_ycc":
        # .4.91 + YBR photometric: components are YCbCr; the reader must
        # apply the RGB transform outside the codestream (force_ycbcr).
        ts = "1.2.840.10008.1.2.4.91"
    elif encapsulated:
        ts = "1.2.840.10008.1.2.4.50"
    else:
        ts = "1.2.840.10008.1.2.1"
    meta_elems = (
        _dcm_element(0x0002, 0x0002, b"UI", txt("1.2.840.10008.5.1.4.1.1.77.1.6"))
        + _dcm_element(0x0002, 0x0003, b"UI", txt(sop_uid))
        + _dcm_element(0x0002, 0x0010, b"UI", txt(ts))
    )
    meta = _dcm_element(0x0002, 0x0000, b"UL", struct.pack("<I", len(meta_elems))) + meta_elems

    shared_fg = sq(
        0x5200,
        0x9229,
        [sq(0x0028, 0x9110, [
            el(0x0028, 0x0030, b"DS", txt(f"{mpp / 1000}\\{mpp / 1000}"))
        ])],
    )
    optical = sq(
        0x0048, 0x0105, [el(0x0048, 0x0112, b"DS", txt(str(objective)))]
    )

    body = b""
    body += el(0x0008, 0x0008, b"CS", txt(image_type))
    body += el(0x0008, 0x0016, b"UI", txt("1.2.840.10008.5.1.4.1.1.77.1.6"))
    body += el(0x0008, 0x0018, b"UI", txt(sop_uid))
    body += el(0x0020, 0x000E, b"UI", txt(series_uid))
    if sparse:
        body += el(0x0020, 0x9311, b"CS", txt("TILED_SPARSE"))
    else:
        body += el(0x0020, 0x9311, b"CS", txt("TILED_FULL"))
    body += el(0x0028, 0x0002, b"US", struct.pack("<H", 1 if gray else 3))
    photometric = "RGB"
    if gray:
        photometric = monochrome
    elif encapsulated and codec == "jpeg":
        photometric = "YBR_FULL_422"
    elif codec == "j2k_ycc":
        photometric = "YBR_FULL"
    body += el(0x0028, 0x0004, b"CS", txt(photometric))
    body += el(0x0028, 0x0008, b"IS", txt(str(len(frames))))
    body += el(0x0028, 0x0010, b"US", struct.pack("<H", tile))
    body += el(0x0028, 0x0011, b"US", struct.pack("<H", tile))
    body += el(0x0028, 0x0100, b"US", struct.pack("<H", 8))
    body += el(0x0048, 0x0006, b"UL", struct.pack("<I", w0))
    body += el(0x0048, 0x0007, b"UL", struct.pack("<I", h0))
    body += optical
    body += shared_fg
    if sparse:
        per_frame_items = []
        for col, row in positions:
            plane = sq(
                0x0048,
                0x021A,
                [
                    el(0x0048, 0x021E, b"SL", struct.pack("<i", col))
                    + el(0x0048, 0x021F, b"SL", struct.pack("<i", row))
                ],
            )
            per_frame_items.append(plane)
        body += sq(0x5200, 0x9230, per_frame_items)

    if encapsulated:
        if codec == "j2k":
            from tests.tiff_builder import _j2k_encode_lossless

            fragments = [_j2k_encode_lossless(f) for f in frames]
        elif codec == "j2k_ycc":
            from tests.tiff_builder import (
                _j2k_encode_lossless,
                rgb_to_full_range_ycbcr,
            )

            fragments = [
                _j2k_encode_lossless(rgb_to_full_range_ycbcr(f)) for f in frames
            ]
        else:
            fragments = [_jpeg_bytes(f) for f in frames]
        pix = struct.pack("<HH", 0x7FE0, 0x0010) + b"OB\x00\x00" + struct.pack("<I", 0xFFFFFFFF)
        pix += struct.pack("<HHI", 0xFFFE, 0xE000, 0)  # empty BOT
        for frag in fragments:
            if len(frag) % 2:
                frag += b"\x00"
            pix += struct.pack("<HHI", 0xFFFE, 0xE000, len(frag)) + frag
        pix += struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
    else:
        raw = b"".join(f.tobytes() for f in frames)
        if implicit:
            pix = struct.pack("<HHI", 0x7FE0, 0x0010, len(raw)) + raw
        else:
            pix = struct.pack("<HH", 0x7FE0, 0x0010) + b"OB\x00\x00" + struct.pack("<I", len(raw)) + raw

    Path(path).write_bytes(b"\x00" * 128 + b"DICM" + meta + body + pix)
    return Path(path)


def write_dicom_pyramid(
    dir_path: Path,
    level0: np.ndarray,
    *,
    n_levels: int = 2,
    tile: int = 64,
    mpp: float = 0.25,
    encapsulated: bool = True,
    with_label: bool = True,
) -> Path:
    """A DICOM WSI series directory; returns the level-0 file path."""
    dir_path = Path(dir_path)
    dir_path.mkdir(parents=True, exist_ok=True)
    series = "1.2.826.0.1.3680043.9999.1"
    levels = [level0]
    for _ in range(1, n_levels):
        levels.append(_halve(levels[-1]))
    paths = []
    for k, img in enumerate(levels):
        p = dir_path / f"level{k}.dcm"
        write_dicom_level(
            p,
            img,
            tile=tile,
            series_uid=series,
            sop_uid=f"{series}.{k + 1}",
            mpp=mpp * 2**k,
            encapsulated=encapsulated,
        )
        paths.append(p)
    if with_label:
        write_dicom_level(
            dir_path / "label.dcm",
            np.full((32, 32, 3), 128, dtype=np.uint8),
            tile=32,
            series_uid=series,
            sop_uid=f"{series}.99",
            image_type="ORIGINAL\\PRIMARY\\LABEL",
            encapsulated=encapsulated,
        )
    return paths[0]
