"""Minimal TIFF writer for exercising the native decoder in tests.

Writes classic little-endian TIFFs with multiple IFDs (pyramid levels),
either tiled or striped, with raw / deflate / packbits compression, optional
ImageDescription and resolution tags. Not a production writer — just enough
surface to validate atlas_tiff.cc against known pixel data.
"""

from __future__ import annotations

import struct
import zlib
from pathlib import Path

import numpy as np

TYPE_ASCII = 2
TYPE_SHORT = 3
TYPE_LONG = 4
TYPE_RATIONAL = 5
TYPE_SRATIONAL = 10
TYPE_UNDEFINED = 7
TYPE_FLOAT = 11


def _j2k_encode_lossless(arr: np.ndarray) -> bytes:
    """Encode an (H, W, C) uint8 array as a raw lossless J2K codestream.

    mct=0 keeps the components as given (no in-codestream color transform) —
    exactly how Aperio stores both 33005 (RGB comps) and 33003 (YCbCr comps)."""
    import io

    from PIL import Image

    img = Image.fromarray(arr.squeeze() if arr.shape[2] == 1 else arr)
    buf = io.BytesIO()
    img.save(buf, format="JPEG2000", irreversible=False, no_jp2=True, mct=0)
    return buf.getvalue()


def rgb_to_full_range_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """JPEG-style full-range RGB→YCbCr (rounded), the inverse of the decoder's
    fixed-point YCbCr→RGB. Used to author 33003-style test slides."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.clip(np.stack([y, cb, cr], axis=-1).round(), 0, 255).astype(np.uint8)


def split_jpeg_tables(jfif: bytes) -> tuple[bytes, bytes]:
    """Split a standalone JFIF into (tables_blob, abbreviated_stream) per the
    TIFF/EP JPEGTables convention (tag 347): the tables blob is SOI + the
    DQT/DHT segments + EOI; the abbreviated stream keeps everything else —
    the layout real Aperio writers produce."""
    assert jfif[:2] == b"\xff\xd8", "not a JPEG stream"
    tables = bytearray(b"\xff\xd8")
    stream = bytearray(b"\xff\xd8")
    i = 2
    while i + 4 <= len(jfif):
        assert jfif[i] == 0xFF, "lost marker sync"
        marker = jfif[i + 1]
        if marker == 0xDA:  # SOS: the rest is entropy data + EOI
            stream.extend(jfif[i:])
            break
        seglen = int.from_bytes(jfif[i + 2 : i + 4], "big")
        seg = jfif[i : i + 2 + seglen]
        if marker in (0xDB, 0xC4):  # DQT / DHT
            tables.extend(seg)
        else:
            stream.extend(seg)
        i += 2 + seglen
    tables.extend(b"\xff\xd9")
    return bytes(tables), bytes(stream)


def _packbits_encode(row: bytes) -> bytes:
    # naive literal-only PackBits (valid, if not maximally compressed)
    out = bytearray()
    i = 0
    while i < len(row):
        chunk = row[i : i + 128]
        out.append(len(chunk) - 1)
        out.extend(chunk)
        i += len(chunk)
    return bytes(out)


class TiffWriter:
    def __init__(self) -> None:
        self.buf = bytearray(b"II*\x00\x00\x00\x00\x00")
        self.ifd_offsets: list[int] = []

    def _align(self) -> None:
        while len(self.buf) % 2:
            self.buf.append(0)

    def _write_blob(self, data: bytes) -> int:
        self._align()
        off = len(self.buf)
        self.buf.extend(data)
        return off

    def add_level(
        self,
        image: np.ndarray,
        *,
        tile: int | None = None,
        compression: int = 1,
        predictor: int = 1,
        description: str | None = None,
        resolution: tuple[float, float, int] | None = None,  # (xres, yres, unit)
        extra_tags: list[tuple[int, int, list]] | None = None,  # (id, type, values)
        shared_jpeg_tables: bool = False,  # compression 7: tag-347 layout
    ) -> None:
        h, w = image.shape[:2]
        spp = 1 if image.ndim == 2 else image.shape[2]
        img = image.reshape(h, w, spp)
        if predictor == 2:
            if tile:
                raise ValueError("builder supports predictor=2 for strips only")
            # Horizontal differencing per row before (optional) compression;
            # strips keep full image rows so whole-row differencing is exact.
            img = img.astype(np.int16)
            img[:, 1:] = img[:, 1:] - img[:, :-1]
            img = (img & 0xFF).astype(np.uint8)

        chunks: list[bytes] = []
        if tile:
            tiles_across = (w + tile - 1) // tile
            tiles_down = (h + tile - 1) // tile
            for ty in range(tiles_down):
                for tx in range(tiles_across):
                    block = np.zeros((tile, tile, spp), dtype=np.uint8)
                    ys, xs = ty * tile, tx * tile
                    ye, xe = min(h, ys + tile), min(w, xs + tile)
                    block[: ye - ys, : xe - xs] = img[ys:ye, xs:xe]
                    chunks.append(block.tobytes())
        else:
            rows_per_strip = max(1, 64 // max(1, spp))
            for ys in range(0, h, rows_per_strip):
                chunks.append(img[ys : ys + rows_per_strip].tobytes())

        if compression == 7:
            # Standalone JFIF per chunk (no shared JPEGTables), the layout
            # Aperio-compatible writers commonly produce. Lossy.
            import io as _io

            from PIL import Image as _PILImage

            row_w = tile if tile else w

            def _jpeg_encode(c: bytes) -> bytes:
                arr = np.frombuffer(c, dtype=np.uint8).reshape(-1, row_w, spp)
                pil = _PILImage.fromarray(arr[..., 0] if spp == 1 else arr)
                buf = _io.BytesIO()
                pil.save(buf, "JPEG", quality=90)
                return buf.getvalue()

            chunks = [_jpeg_encode(c) for c in chunks]
            if shared_jpeg_tables:
                split = [split_jpeg_tables(c) for c in chunks]
                jpeg_tables_blob = split[0][0]
                chunks = [abbrev for _tables, abbrev in split]
        elif compression == 8:
            chunks = [zlib.compress(c) for c in chunks]
        elif compression == 32773:
            chunks = [_packbits_encode(c) for c in chunks]
        elif compression in (33003, 33005, 34712):
            # Raw J2K codestreams per chunk (lossless), as Aperio writes them.
            # For 33003 the caller is expected to pass YCbCr-converted pixels.
            row_w = tile if tile else w
            chunks = [
                _j2k_encode_lossless(
                    np.frombuffer(c, dtype=np.uint8).reshape(-1, row_w, spp)
                )
                for c in chunks
            ]
        elif compression != 1:
            raise ValueError(f"writer does not support compression {compression}")

        offsets = [self._write_blob(c) for c in chunks]
        counts = [len(c) for c in chunks]

        entries: list[tuple[int, int, int, bytes | int]] = []

        def tag(tag_id, type_, values):
            if isinstance(values, (int, float)):
                values = [values]
            if type_ == TYPE_SHORT:
                data = struct.pack(f"<{len(values)}H", *values)
            elif type_ == TYPE_LONG:
                data = struct.pack(f"<{len(values)}I", *values)
            elif type_ == TYPE_ASCII:
                data = values[0].encode() + b"\x00"
                values = [None] * len(data)
            elif type_ == TYPE_RATIONAL:
                data = b"".join(struct.pack("<II", int(v * 10000), 10000) for v in values)
            elif type_ == TYPE_SRATIONAL:
                data = b"".join(struct.pack("<ii", int(v * 10000), 10000) for v in values)
            elif type_ == TYPE_FLOAT:
                data = struct.pack(f"<{len(values)}f", *values)
            elif type_ == TYPE_UNDEFINED:
                data = values[0]  # raw bytes
                values = [None] * len(data)
            else:
                raise ValueError(type_)
            entries.append((tag_id, type_, len(values), data))

        tag(256, TYPE_LONG, w)
        tag(257, TYPE_LONG, h)
        tag(258, TYPE_SHORT, [8] * spp)
        tag(259, TYPE_SHORT, compression)
        tag(262, TYPE_SHORT, 2 if spp == 3 else 1)
        if description:
            tag(270, TYPE_ASCII, [description])
        tag(277, TYPE_SHORT, spp)
        if compression == 7 and shared_jpeg_tables:
            tag(347, TYPE_UNDEFINED, [jpeg_tables_blob])
        if tile:
            tag(322, TYPE_LONG, tile)
            tag(323, TYPE_LONG, tile)
            tag(324, TYPE_LONG, offsets)
            tag(325, TYPE_LONG, counts)
        else:
            rows_per_strip = max(1, 64 // max(1, spp))
            tag(273, TYPE_LONG, offsets)
            tag(278, TYPE_LONG, rows_per_strip)
            tag(279, TYPE_LONG, counts)
        if resolution:
            xres, yres, unit = resolution
            tag(282, TYPE_RATIONAL, [xres])
            tag(283, TYPE_RATIONAL, [yres])
            tag(296, TYPE_SHORT, unit)
        tag(284, TYPE_SHORT, 1)
        if predictor != 1:
            tag(317, TYPE_SHORT, predictor)
        for tag_id, type_, values in extra_tags or []:
            tag(tag_id, type_, values)

        entries.sort(key=lambda e: e[0])
        # write out-of-line data first
        finalized = []
        for tag_id, type_, count, data in entries:
            if len(data) <= 4:
                inline = data + b"\x00" * (4 - len(data))
                finalized.append((tag_id, type_, count, inline))
            else:
                off = self._write_blob(data)
                finalized.append((tag_id, type_, count, struct.pack("<I", off)))

        self._align()
        ifd_off = len(self.buf)
        self.buf.extend(struct.pack("<H", len(finalized)))
        for tag_id, type_, count, value4 in finalized:
            self.buf.extend(struct.pack("<HHI", tag_id, type_, count) + value4)
        self.buf.extend(b"\x00\x00\x00\x00")  # next-IFD placeholder
        self.ifd_offsets.append(ifd_off)

    def add_level_raw_strips(
        self,
        chunks: list[bytes],
        *,
        width: int,
        height: int,
        rows_per_strip: int,
        spp: int = 3,
        compression: int = 7,
        description: str | None = None,
        resolution: tuple[float, float, int] | None = None,
        extra_tags: list[tuple[int, int, list]] | None = None,
    ) -> None:
        """Add an IFD whose strip payloads are caller-provided raw bytes.

        Used to fabricate vendor layouts the pixel-level ``add_level`` cannot
        produce — e.g. an NDPI-style single-strip whole-image JPEG whose SOF
        dimensions disagree with the TIFF tags."""
        offsets = [self._write_blob(c) for c in chunks]
        counts = [len(c) for c in chunks]

        entries: list[tuple[int, int, int, bytes | int]] = []

        def tag(tag_id, type_, values):
            if isinstance(values, (int, float)):
                values = [values]
            if type_ == TYPE_SHORT:
                data = struct.pack(f"<{len(values)}H", *values)
            elif type_ == TYPE_LONG:
                data = struct.pack(f"<{len(values)}I", *values)
            elif type_ == TYPE_ASCII:
                data = values[0].encode() + b"\x00"
                values = [None] * len(data)
            elif type_ == TYPE_RATIONAL:
                data = b"".join(struct.pack("<II", int(v * 10000), 10000) for v in values)
            elif type_ == TYPE_SRATIONAL:
                data = b"".join(struct.pack("<ii", int(v * 10000), 10000) for v in values)
            elif type_ == TYPE_FLOAT:
                data = struct.pack(f"<{len(values)}f", *values)
            elif type_ == TYPE_UNDEFINED:
                data = values[0]  # raw bytes
                values = [None] * len(data)
            else:
                raise ValueError(type_)
            entries.append((tag_id, type_, len(values), data))

        tag(256, TYPE_LONG, width)
        tag(257, TYPE_LONG, height)
        tag(258, TYPE_SHORT, [8] * spp)
        tag(259, TYPE_SHORT, compression)
        tag(262, TYPE_SHORT, 6 if compression == 7 else (2 if spp == 3 else 1))
        if description:
            tag(270, TYPE_ASCII, [description])
        tag(273, TYPE_LONG, offsets)
        tag(277, TYPE_SHORT, spp)
        tag(278, TYPE_LONG, rows_per_strip)
        tag(279, TYPE_LONG, counts)
        if resolution:
            xres, yres, unit = resolution
            tag(282, TYPE_RATIONAL, [xres])
            tag(283, TYPE_RATIONAL, [yres])
            tag(296, TYPE_SHORT, unit)
        tag(284, TYPE_SHORT, 1)
        for tag_id, type_, values in extra_tags or []:
            tag(tag_id, type_, values)

        entries.sort(key=lambda e: e[0])
        finalized = []
        for tag_id, type_, count, data in entries:
            if len(data) <= 4:
                inline = data + b"\x00" * (4 - len(data))
                finalized.append((tag_id, type_, count, inline))
            else:
                off = self._write_blob(data)
                finalized.append((tag_id, type_, count, struct.pack("<I", off)))

        self._align()
        ifd_off = len(self.buf)
        self.buf.extend(struct.pack("<H", len(finalized)))
        for tag_id, type_, count, value4 in finalized:
            self.buf.extend(struct.pack("<HHI", tag_id, type_, count) + value4)
        self.buf.extend(b"\x00\x00\x00\x00")  # next-IFD placeholder
        self.ifd_offsets.append(ifd_off)

    def save(self, path) -> None:
        # link IFD chain
        buf = self.buf
        struct.pack_into("<I", buf, 4, self.ifd_offsets[0])
        for i in range(len(self.ifd_offsets) - 1):
            ifd_off = self.ifd_offsets[i]
            n = struct.unpack_from("<H", buf, ifd_off)[0]
            next_ptr_off = ifd_off + 2 + n * 12
            struct.pack_into("<I", buf, next_ptr_off, self.ifd_offsets[i + 1])
        with open(path, "wb") as f:
            f.write(buf)


def write_pyramid(
    path,
    level0: np.ndarray,
    *,
    levels: int = 3,
    tile: int | None = 64,
    compression: int = 1,
    description: str | None = None,
    resolution=None,
) -> list[np.ndarray]:
    """Write a pyramid (2x downsamples); returns the level arrays."""
    w = TiffWriter()
    arrays = [level0]
    for _ in range(levels - 1):
        prev = arrays[-1]
        arrays.append(prev[::2, ::2].copy())
    for i, arr in enumerate(arrays):
        w.add_level(
            arr,
            tile=tile,
            compression=compression,
            description=description if i == 0 else None,
            resolution=resolution if i == 0 else None,
        )
    w.save(path)
    return arrays


def write_bigtiff_single_level(path, image: np.ndarray) -> None:
    """Minimal BigTIFF (version 43, little-endian): one uncompressed tiled
    level. Exercises the decoder's 8-byte offset/count IFD parsing, which the
    classic-TIFF writer above never touches."""
    h, w = image.shape[:2]
    spp = 1 if image.ndim == 2 else image.shape[2]
    img = image.reshape(h, w, spp)
    tile = 64
    across, down = (w + tile - 1) // tile, (h + tile - 1) // tile

    buf = bytearray(struct.pack("<2sHHHQ", b"II", 43, 8, 0, 0))
    chunks = []
    for ty in range(down):
        for tx in range(across):
            block = np.zeros((tile, tile, spp), np.uint8)
            ys, xs = ty * tile, tx * tile
            ye, xe = min(h, ys + tile), min(w, xs + tile)
            block[: ye - ys, : xe - xs] = img[ys:ye, xs:xe]
            chunks.append(block.tobytes())
    offsets = []
    for c in chunks:
        if len(buf) % 2:
            buf.append(0)
        offsets.append(len(buf))
        buf.extend(c)

    def entry(tag, typ, count, values) -> bytes:
        size = {3: 2, 4: 4, 16: 8}[typ]
        fmt = {3: "<H", 4: "<I", 16: "<Q"}[typ]
        payload = b"".join(struct.pack(fmt, v) for v in values)
        if len(payload) <= 8:
            return struct.pack("<HHQ", tag, typ, count) + payload.ljust(8, b"\x00")
        if len(buf) % 2:
            buf.append(0)
        off = len(buf)
        buf.extend(payload)
        return struct.pack("<HHQQ", tag, typ, count, off)

    # Offset arrays must be written before the IFD (entry() appends to buf).
    entries = [
        entry(256, 16, 1, [w]),
        entry(257, 16, 1, [h]),
        entry(258, 3, spp, [8] * spp),
        entry(259, 3, 1, [1]),
        entry(262, 3, 1, [2 if spp == 3 else 1]),
        entry(277, 3, 1, [spp]),
        entry(322, 16, 1, [tile]),
        entry(323, 16, 1, [tile]),
        entry(324, 16, len(offsets), offsets),
        entry(325, 16, len(chunks), [len(c) for c in chunks]),
    ]
    if len(buf) % 8:
        buf.extend(b"\x00" * (8 - len(buf) % 8))
    ifd_off = len(buf)
    buf.extend(struct.pack("<Q", len(entries)))
    for e in sorted(entries, key=lambda e: struct.unpack_from("<H", e)[0]):
        buf.extend(e)
    buf.extend(struct.pack("<Q", 0))  # next IFD
    struct.pack_into("<Q", buf, 8, ifd_off)
    Path(path).write_bytes(bytes(buf))


def write_bigendian_single_level(path, image: np.ndarray) -> None:
    """Minimal big-endian classic TIFF ("MM"): one uncompressed striped
    level. The LE writer above never exercises the byte-order plumbing."""
    h, w = image.shape[:2]
    spp = 1 if image.ndim == 2 else image.shape[2]
    img = image.reshape(h, w, spp)
    rps = 16
    strips = [img[ys : ys + rps].tobytes() for ys in range(0, h, rps)]

    buf = bytearray(struct.pack(">2sHI", b"MM", 42, 0))
    offsets = []
    for s in strips:
        if len(buf) % 2:
            buf.append(0)
        offsets.append(len(buf))
        buf.extend(s)

    def entry(tag, typ, count, values) -> bytes:
        size = {3: 2, 4: 4}[typ]
        fmt = {3: ">H", 4: ">I"}[typ]
        payload = b"".join(struct.pack(fmt, v) for v in values)
        if len(payload) <= 4:
            return struct.pack(">HHI", tag, typ, count) + payload.ljust(4, b"\x00")
        if len(buf) % 2:
            buf.append(0)
        off = len(buf)
        buf.extend(payload)
        return struct.pack(">HHII", tag, typ, count, off)

    entries = [
        entry(256, 4, 1, [w]),
        entry(257, 4, 1, [h]),
        entry(258, 3, spp, [8] * spp),
        entry(259, 3, 1, [1]),
        entry(262, 3, 1, [2 if spp == 3 else 1]),
        entry(277, 3, 1, [spp]),
        entry(278, 4, 1, [rps]),
        entry(273, 4, len(offsets), offsets),
        entry(279, 4, len(strips), [len(s) for s in strips]),
    ]
    if len(buf) % 2:
        buf.append(0)
    ifd_off = len(buf)
    buf.extend(struct.pack(">H", len(entries)))
    for e in sorted(entries, key=lambda e: struct.unpack_from(">H", e)[0]):
        buf.extend(e)
    buf.extend(struct.pack(">I", 0))
    struct.pack_into(">I", buf, 4, ifd_off)
    Path(path).write_bytes(bytes(buf))


def write_ome_pyramid(
    path,
    level0: np.ndarray,
    *,
    levels: int = 3,
    tile: int | None = 64,
    physical_size_x: float | None = None,
    unit: str = "µm",
    mag: float | None = None,
    extra_planes: int = 0,
) -> list[np.ndarray]:
    """OME-TIFF layout: reduced levels live in SubIFDs (tag 330) of the base
    directory (the Bio-Formats/bfconvert convention) and the base carries an
    OME-XML ImageDescription with PhysicalSizeX[Unit]. `extra_planes` appends
    sibling full-size planes on the main chain (channels/timepoints)."""
    w = TiffWriter()
    arrays = [level0]
    for _ in range(levels - 1):
        arrays.append(arrays[-1][::2, ::2].copy())
    # Sub-IFD levels are written first so their offsets exist for tag 330;
    # popping them from ifd_offsets keeps them off the main chain.
    for arr in arrays[1:]:
        w.add_level(arr, tile=tile)
    subs = list(w.ifd_offsets)
    w.ifd_offsets.clear()
    ps = (
        f' PhysicalSizeX="{physical_size_x}" PhysicalSizeXUnit="{unit}"'
        f' PhysicalSizeY="{physical_size_x}" PhysicalSizeYUnit="{unit}"'
        if physical_size_x is not None
        else ""
    )
    instrument = (
        '<Instrument ID="Instrument:0"><Objective ID="Objective:0" '
        f'NominalMagnification="{mag}"/></Instrument>'
        if mag is not None
        else ""
    )
    ome = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<OME xmlns="http://www.openmicroscopy.org/Schemas/OME/2016-06">'
        f"{instrument}"
        f'<Image ID="Image:0"><Pixels ID="Pixels:0" DimensionOrder="XYCZT" '
        f'Type="uint8" SizeX="{level0.shape[1]}" SizeY="{level0.shape[0]}" '
        f'SizeC="3" SizeZ="1" SizeT="1"{ps}/></Image></OME>'
    )
    extra = [(330, TYPE_LONG, subs)] if subs else None
    w.add_level(level0, tile=tile, description=ome, extra_tags=extra)
    for _ in range(extra_planes):
        w.add_level(level0, tile=tile)
    w.save(path)
    return arrays
