"""Extension → backend registry (reference: atlas_patch/core/wsi/wsi_factory.py:12-141).

Pyramidal formats route to the native TIFF backend (our C++ decoder,
io/tiff_wsi.py) instead of OpenSlide; plain-image formats route to ImageWSI.
Runtime registration of new backends/extensions is preserved.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

from atlaspatch_tpu.io.image_wsi import ImageWSI
from atlaspatch_tpu.io.iwsi import IWSI


class UnsupportedFormatError(ValueError):
    """The file's container format is recognized but not decodable natively."""


def _tiff_backend():
    from atlaspatch_tpu.io.tiff_wsi import TiffWSI

    return TiffWSI


class WSIFactory:
    """WSI loader with backend selection."""

    _registry: dict[str, object] = {
        "tiff": _tiff_backend,  # lazy: resolves to TiffWSI on first use
        "image": ImageWSI,
    }

    # TIFF-container formats (classic TIFF / BigTIFF internals) decode natively:
    # Aperio .svs, Hamamatsu .ndpi, Leica .scn, Ventana .bif/.biff, plain .tif.
    _formats = {
        ".svs": "tiff",
        ".tif": "tiff",
        ".tiff": "tiff",
        ".ndpi": "tiff",
        ".scn": "tiff",
        ".bif": "tiff",
        ".biff": "tiff",
        ".png": "image",
        ".jpg": "image",
        ".jpeg": "image",
        ".bmp": "image",
        ".webp": "image",
        ".gif": "image",
    }

    # Honest non-coverage: these are NOT TIFF containers (MIRAX is a directory
    # of .dat tile files, Hamamatsu VMS/VMU are map files, DICOM is its own
    # encoding); the reference reads them via OpenSlide, which this build does
    # not link. Opening one raises UnsupportedFormatError instead of a
    # misleading TIFF parse failure.
    _known_unsupported = {
        ".mrxs": "MIRAX (directory of .dat tiles)",
        ".vms": "Hamamatsu VMS (map file + JPEG tiles)",
        ".vmu": "Hamamatsu VMU (map file + raw tiles)",
        ".dcm": "DICOM WSI",
        ".dicom": "DICOM WSI",
    }

    @classmethod
    def _resolve(cls, name: str):
        impl = cls._registry[name]
        if impl is _tiff_backend:
            impl = _tiff_backend()
            cls._registry[name] = impl
        return impl

    @classmethod
    def register(cls, name: str, impl_class) -> None:
        cls._registry[name] = impl_class

    @classmethod
    def map_extension(cls, ext: str, backend: str) -> None:
        if backend not in cls._registry:
            raise ValueError(f"Unknown backend: {backend}")
        if not ext.startswith("."):
            ext = "." + ext
        cls._formats[ext.lower()] = backend

    @classmethod
    def detect(cls, path: str) -> Optional[str]:
        return cls._formats.get(Path(path).suffix.lower())

    @classmethod
    def load(
        cls, path: str, backend: Optional[str] = None, mpp: Optional[float] = None, **kwargs
    ) -> IWSI:
        if not os.path.exists(path):
            raise FileNotFoundError(f"File not found: {path}")
        if backend is None:
            backend = cls.detect(path)
            if backend is None:
                ext = Path(path).suffix.lower()
                if ext in cls._known_unsupported:
                    raise UnsupportedFormatError(
                        f"{ext} — {cls._known_unsupported[ext]} — is not supported "
                        "by the native decoder (no OpenSlide in this build). "
                        "Convert the slide to a TIFF-family format (.svs/.tiff) "
                        "or register a custom backend via WSIFactory.register()."
                    )
                raise ValueError(f"No backend found for: {path}")
        elif backend not in cls._registry:
            raise ValueError(f"Unknown backend: {backend}")
        impl = cls._resolve(backend)
        return impl(path=path, mpp=mpp, **kwargs)

    @classmethod
    def try_load(
        cls, path: str, backends: Optional[list] = None, mpp: Optional[float] = None, **kwargs
    ) -> IWSI:
        """Try multiple backends in order until one loads."""
        if not os.path.exists(path):
            raise FileNotFoundError(f"File not found: {path}")
        if backends is None:
            backends = list(cls._registry.keys())
        errors = []
        for b in backends:
            if b not in cls._registry:
                errors.append(f"{b}: not registered")
                continue
            try:
                return cls.load(path, backend=b, mpp=mpp, **kwargs)
            except Exception as e:
                errors.append(f"{b}: {e}")
        raise RuntimeError(f"All backends failed for {path}:\n" + "\n".join(errors))
