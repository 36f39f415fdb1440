"""Custom-encoder plugin system.

Same extension contract as the reference (reference: atlas_patch/models/patch/
custom.py:46-146): a plugin module exposes
``register_feature_extractors(registry, device, dtype, num_workers)`` and calls
``register_custom_encoder`` with a loader. Loaders here return JAX components:
an apply function + params + preprocessing spec (instead of a torch module),
but torch-free callables that map a numpy batch to features are also accepted
via ``numpy_fn`` for maximum portability.
"""

from __future__ import annotations

import importlib.util
import logging
from dataclasses import dataclass
from pathlib import Path
from types import ModuleType
from typing import Callable, Protocol, Sequence

import numpy as np

from atlaspatch_tpu.models.encoders.engine import JaxFeatureExtractor, PreprocessSpec
from atlaspatch_tpu.models.encoders.registry import FeatureExtractor, PatchFeatureExtractorRegistry

logger = logging.getLogger("atlaspatch_tpu.models.encoders.custom")


@dataclass
class CustomEncoderComponents:
    """Bundle returned by a custom loader.

    Either provide (apply_fn, params) for a JAX model, or numpy_fn mapping a
    preprocessed uint8 NHWC batch straight to (N, D) float32 features.
    """

    preprocess: PreprocessSpec
    apply_fn: Callable | None = None
    params: dict | None = None
    numpy_fn: Callable[[np.ndarray], np.ndarray] | None = None


class CustomEncoderLoader(Protocol):
    def __call__(self, device, dtype) -> CustomEncoderComponents: ...


class _NumpyExtractor(FeatureExtractor):
    def __init__(self, name: str, embedding_dim: int, spec: PreprocessSpec, fn) -> None:
        self.name = name
        self.embedding_dim = int(embedding_dim)
        self._spec = spec
        self._fn = fn

    def extract_batch(
        self, patches: Sequence[np.ndarray], *, batch_size: int | None = None
    ) -> np.ndarray:
        if not len(patches):
            return np.empty((0, self.embedding_dim), dtype=np.float32)
        bs = batch_size or len(patches)
        outs = []
        for i in range(0, len(patches), bs):
            imgs = np.stack([self._spec.apply_host(p) for p in patches[i : i + bs]])
            outs.append(np.asarray(self._fn(imgs), dtype=np.float32))
        return np.concatenate(outs, axis=0)

    def cleanup(self) -> None:
        self._fn = None


def register_custom_encoder(
    *,
    registry: PatchFeatureExtractorRegistry,
    name: str,
    embedding_dim: int,
    loader: CustomEncoderLoader,
    device=None,
    dtype: str = "float32",
    num_workers: int = 0,
    non_blocking: bool = False,
) -> None:
    del non_blocking

    def _builder() -> FeatureExtractor:
        components = loader(device, dtype)
        if not isinstance(components, CustomEncoderComponents):
            raise TypeError(
                f"Custom encoder loader for '{name}' must return CustomEncoderComponents, "
                f"got {type(components)}."
            )
        if components.numpy_fn is not None:
            return _NumpyExtractor(name, embedding_dim, components.preprocess, components.numpy_fn)
        if components.apply_fn is None or components.params is None:
            raise ValueError(
                f"Custom encoder '{name}' must provide numpy_fn or (apply_fn, params)."
            )
        return JaxFeatureExtractor(
            name=name,
            embedding_dim=int(embedding_dim),
            spec=components.preprocess,
            apply_fn=components.apply_fn,
            params=components.params,
            device=device,
            compute_dtype="bfloat16" if str(dtype).lower().startswith("b") else "float32",
        )

    registry.register(name, _builder)


def _import_module(module_path: Path) -> ModuleType:
    spec = importlib.util.spec_from_file_location(module_path.stem, module_path)
    if spec is None or spec.loader is None:
        raise RuntimeError(f"Failed to load module spec from {module_path}")
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def register_feature_extractors_from_module(
    module_path: str | Path,
    registry: PatchFeatureExtractorRegistry,
    *,
    device=None,
    dtype: str = "float32",
    num_workers: int = 0,
) -> None:
    """Import a plugin module and invoke its registration hook."""
    path = Path(module_path).expanduser().resolve()
    module = _import_module(path)
    hook = getattr(module, "register_feature_extractors", None)
    if not callable(hook):
        raise AttributeError(
            f"Custom encoder module {path} must define a callable "
            "'register_feature_extractors(registry, device, dtype, num_workers)'."
        )
    logger.info("Registering custom feature extractors from %s", path)
    hook(registry=registry, device=device, dtype=dtype, num_workers=num_workers)
