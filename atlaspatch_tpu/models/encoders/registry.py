"""Feature-extractor registry: name → lazy builder
(API parity with reference: atlas_patch/models/patch/registry.py:11-44)."""

from __future__ import annotations

import logging
from abc import ABC, abstractmethod
from typing import Callable, Iterable, Mapping, Sequence

import numpy as np

logger = logging.getLogger(__name__)


class FeatureExtractor(ABC):
    """Base interface for patch-level feature extractors."""

    name: str
    embedding_dim: int

    @abstractmethod
    def extract_batch(
        self, patches: Sequence[np.ndarray], *, batch_size: int | None = None
    ) -> np.ndarray: ...

    @abstractmethod
    def cleanup(self) -> None: ...


class PatchFeatureExtractorRegistry:
    def __init__(self) -> None:
        self._builders: dict[str, Callable[[], FeatureExtractor]] = {}

    def register(self, name: str, builder: Callable[[], FeatureExtractor]) -> None:
        key = name.lower()
        if key in self._builders:
            raise ValueError(f"Feature extractor '{name}' already registered.")
        self._builders[key] = builder

    def available(self) -> list[str]:
        return sorted(self._builders.keys())

    def create(self, name: str) -> FeatureExtractor:
        key = name.lower()
        if key not in self._builders:
            raise KeyError(f"Unknown feature extractor '{name}'. Available: {self.available()}")
        try:
            return self._builders[key]()
        except Exception:
            logger.exception("Failed to create feature extractor '%s'", name)
            raise

    def create_many(self, names: Iterable[str]) -> list[FeatureExtractor]:
        return [self.create(name) for name in names]

    def as_mapping(self) -> Mapping[str, Callable[[], FeatureExtractor]]:
        return dict(self._builders)
