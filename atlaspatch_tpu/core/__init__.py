"""Config dataclasses + domain models.

This re-export list IS the reference's public core surface (reference:
atlas_patch/core/__init__.py) — kept name-for-name so downstream code ports
by swapping the package name; any implementation of that contract looks like
this file.
"""

from atlaspatch_tpu.core.config import (
    AppConfig,
    ExtractionConfig,
    FeatureExtractionConfig,
    OutputConfig,
    ProcessingConfig,
    SegmentationConfig,
    VisualizationConfig,
)
from atlaspatch_tpu.core.models import ExtractionResult, Mask, Slide

__all__ = [
    "AppConfig",
    "ExtractionConfig",
    "FeatureExtractionConfig",
    "OutputConfig",
    "ProcessingConfig",
    "SegmentationConfig",
    "VisualizationConfig",
    "ExtractionResult",
    "Mask",
    "Slide",
]
