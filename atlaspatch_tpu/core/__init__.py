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
