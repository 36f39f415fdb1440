"""Service layer re-exports.

This list IS the reference's public services surface plus the embedding
service (reference: atlas_patch/services/__init__.py:1-15) — kept
name-for-name so downstream code ports by swapping the package name; any
implementation of that contract necessarily looks like this file. The
implementations behind the names are TPU-native redesigns: a fused jitted
SAM2 step with packed-bit mask readback, vectorized grid extraction, a
slide-major multi-extractor embed pipeline, and streaming H5 writers.
"""

from atlaspatch_tpu.services.extraction import PatchExtractionService
from atlaspatch_tpu.services.feature_embedding import PatchFeatureEmbeddingService
from atlaspatch_tpu.services.mpp import CSVMPPResolver
from atlaspatch_tpu.services.segmentation import SAM2SegmentationService
from atlaspatch_tpu.services.visualization import DefaultVisualizationService
from atlaspatch_tpu.services.wsi_loader import DefaultWSILoader

__all__ = [
    "PatchExtractionService",
    "PatchFeatureEmbeddingService",
    "CSVMPPResolver",
    "SAM2SegmentationService",
    "DefaultVisualizationService",
    "DefaultWSILoader",
]
