"""Service implementations for segmentation, extraction, embedding, and WSI access.

Re-exports match the reference package interface (reference:
atlas_patch/services/__init__.py:1-15) so library users can port imports by
swapping the package name.
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
