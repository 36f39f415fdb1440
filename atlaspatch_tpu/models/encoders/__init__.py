from atlaspatch_tpu.models.encoders.registry import PatchFeatureExtractorRegistry
from atlaspatch_tpu.models.encoders.zoo import build_default_registry
from atlaspatch_tpu.models.encoders.custom import (
    CustomEncoderComponents,
    register_custom_encoder,
    register_feature_extractors_from_module,
)

__all__ = [
    "PatchFeatureExtractorRegistry",
    "build_default_registry",
    "CustomEncoderComponents",
    "register_custom_encoder",
    "register_feature_extractors_from_module",
]
