"""AtlasPatch-TPU: a TPU-native gigapixel whole-slide-image preprocessing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of AtlasPatch
(reference: AtlasAnalyticsLab/AtlasPatch): SAM2 tissue segmentation, tissue-filtered
patch-grid coordinate extraction, and patch feature embedding with a large encoder
zoo — engineered for TPU hardware (MXU-friendly batched inference, fused
preprocessing, pjit sharding over device meshes) with a native C++ slide-decode and
geometry plane on the host.

Layout (mirrors reference capability map in SURVEY.md §2):
  core/           config dataclasses, domain models, output-path contract
  io/             WSI abstraction + native TIFF/SVS backend + image backend + factory
  ops/            XLA/Pallas compute ops (resize, polygon containment, filters, attention)
  models/sam2     SAM2 hiera-tiny in Flax + torch-checkpoint converter
  models/encoders patch feature-encoder zoo (66 names) in Flax + registry + plugin API
  parallel/       mesh/sharding helpers, multi-host work sharding, lock files
  services/       segmentation / extraction / embedding / storage / visualization
  orchestration/  runner + in-flight tracking
  cli.py          click CLI: segment-and-get-coords, detect-tissue, process, info
"""

from atlaspatch_tpu import core, services  # noqa: F401  (package interface parity: reference __init__.py exports core + services)

__version__ = "0.1.0"
__all__ = ["core", "services", "__version__"]
