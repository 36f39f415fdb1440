"""Output layout contract (reference: atlas_patch/core/paths.py:9-42).

Layout under the run root:
  patches/<stem>.h5     one HDF5 per slide (coords + passports + features/*)
  images/<stem>/        optional per-patch PNG exports
  visualization/        mask/grid/contour overlays
  patches/<stem>.lock   cross-process work lock
"""

from __future__ import annotations

from pathlib import Path

from atlaspatch_tpu.core.config import ExtractionConfig, OutputConfig
from atlaspatch_tpu.core.models import Slide


def build_run_root(output_cfg: OutputConfig, extraction_cfg: ExtractionConfig) -> Path:
    return Path(output_cfg.output_root)


def patch_h5_path(slide: Slide, output_cfg: OutputConfig, extraction_cfg: ExtractionConfig) -> Path:
    return build_run_root(output_cfg, extraction_cfg) / "patches" / f"{slide.stem}.h5"


def find_existing_patch(
    slide: Slide, output_cfg: OutputConfig, extraction_cfg: ExtractionConfig
) -> Path | None:
    path = patch_h5_path(slide, output_cfg, extraction_cfg)
    return path if path.exists() else None


def images_dir(slide: Slide, output_cfg: OutputConfig, extraction_cfg: ExtractionConfig) -> Path:
    return build_run_root(output_cfg, extraction_cfg) / "images" / slide.stem


def visualization_dir(output_cfg: OutputConfig, extraction_cfg: ExtractionConfig) -> Path:
    return build_run_root(output_cfg, extraction_cfg) / "visualization"


def patch_lock_path(
    slide: Slide, output_cfg: OutputConfig, extraction_cfg: ExtractionConfig
) -> Path:
    return build_run_root(output_cfg, extraction_cfg) / "patches" / f"{slide.stem}.lock"
