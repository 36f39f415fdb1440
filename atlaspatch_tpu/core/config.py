"""Validated configuration dataclasses.

Capability parity with the reference config system (reference:
atlas_patch/core/config.py:40-179) with one TPU-native change: device strings
name JAX platforms ("tpu", "cpu", "tpu:<index>"). "cuda"/"gpu" spellings are
accepted as aliases for the accelerator platform so reference command lines keep
working unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path


def _ensure_positive(value: int | float, name: str) -> int | float:
    if value <= 0:
        raise ValueError(f"{name} must be > 0, got {value}")
    return value


def _ensure_non_negative(value: int, name: str) -> int:
    if value < 0:
        raise ValueError(f"{name} must be >= 0, got {value}")
    return value


def _ensure_fraction(value: float, name: str) -> float:
    if value < 0 or value > 1:
        raise ValueError(f"{name} must be between 0 and 1, got {value}")
    return value


_ACCELERATOR_ALIASES = ("tpu", "cuda", "gpu", "accel")


def normalize_device(device: str) -> str:
    """Normalize a device request to a JAX platform string.

    Accepts "cpu", "tpu", "tpu:<index>", plus "cuda"/"gpu" aliases that map to
    the accelerator platform (reference validates cuda strings at
    core/config.py:25-37; here the accelerator is a TPU).
    """
    dev = device.strip().lower()
    if dev == "cpu":
        return "cpu"
    for alias in _ACCELERATOR_ALIASES:
        if dev == alias:
            return "tpu"
        if dev.startswith(alias + ":"):
            suffix = dev.split(":", 1)[1]
            if suffix and not suffix.isdigit():
                raise ValueError(
                    f"Invalid device specification '{device}'. "
                    f"Use '{alias}' or '{alias}:<index>'."
                )
            return f"tpu:{suffix}" if suffix else "tpu"
    raise ValueError(
        f"device must be 'cpu', 'tpu', or 'tpu:<index>' (cuda/gpu accepted as aliases), "
        f"got {device}"
    )


@dataclass
class SegmentationConfig:
    """SAM2 tissue-segmentation settings (reference: core/config.py:40-58)."""

    checkpoint_path: Path | None = None
    config_path: Path | None = None
    device: str = "tpu"
    thumbnail_power: float = 1.25
    thumbnail_max: int = 1024
    batch_size: int = 1
    mask_threshold: float = 0.0
    # float32 (default) for strict reference parity; bfloat16 runs the trunk on
    # the MXU's native reduced precision (~2-4x faster; boundary pixels may
    # differ by a hair).
    precision: str = "float32"

    def validated(self) -> "SegmentationConfig":
        if self.checkpoint_path is not None and not Path(self.checkpoint_path).exists():
            raise FileNotFoundError(f"Checkpoint not found: {self.checkpoint_path}")
        if self.config_path is not None and not Path(self.config_path).exists():
            raise FileNotFoundError(f"SAM2 config not found: {self.config_path}")
        self.device = normalize_device(str(self.device))
        _ensure_positive(self.thumbnail_max, "thumbnail_max")
        _ensure_positive(self.batch_size, "segmentation batch_size")
        prec = str(self.precision).lower()
        if prec == "float16":
            prec = "bfloat16"
        if prec not in ("float32", "bfloat16"):
            raise ValueError(f"segmentation precision must be float32/bfloat16, got {self.precision}")
        self.precision = prec
        return self


@dataclass
class ExtractionConfig:
    """Patch-grid extraction settings (reference: core/config.py:61-89)."""

    patch_size: int
    target_magnification: int
    step_size: int | None = None
    workers: int | None = None
    max_open_slides: int | None = None
    tissue_threshold: float = 0.01
    white_threshold: int = 15
    black_threshold: int = 50
    fast_mode: bool = True
    write_batch: int = 8192

    def validated(self) -> "ExtractionConfig":
        _ensure_positive(self.patch_size, "patch_size")
        _ensure_positive(self.target_magnification, "target_magnification")
        if self.step_size is None:
            self.step_size = self.patch_size
        _ensure_positive(self.step_size, "step_size")
        _ensure_fraction(self.tissue_threshold, "tissue_threshold")
        _ensure_positive(self.white_threshold, "white_threshold")
        _ensure_positive(self.black_threshold, "black_threshold")
        _ensure_positive(self.write_batch, "write_batch")
        if self.workers is not None:
            _ensure_positive(self.workers, "workers")
        if self.max_open_slides is None:
            self.max_open_slides = 200
        _ensure_positive(self.max_open_slides, "max_open_slides")
        return self


@dataclass
class FeatureExtractionConfig:
    """Patch-embedding settings (reference: core/config.py:92-121).

    precision selects the on-device compute dtype; bfloat16 is the TPU-native
    reduced precision and the recommended default for MXU throughput.
    """

    extractors: list[str]
    batch_size: int = 32
    device: str = "tpu"
    num_workers: int = 4
    precision: str = "float32"
    plugins: list[Path] = field(default_factory=list)

    def validated(self) -> "FeatureExtractionConfig":
        if not self.extractors:
            raise ValueError("At least one feature extractor must be provided.")
        # Case-insensitive dedupe, order-preserving: a repeated name is one
        # unit of work everywhere (progress totals, embed loops).
        seen: set[str] = set()
        self.extractors = [
            n for n in self.extractors
            if str(n).lower() not in seen and not seen.add(str(n).lower())
        ]
        _ensure_positive(self.batch_size, "feature batch_size")
        _ensure_non_negative(self.num_workers, "feature num_workers")
        self.device = normalize_device(str(self.device))
        allowed_prec = {"float32", "float16", "bfloat16", "int8"}
        prec = str(self.precision).lower()
        if prec not in allowed_prec:
            raise ValueError(
                f"precision must be one of {sorted(allowed_prec)}, got {self.precision}"
            )
        self.precision = prec
        validated_plugins: list[Path] = []
        for plugin in self.plugins:
            plugin_path = Path(plugin)
            if not plugin_path.exists():
                raise FileNotFoundError(f"Feature plugin not found: {plugin_path}")
            validated_plugins.append(plugin_path.resolve())
        self.plugins = validated_plugins
        return self


@dataclass
class OutputConfig:
    """Output toggles + root (reference: core/config.py:124-135)."""

    output_root: Path
    save_images: bool = False
    visualize_grids: bool = False
    visualize_mask: bool = False
    visualize_contours: bool = False
    skip_existing: bool = True

    def validated(self) -> "OutputConfig":
        self.output_root = Path(self.output_root)
        self.output_root.mkdir(parents=True, exist_ok=True)
        return self


@dataclass
class ProcessingConfig:
    """Input discovery settings (reference: core/config.py:138-149)."""

    input_path: Path
    recursive: bool = False
    mpp_csv: Path | None = None

    def validated(self) -> "ProcessingConfig":
        if not Path(self.input_path).exists():
            raise FileNotFoundError(f"Input path not found: {self.input_path}")
        if self.mpp_csv is not None and not Path(self.mpp_csv).exists():
            raise FileNotFoundError(f"MPP CSV not found: {self.mpp_csv}")
        return self


@dataclass
class VisualizationConfig:
    """Visualization sizing (reference: core/config.py:152-157)."""

    thumbnail_size: int = 1024

    def validated(self) -> "VisualizationConfig":
        _ensure_positive(self.thumbnail_size, "thumbnail_size")
        return self


@dataclass
class AppConfig:
    """Aggregate validated app config (reference: core/config.py:161-179)."""

    processing: ProcessingConfig
    segmentation: SegmentationConfig
    extraction: ExtractionConfig
    output: OutputConfig
    features: FeatureExtractionConfig | None = None
    visualization: VisualizationConfig = field(default_factory=VisualizationConfig)
    device: str = "tpu"

    def validated(self) -> "AppConfig":
        self.processing = self.processing.validated()
        self.segmentation = self.segmentation.validated()
        self.extraction = self.extraction.validated()
        self.output = self.output.validated()
        if self.features is not None:
            self.features = self.features.validated()
        self.visualization = self.visualization.validated()
        self.device = normalize_device(self.device)
        return self
