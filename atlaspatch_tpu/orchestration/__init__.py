from atlaspatch_tpu.orchestration.parallel import (
    ExtractionTask,
    InflightTracker,
    PatchExtractionExecutor,
)
from atlaspatch_tpu.orchestration.runner import ProcessingRunner

__all__ = [
    "ExtractionTask",
    "InflightTracker",
    "PatchExtractionExecutor",
    "ProcessingRunner",
]
