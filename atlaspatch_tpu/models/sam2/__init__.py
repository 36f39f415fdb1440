from atlaspatch_tpu.models.sam2.config import SAM2Config
from atlaspatch_tpu.models.sam2.model import SAM2ImageModel

__all__ = ["SAM2Config", "SAM2ImageModel"]
