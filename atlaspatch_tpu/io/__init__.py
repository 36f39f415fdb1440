from atlaspatch_tpu.io.factory import WSIFactory
from atlaspatch_tpu.io.image_wsi import ImageWSI
from atlaspatch_tpu.io.iwsi import IWSI

__all__ = ["IWSI", "ImageWSI", "WSIFactory"]
