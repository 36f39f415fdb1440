"""General utilities: HDF5 I/O, patch content checks, discovery, logging."""

from atlaspatch_tpu.utils.features import (
    get_existing_features,
    missing_features,
    parse_feature_list,
)
from atlaspatch_tpu.utils.h5 import H5AppendWriter
from atlaspatch_tpu.utils.image import is_black_patch, is_white_patch
from atlaspatch_tpu.utils.logging_utils import configure_logging, install_noise_filter
from atlaspatch_tpu.utils.params import get_mpp_for_wsi, get_wsi_files, load_mpp_csv

__all__ = [
    "H5AppendWriter",
    "is_black_patch",
    "is_white_patch",
    "get_wsi_files",
    "load_mpp_csv",
    "get_mpp_for_wsi",
    "parse_feature_list",
    "get_existing_features",
    "missing_features",
    "configure_logging",
    "install_noise_filter",
]
