"""Default WSI loader delegating to the factory
(reference: atlas_patch/services/wsi_loader.py:8-12)."""

from __future__ import annotations

from atlaspatch_tpu.core.models import Slide
from atlaspatch_tpu.io.factory import WSIFactory
from atlaspatch_tpu.services.interfaces import WSILoader
from atlaspatch_tpu.utils import perf


class DefaultWSILoader(WSILoader):
    def open(self, slide: Slide):
        with perf.stage("wsi_open"):
            return WSIFactory.load(str(slide.path), mpp=slide.mpp, backend=slide.backend)
