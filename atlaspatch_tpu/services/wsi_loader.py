"""Default WSI loader delegating to the factory
(reference: atlas_patch/services/wsi_loader.py:8-12)."""

from __future__ import annotations

from atlaspatch_tpu.core.models import Slide
from atlaspatch_tpu.io.factory import WSIFactory
from atlaspatch_tpu.services.interfaces import WSILoader


class DefaultWSILoader(WSILoader):
    def open(self, slide: Slide):
        return WSIFactory.load(str(slide.path), mpp=slide.mpp, backend=slide.backend)
