"""SAM2 tissue-segmentation service on JAX/TPU.

Pipeline parity with the reference (reference: atlas_patch/services/
segmentation.py:25-237): thumbnails at power 1.25 capped at 1024px, PIL
bilinear resize to 1024x1024, full-frame box prompt, single-mask output,
mask resized back to the thumbnail shape with PIL NEAREST.

TPU-native differences: the whole predict path (normalize → Hiera → FPN →
decoder → upscale) is ONE jitted device program over a padded batch of
thumbnails; thumbnail preparation runs on a host thread pool overlapping
device compute. Checkpoint: explicit path, or ATLASPATCH_SAM2_CHECKPOINT, or
the HF-cached reference checkpoint if present; otherwise deterministic random
init (useful for tests/benchmarks without network access — a warning is
logged).
"""

from __future__ import annotations

import logging
import os
from concurrent.futures import ThreadPoolExecutor
from functools import partial
from pathlib import Path
from typing import Sequence

import numpy as np
from PIL import Image

from atlaspatch_tpu.core.config import SegmentationConfig
from atlaspatch_tpu.core.models import Mask
from atlaspatch_tpu.io.iwsi import IWSI
from atlaspatch_tpu.models.sam2.config import SAM2Config
from atlaspatch_tpu.services.interfaces import SegmentationService
from atlaspatch_tpu.utils import perf

logger = logging.getLogger("atlaspatch_tpu.segmentation_service")

_ENV_CHECKPOINT = "ATLASPATCH_SAM2_CHECKPOINT"


def _pad_to_pow2_batch(n: int, max_batch: int) -> int:
    """Pad batch to a power of two, capped at max_batch (callers guarantee
    max_batch >= n), so jit caches few batch shapes."""
    b = 1
    while b < n and b < max_batch:
        b *= 2
    return min(max(b, n), max_batch)


class SAM2Predictor:
    """Batched SAM2 mask prediction with resizing helpers."""

    def __init__(
        self,
        cfg: SegmentationConfig,
        sam2_cfg: SAM2Config | None = None,
        *,
        mesh=None,
        data_axis: str = "data",
    ):
        import jax

        from atlaspatch_tpu.utils.jaxsetup import setup_jax_cache

        setup_jax_cache()
        self.cfg = cfg
        self._mesh = mesh
        self._data_axis = data_axis
        self._n_data = int(mesh.shape[data_axis]) if mesh is not None else 1
        self._sharded_steps: dict = {}
        # device-resident PIL-NEAREST index tables keyed (n_out, n_in): the
        # host loops + H2D upload run once per shape, not once per dispatch
        self._resample_idx: dict = {}
        if sam2_cfg is not None:
            self.sam2_cfg = sam2_cfg
        elif cfg.config_path is not None:
            self.sam2_cfg = SAM2Config.from_reference_yaml(cfg.config_path)
        else:
            self.sam2_cfg = SAM2Config.tiny()
        override = getattr(cfg, "input_size", None)
        if override is not None and override != self.sam2_cfg.image_size:
            # Run the trunk at a different square resolution. Checkpoints are
            # size-agnostic (pos-embeds interpolate from the 7x7 background
            # grid at trace time, no parameter shape involves image_size), so
            # the same weights load at any multiple of 32.
            import dataclasses as _dc

            # Loud guard: some (window spec, size) pairs cannot tile — turn
            # the mid-trace reshape crash into an actionable error. A size
            # chosen by the --fast preset (not typed by the user) falls back
            # to the architecture's native size instead of failing.
            try:
                self.sam2_cfg.validate_input_size(int(override))
            except ValueError:
                if not getattr(cfg, "input_size_preset", False):
                    raise
                logger.info(
                    "--fast preset input size %d does not tile this SAM2 "
                    "window spec; keeping the architecture's native %d.",
                    int(override), self.sam2_cfg.image_size,
                )
                override = None
            if override is not None:
                self.sam2_cfg = _dc.replace(
                    self.sam2_cfg, image_size=int(override)
                )
        self.input_size = self.sam2_cfg.image_size

        platform = cfg.device.split(":")[0]
        # local_devices, not devices: under jax.distributed, jax.devices()
        # leads with process 0's devices — a device_put there from another
        # host fails ("non-addressable device").
        try:
            self._device = jax.local_devices(backend=platform)[0]
        except RuntimeError:
            logger.warning("%s requested but unavailable; falling back to CPU.", platform)
            self._device = jax.local_devices(backend="cpu")[0]
        logger.info("SAM2 predictor device: %s (requested=%s)", self._device, cfg.device)

        self.params = self._load_params()

    def _resolve_checkpoint_path(self) -> Path | None:
        if self.cfg.checkpoint_path is not None:
            return Path(self.cfg.checkpoint_path)
        env = os.environ.get(_ENV_CHECKPOINT)
        if env:
            return Path(env)
        wdir = os.environ.get("ATLASPATCH_WEIGHTS_DIR")
        if wdir:
            cand = Path(wdir) / "sam2_hiera_tiny.npz"  # tools/convert_weights.py output
            if cand.exists():
                return cand
        # Look in HF cache for the reference repo checkpoint without network.
        hf_home = Path(os.environ.get("HF_HOME", Path.home() / ".cache" / "huggingface"))
        for pattern in (
            "hub/models--AtlasAnalyticsLab--AtlasPatch/snapshots/*/model.pth",
            "hub/models--facebook--sam2.1-hiera-tiny/snapshots/*/*.pt",
        ):
            matches = sorted(hf_home.glob(pattern))
            if matches:
                # snapshot dirs are commit hashes — lexicographic order is
                # arbitrary; prefer the most recently fetched revision
                return max(matches, key=lambda p: p.stat().st_mtime)
        return None

    def _load_params(self):
        import jax
        import jax.numpy as jnp

        from atlaspatch_tpu.models.sam2.model import init_params

        ckpt = self._resolve_checkpoint_path()
        if ckpt is not None and ckpt.exists():
            logger.info("Loading SAM2 checkpoint from %s", ckpt)
            if ckpt.suffix == ".npz":  # tools/convert_weights.py archive
                import numpy as _np

                from atlaspatch_tpu.tools.convert_weights import unflatten

                params = unflatten(dict(_np.load(ckpt)))
            else:
                from atlaspatch_tpu.models.sam2.convert import load_checkpoint

                params = load_checkpoint(str(ckpt), self.sam2_cfg)
            params = jax.tree.map(lambda a: jnp.asarray(a, dtype=jnp.float32), params)
        elif os.environ.get("ATLASPATCH_ALLOW_RANDOM_WEIGHTS") == "1":
            logger.warning(
                "No SAM2 checkpoint found (set %s or --checkpoint); using random init "
                "because ATLASPATCH_ALLOW_RANDOM_WEIGHTS=1. Masks will not be meaningful.",
                _ENV_CHECKPOINT,
            )
            params = init_params(self.sam2_cfg)
        else:
            # Same load-or-raise contract as the reference
            # (atlas_patch/services/segmentation.py:46-68) and the encoder zoo.
            raise RuntimeError(
                f"No SAM2 checkpoint found (set {_ENV_CHECKPOINT} or --checkpoint, "
                "or place the finetuned model.pth in the HF cache). Set "
                "ATLASPATCH_ALLOW_RANDOM_WEIGHTS=1 to run with random weights "
                "for benchmarking only."
            )
        if getattr(self.cfg, "precision", "float32") == "bfloat16":
            params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
        if self._mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            return jax.device_put(params, NamedSharding(self._mesh, P()))
        return jax.device_put(params, self._device)

    def _sharded_step(self, from_thumbs: bool, to_shape: bool = False):
        """Per-mesh jitted DP segmentation step (params replicated, batch
        sharded over the data axis); cached per variant."""
        key = (from_thumbs, to_shape)
        if key not in self._sharded_steps:
            from atlaspatch_tpu.models.sam2.model import make_sharded_segment_step

            self._sharded_steps[key] = make_sharded_segment_step(
                self.sam2_cfg, self._mesh, data_axis=self._data_axis,
                from_thumbs=from_thumbs, to_shape=to_shape,
            )
        return self._sharded_steps[key]

    # --- input/output resizing (host, PIL semantics as in the reference) -----------
    def _normalize_input(self, image) -> np.ndarray:
        if isinstance(image, Image.Image):
            if image.mode != "RGB":
                image = image.convert("RGB")
            return np.array(image, copy=True)
        arr = np.asarray(image)
        if arr.dtype in (np.float32, np.float64) and arr.max() <= 1.0:
            arr = (arr * 255).astype(np.uint8)
        elif arr.dtype != np.uint8:
            arr = arr.astype(np.uint8)
        if arr.ndim == 3 and arr.shape[0] == 3 and arr.shape[-1] != 3:
            arr = np.transpose(arr, (1, 2, 0))
        return np.ascontiguousarray(arr)

    def _resize_input(self, image: np.ndarray) -> tuple[np.ndarray, tuple[int, int]]:
        orig = (int(image.shape[0]), int(image.shape[1]))
        if orig == (self.input_size, self.input_size):
            return image, orig
        pil = Image.fromarray(image)
        resized = pil.resize((self.input_size, self.input_size), Image.Resampling.BILINEAR)
        return np.array(resized, copy=True), orig

    def _resize_mask(self, mask: np.ndarray, target_shape: tuple[int, int]) -> np.ndarray:
        mask_u8 = (mask * 255).astype(np.uint8)
        pil = Image.fromarray(mask_u8, mode="L")
        resized = pil.resize((target_shape[1], target_shape[0]), resample=Image.Resampling.NEAREST)
        return np.asarray(resized, dtype=np.float32) / 255.0

    # --- prediction ----------------------------------------------------------------
    def predict_logits(self, images_u8: np.ndarray) -> np.ndarray:
        """(B,1024,1024,3) uint8 → (B,1024,1024) float32 mask logits."""
        import jax
        import jax.numpy as jnp

        from atlaspatch_tpu.models.sam2.model import segment_step

        with perf.stage("segment_device"), jax.default_device(self._device):
            logits = segment_step(self.sam2_cfg, self.params, jnp.asarray(images_u8))
            out = np.asarray(logits)
        return out

    def predict_masks_async(self, images_u8: np.ndarray):
        """Dispatch the fused device program; returns the packed device array
        WITHOUT fetching, so the caller can overlap the next batch's transfer
        and compute with this batch's readback."""
        import jax
        import jax.numpy as jnp

        from atlaspatch_tpu.models.sam2.model import segment_step_packed

        with perf.stage("segment_dispatch"), jax.default_device(self._device):
            if self._mesh is not None:
                n = images_u8.shape[0]
                pad = (-n) % self._n_data
                if pad:
                    images_u8 = np.concatenate(
                        [images_u8, np.zeros((pad, *images_u8.shape[1:]), np.uint8)]
                    )
                packed = self._sharded_step(False)(
                    self.params, jnp.asarray(images_u8), jnp.float32(self.cfg.mask_threshold)
                )
                return packed[:n] if pad else packed
            return segment_step_packed(
                self.sam2_cfg,
                self.params,
                jnp.asarray(images_u8),
                jnp.float32(self.cfg.mask_threshold),
            )

    def predict_masks_grouped_async(
        self,
        arrs: Sequence[np.ndarray],
        targets: Sequence[tuple[int, int]] | None = None,
    ):
        """Dispatch native-size thumbnails grouped by shape; the bilinear
        upscale to the model input runs ON DEVICE (host→device bytes shrink by
        the thumbnail/model-size ratio — the dominant cost on slow host links).

        With ``targets`` (per-item (h, w)), the mask's PIL-NEAREST resample to
        that shape ALSO runs on device — on single chips AND data-parallel
        meshes — so only thumbnail-sized packed bits come back (~20× fewer
        device→host bytes than the 1024² mask); masks return already at their
        target shapes. Without targets or with ATLASPATCH_DEVICE_MASK_RESIZE=0,
        returns model-input-sized masks.
        """
        import jax
        import jax.numpy as jnp

        from atlaspatch_tpu.models.sam2.model import (
            pil_nearest_index,
            segment_step_packed_from_thumbs,
            segment_step_packed_to_shape,
        )

        device_resize = (
            targets is not None
            and os.environ.get("ATLASPATCH_DEVICE_MASK_RESIZE", "1") != "0"
        )

        groups: dict[tuple, list[int]] = {}
        for i, a in enumerate(arrs):
            key = (a.shape[0], a.shape[1], targets[i] if device_resize else None)
            groups.setdefault(key, []).append(i)

        handles = []
        with perf.stage("segment_dispatch"), jax.default_device(self._device):
            for (h, w, target), idxs in groups.items():
                n = len(idxs)
                padded = _pad_to_pow2_batch(n, max_batch=max(self.cfg.batch_size, n))
                if self._n_data > 1:
                    padded += (-padded) % self._n_data
                batch = np.zeros((padded, h, w, 3), dtype=np.uint8)
                for j, i in enumerate(idxs):
                    batch[j] = arrs[i]
                if target is not None:
                    S = self.input_size
                    idx_args = []
                    for n_out in (target[0], target[1]):
                        cached = self._resample_idx.get((n_out, S))
                        if cached is None:
                            cached = jnp.asarray(pil_nearest_index(n_out, S), jnp.int32)
                            self._resample_idx[(n_out, S)] = cached
                        idx_args.append(cached)
                    idx_args = tuple(idx_args)
                    step = (
                        self._sharded_step(True, to_shape=True)
                        if self._mesh is not None
                        else partial(segment_step_packed_to_shape, self.sam2_cfg)
                    )
                    packed = step(
                        self.params,
                        jnp.asarray(batch),
                        jnp.float32(self.cfg.mask_threshold),
                        *idx_args,
                    )
                elif self._mesh is not None:
                    packed = self._sharded_step(True)(
                        self.params, jnp.asarray(batch), jnp.float32(self.cfg.mask_threshold)
                    )
                else:
                    packed = segment_step_packed_from_thumbs(
                        self.sam2_cfg,
                        self.params,
                        jnp.asarray(batch),
                        jnp.float32(self.cfg.mask_threshold),
                    )
                # Start the D2H transfer the moment compute finishes instead
                # of at resolve(): the runner resolves batch i only after
                # dispatching batch i+1, so the packed-mask bytes cross the
                # (high-latency) link while the host preps the next batch —
                # resolve()'s np.asarray then finds the host copy ready.
                # (BENCH r4 counters: segment_fetch was 0.55-0.64 s/pass,
                # the single largest stage.)
                try:
                    packed.copy_to_host_async()
                except Exception:  # noqa: BLE001 — optional fast path only
                    pass
                handles.append((packed, idxs, target))

        def resolve() -> list[np.ndarray]:
            out: list[np.ndarray | None] = [None] * len(arrs)
            with perf.stage("segment_fetch"):
                for packed, idxs, target in handles:
                    bits = np.unpackbits(np.asarray(packed), axis=-1)
                    if target is not None:
                        bits = bits[:, :, : target[1]]  # drop byte padding
                    for j, i in enumerate(idxs):
                        out[i] = bits[j]
            return out  # type: ignore[return-value]

        return resolve

    @staticmethod
    def fetch_masks(packed_device) -> np.ndarray:
        with perf.stage("segment_fetch"):
            packed_np = np.asarray(packed_device)
        return np.unpackbits(packed_np, axis=-1)

    def predict_masks(self, images_u8: np.ndarray) -> np.ndarray:
        """(B,1024,1024,3) uint8 → (B,1024,1024) uint8 binary masks.

        Thresholding happens on device and only packed bits cross the
        host link (models/sam2/model.py:segment_step_packed).
        """
        with perf.stage("segment_device"):
            return self.fetch_masks(self.predict_masks_async(images_u8))

    def predict_batch(
        self, images: Sequence, *, resize_to_input: bool = True
    ) -> list[np.ndarray]:
        if not len(images):
            raise ValueError("images must be a non-empty sequence")
        arrs, orig_shapes = [], []
        for img in images:
            resized, orig = self._resize_input(self._normalize_input(img))
            arrs.append(resized)
            orig_shapes.append(orig)

        n = len(arrs)
        padded = _pad_to_pow2_batch(n, max_batch=max(self.cfg.batch_size, n))
        batch = np.zeros((padded, self.input_size, self.input_size, 3), dtype=np.uint8)
        batch[:n] = np.stack(arrs)
        bin_masks = self.predict_masks(batch)[:n]

        out: list[np.ndarray] = []
        for i in range(n):
            mask = bin_masks[i].astype(np.float32)
            if resize_to_input and mask.shape[:2] != orig_shapes[i]:
                mask = self._resize_mask(mask, orig_shapes[i])
            out.append(mask.astype(np.float32))
        return out

    def predict_image(self, image, *, resize_to_input: bool = True) -> np.ndarray:
        return self.predict_batch([image], resize_to_input=resize_to_input)[0]

    def close(self) -> None:
        self.params = None


class SAM2SegmentationService(SegmentationService):
    """Segmentation service that wraps the SAM2 predictor and standardizes masks."""

    def __init__(
        self,
        cfg: SegmentationConfig,
        sam2_cfg: SAM2Config | None = None,
        *,
        mesh=None,
        data_axis: str = "data",
    ) -> None:
        self.cfg = cfg.validated()
        self.predictor = SAM2Predictor(self.cfg, sam2_cfg, mesh=mesh, data_axis=data_axis)

    def _thumb_quant(self) -> int:
        """Shape-bucket quantum for thumbnails in the fast (non-float32,
        device-resize) mode. Distinct thumbnail shapes each compile a fresh
        SAM2 program under jit — multi-minute on TPU — so heterogeneous
        corpora would otherwise recompile per slide. Snapping dims to
        multiples of 32 (ATLASPATCH_THUMB_QUANT, 0 disables) collapses a
        mixed corpus into a handful of compiled shapes at ≤ ~3% scale
        perturbation; the reference-exact float32 / host-resize chains are
        never quantized."""
        if getattr(self.cfg, "precision", "float32") == "float32":
            return 0
        if os.environ.get("ATLASPATCH_HOST_RESIZE") == "1":
            return 0
        try:
            return max(0, int(os.environ.get("ATLASPATCH_THUMB_QUANT", "32")))
        except ValueError:
            return 0

    def _prepare_thumbnail(self, wsi: IWSI):
        with perf.stage("thumbnail"):
            # bfloat16 runs already depart from the reference's exact numeric
            # chain, so let JPEG pyramids decode thumbnails at 1/2–1/8 scale
            # natively (IDCT scaling; ~5x fewer host cycles, few-LSB drift).
            # float32 keeps the reference-exact full-decode + AREA chain.
            q = self._thumb_quant()
            thumb = wsi.get_thumbnail_at_power(
                power=self.cfg.thumbnail_power,
                interpolation="optimise",
                scaled_decode=getattr(self.cfg, "precision", "float32") != "float32",
                quantize=q,
                max_px=self.cfg.thumbnail_max if q else 0,
            )
            if not q and self.cfg.thumbnail_max:
                thumb.thumbnail((self.cfg.thumbnail_max, self.cfg.thumbnail_max))
            return thumb

    def segment_thumbnail(self, wsi: IWSI) -> Mask:
        thumb = self._prepare_thumbnail(wsi)
        mask_arr = self.predictor.predict_image(thumb, resize_to_input=True)
        return Mask(
            data=mask_arr.astype(np.float32),
            source_shape=(int(mask_arr.shape[0]), int(mask_arr.shape[1])),
        )

    def prepare_thumbnails(self, wsis: Sequence[IWSI]) -> list:
        """Host stage: thumbnails on a thread pool. Split out so the runner can
        overlap this with the device stage of the previous batch."""
        return list(self._thumb_pool().map(self._prepare_thumbnail, wsis))

    def _thumb_pool(self) -> ThreadPoolExecutor:
        """Persistent thumbnail pool: at small seg batches a per-batch pool
        would spawn and join ~8 threads every few slides (24 pools per
        192-slide bench pass) — pure overhead on the pipeline's host stage."""
        pool = getattr(self, "_thumb_pool_obj", None)
        if pool is None:
            pool = ThreadPoolExecutor(
                max_workers=min(8, os.cpu_count() or 8), thread_name_prefix="thumb"
            )
            self._thumb_pool_obj = pool
        return pool

    def prepare_thumbnails_safe(self, wsis: Sequence[IWSI]) -> list:
        """prepare_thumbnails with per-slide fault isolation: each element is
        the thumbnail OR the exception that slide raised (bad metadata,
        truncated pyramid, ...), so one poisoned slide cannot sink its whole
        batch. (The reference fails the full batch here: reference
        cli.py:384-391.)"""

        def one(w: IWSI):
            try:
                return self._prepare_thumbnail(w)
            except Exception as e:  # noqa: BLE001 — per-slide report
                return e

        return list(self._thumb_pool().map(one, wsis))

    def segment_thumbnails_async(self, thumbs: Sequence):
        """Dispatch the device stage; returns a zero-arg resolve() producing the
        masks. The runner uses this to overlap batch i+1's transfer+compute
        with batch i's readback and extraction submit.

        Default path ships native-size thumbnails and upscales on device
        (predict_masks_grouped_async); ATLASPATCH_HOST_RESIZE=1 selects the
        PIL host-resize path (bit-matches the reference's input chain).
        """
        if os.environ.get("ATLASPATCH_HOST_RESIZE") == "1":
            return self._segment_thumbnails_async_host_resize(thumbs)

        size = self.predictor.input_size
        arrs = [self.predictor._normalize_input(img) for img in thumbs]
        orig_shapes = [(a.shape[0], a.shape[1]) for a in arrs]
        # Device upscaling matches PIL only for UPSAMPLING; oversized thumbnails
        # (possible when --thumbnail-max exceeds the model input) are resized on
        # host with PIL's antialiased filter first.
        arrs = [
            a if (a.shape[0] <= size and a.shape[1] <= size)
            else self.predictor._resize_input(a)[0]
            for a in arrs
        ]
        resolve_bits = self.predictor.predict_masks_grouped_async(
            arrs, targets=orig_shapes
        )

        def resolve() -> list[Mask]:
            out = []
            for bits, orig in zip(resolve_bits(), orig_shapes):
                mask = np.asarray(bits, dtype=np.float32)
                if mask.shape[:2] != orig:
                    # env-disabled fallback returns model-input-sized masks
                    mask = self.predictor._resize_mask(mask, orig)
                    mask = np.asarray(mask, dtype=np.float32)
                out.append(
                    Mask(
                        data=mask,
                        source_shape=(int(mask.shape[0]), int(mask.shape[1])),
                    )
                )
            return out

        return resolve

    def _segment_thumbnails_async_host_resize(self, thumbs: Sequence):
        arrs, orig_shapes = [], []
        for img in thumbs:
            resized, orig = self.predictor._resize_input(self.predictor._normalize_input(img))
            arrs.append(resized)
            orig_shapes.append(orig)
        n = len(arrs)
        size = self.predictor.input_size
        padded = _pad_to_pow2_batch(n, max_batch=max(self.cfg.batch_size, n))
        batch = np.zeros((padded, size, size, 3), dtype=np.uint8)
        batch[:n] = np.stack(arrs)
        packed_dev = self.predictor.predict_masks_async(batch)

        def resolve() -> list[Mask]:
            bin_masks = self.predictor.fetch_masks(packed_dev)[:n]
            out = []
            for i in range(n):
                mask = bin_masks[i].astype(np.float32)
                if mask.shape[:2] != orig_shapes[i]:
                    mask = self.predictor._resize_mask(mask, orig_shapes[i])
                out.append(
                    Mask(
                        data=mask.astype(np.float32),
                        source_shape=(int(mask.shape[0]), int(mask.shape[1])),
                    )
                )
            return out

        return resolve

    def segment_thumbnails(self, thumbs: Sequence) -> list[Mask]:
        """Device stage: one fused batch over prepared thumbnails."""
        return self.segment_thumbnails_async(thumbs)()

    def segment_batch(self, wsis: Sequence[IWSI]) -> list[Mask]:
        return self.segment_thumbnails(self.prepare_thumbnails(wsis))

    def close(self) -> None:
        pool = getattr(self, "_thumb_pool_obj", None)
        if pool is not None:
            self._thumb_pool_obj = None
            pool.shutdown(wait=False)
        try:
            self.predictor.close()
        except Exception:
            pass
