"""End-to-end SAM2 image segmentation model (Flax), jit-compiled per batch shape.

Pipeline (single fused device program): uint8 NHWC thumbnails → normalize →
Hiera trunk → FPN neck → prompt-encode full-frame boxes → two-way mask decoder
→ bilinear upscale to image_size → logits. The service layer thresholds and
resizes masks back to thumbnail shape on host (reference behavior:
atlas_patch/services/segmentation.py:104-140).
"""

from __future__ import annotations

from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp

from atlaspatch_tpu.models.sam2.config import SAM2Config
from atlaspatch_tpu.models.sam2.decoder import MaskDecoder, PromptEncoder
from atlaspatch_tpu.models.sam2.hiera import FpnNeck, HieraDet
from atlaspatch_tpu.models.sam2.interp import interpolate_torch


class SAM2ImageModel(nn.Module):
    """SAM2 trunk + neck + SAM heads for single-image mask prediction."""

    cfg: SAM2Config

    def setup(self):
        cfg = self.cfg
        self.backbone = HieraDet(cfg, name="backbone")
        self.neck = FpnNeck(cfg, name="neck")
        self.prompt_encoder = PromptEncoder(cfg, name="prompt_encoder")
        self.mask_decoder = MaskDecoder(cfg, name="mask_decoder")
        # 1x1 projections of the two high-res levels, applied once per image
        # (part of the decoder in the checkpoint layout).
        self.conv_s0 = nn.Conv(cfg.prompt_hidden_size // 8, kernel_size=(1, 1), name="conv_s0")
        self.conv_s1 = nn.Conv(cfg.prompt_hidden_size // 4, kernel_size=(1, 1), name="conv_s1")
        self.no_memory_embedding = self.param(
            "no_memory_embedding", nn.initializers.zeros, (1, 1, cfg.fpn_hidden_size)
        )

    def image_features(self, pixel_values: jnp.ndarray):
        """NHWC normalized pixels → (feat_s0, feat_s1, image_embed) NHWC."""
        stage_outputs = self.backbone(pixel_values)
        fpn = self.neck(stage_outputs)  # low→high resolution
        levels = fpn[-self.cfg.num_feature_levels :][::-1]  # high→low: stride 4, 8, 16
        feat_s0 = self.conv_s0(levels[0])
        feat_s1 = self.conv_s1(levels[1])
        image_embed = levels[2] + self.no_memory_embedding[0][None]
        return feat_s0, feat_s1, image_embed

    def __call__(self, pixel_values: jnp.ndarray, boxes: jnp.ndarray, multimask_output: bool = False):
        """pixel_values (B,H,W,3) normalized; boxes (B,P,4) xyxy pixels.

        Returns (low_res_masks (B,P,M,S4,S4), iou (B,P,M), obj logits (B,P,1)).
        """
        feat_s0, feat_s1, image_embed = self.image_features(pixel_values)
        sparse, dense = self.prompt_encoder(boxes)
        image_pe = self.prompt_encoder.image_wide_pe()
        masks, iou, obj = self.mask_decoder(
            image_embed,
            image_pe,
            sparse,
            dense,
            (feat_s0, feat_s1),
            multimask_output=multimask_output,
        )
        return masks, iou, obj


def normalize_images(cfg: SAM2Config, images_u8: jnp.ndarray) -> jnp.ndarray:
    mean = jnp.asarray(cfg.pixel_mean, dtype=jnp.float32)
    std = jnp.asarray(cfg.pixel_std, dtype=jnp.float32)
    return (images_u8.astype(jnp.float32) / 255.0 - mean) / std


@partial(jax.jit, static_argnums=(0,))
def segment_step(cfg: SAM2Config, params, images_u8: jnp.ndarray) -> jnp.ndarray:
    """Fused device step: uint8 (B,1024,1024,3) → mask logits (B,1024,1024).

    Uses a full-frame box prompt per image (the reference's tissue-detection
    prompt) and single-mask output, then upscales the low-res logits with
    torch-parity bilinear interpolation.
    """
    model = SAM2ImageModel(cfg)
    # Compute dtype follows the parameters (float32 for parity; bfloat16 when
    # the predictor loaded reduced-precision params).
    param_dtype = jax.tree_util.tree_leaves(params)[0].dtype
    pixels = normalize_images(cfg, images_u8).astype(param_dtype)
    B = images_u8.shape[0]
    box = jnp.asarray([[0.0, 0.0, cfg.image_size, cfg.image_size]], dtype=jnp.float32)
    boxes = jnp.broadcast_to(box[None], (B, 1, 4))
    masks, _iou, _obj = model.apply({"params": params}, pixels, boxes, multimask_output=False)
    masks = masks.astype(jnp.float32)
    low_res = masks[:, 0, 0]  # (B, S4, S4)
    logits = interpolate_torch(
        low_res[..., None], (cfg.image_size, cfg.image_size), "bilinear"
    )[..., 0]
    return logits


def _thumbs_to_mask_bits(cfg: SAM2Config, params, thumbs_u8, threshold):
    """Shared forward body: native-size uint8 thumbnails → (B, S, S) uint8
    binary mask. Upscale to the model input runs on device in float32 (same
    half-pixel mapping as the host PIL path, minus PIL's uint8 intermediate
    rounding); threshold applied to the upscaled logits."""
    S = cfg.image_size
    up = interpolate_torch(thumbs_u8.astype(jnp.float32), (S, S), "bilinear")
    mean = jnp.asarray(cfg.pixel_mean, jnp.float32)
    std = jnp.asarray(cfg.pixel_std, jnp.float32)
    pixels = (up / 255.0 - mean) / std

    model = SAM2ImageModel(cfg)
    param_dtype = jax.tree_util.tree_leaves(params)[0].dtype
    pixels = pixels.astype(param_dtype)
    B = thumbs_u8.shape[0]
    box = jnp.asarray([[0.0, 0.0, S, S]], dtype=jnp.float32)
    boxes = jnp.broadcast_to(box[None], (B, 1, 4))
    masks, _iou, _obj = model.apply({"params": params}, pixels, boxes, multimask_output=False)
    low_res = masks[:, 0, 0].astype(jnp.float32)
    logits = interpolate_torch(low_res[..., None], (S, S), "bilinear")[..., 0]
    return (logits > threshold).astype(jnp.uint8)


def _packbits_last_axis(bits):
    """(…, W) uint8 {0,1} → (…, W//8) uint8, numpy packbits MSB-first. W must
    already be a multiple of 8."""
    *lead, W = bits.shape
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    packed = jnp.einsum(
        "...wk,k->...w",
        bits.reshape(*lead, W // 8, 8),
        weights,
        preferred_element_type=jnp.uint32,
    )
    return packed.astype(jnp.uint8)


@partial(jax.jit, static_argnums=(0,))
def segment_step_packed_from_thumbs(
    cfg: SAM2Config, params, thumbs_u8: jnp.ndarray, threshold: jnp.ndarray
):
    """segment_step_packed with ON-DEVICE thumbnail upscaling.

    thumbs_u8: (B, h, w, 3) uint8 at the thumbnail's native size — shipping
    these instead of host-resized 1024² images shrinks the host→device
    transfer by up to ~20×.
    """
    bits = _thumbs_to_mask_bits(cfg, params, thumbs_u8, threshold)
    return _packbits_last_axis(bits)


def pil_nearest_index(n_out: int, n_in: int):
    """Source-index table of PIL's NEAREST resize, bit-exact.

    PIL (Geometry.c ImagingScaleAffine) walks the source coordinate
    incrementally — ``xo = scale*0.5; xo += scale`` per output pixel — so the
    accumulated float64 rounding decides near-tie pixels. Reproduced here the
    same way (fuzz-verified bit-exact over 600 random shapes, both
    directions, tests/test_device_mask_resize.py).
    """
    import numpy as np

    a0 = n_in / n_out
    xo = a0 * 0.5
    idx = np.empty(n_out, np.int64)
    for x in range(n_out):
        idx[x] = min(int(xo), n_in - 1)
        xo += a0
    return idx


@partial(jax.jit, static_argnums=(0,))
def segment_step_packed_to_shape(
    cfg: SAM2Config,
    params,
    thumbs_u8: jnp.ndarray,
    threshold: jnp.ndarray,
    row_idx: jnp.ndarray,
    col_idx: jnp.ndarray,
):
    """segment_step_packed_from_thumbs + ON-DEVICE mask downsample.

    The pipeline only ever consumes the mask at the thumbnail's own
    resolution (reference resizes the 1024² mask back with PIL NEAREST,
    segmentation.py:112-118), so the NEAREST resample runs on device using
    the exact PIL index tables (``pil_nearest_index``) and only the packed
    thumbnail-sized bits cross the device→host link — ~20× fewer bytes than
    shipping the packed 1024² mask.

    Returns (B, h, ceil(w/8)) uint8, packbits convention; callers slice the
    unpacked width back to w.
    """
    bits = _thumbs_to_mask_bits(cfg, params, thumbs_u8, threshold)
    small = bits[:, row_idx][:, :, col_idx]  # (B, h, w) PIL-NEAREST gather
    w = col_idx.shape[0]
    w_pad = -(-w // 8) * 8
    if w_pad != w:
        small = jnp.pad(small, ((0, 0), (0, 0), (0, w_pad - w)))
    return _packbits_last_axis(small)


@partial(jax.jit, static_argnums=(0,))
def segment_step_packed(cfg: SAM2Config, params, images_u8: jnp.ndarray, threshold: jnp.ndarray):
    """segment_step + on-device thresholding and bit-packing.

    Returns (B, S, S//8) uint8 — the binary mask packed MSB-first along the
    last axis (numpy packbits convention). Shrinks the device→host transfer
    32× vs float32 logits, which matters when chips sit behind a slow host
    link; the mask is bit-identical to thresholding the logits on host.
    """
    logits = segment_step(cfg, params, images_u8)
    bits = (logits > threshold).astype(jnp.uint8)
    B, S = bits.shape[0], bits.shape[1]
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    packed = jnp.einsum(
        "bswk,k->bsw", bits.reshape(B, S, S // 8, 8), weights, preferred_element_type=jnp.uint32
    )
    return packed.astype(jnp.uint8)


def make_sharded_segment_step(cfg: SAM2Config, mesh, *, data_axis: str = "data",
                              from_thumbs: bool = True, to_shape: bool = False):
    """Multi-chip serving: jit the packed segmentation step over a mesh with
    parameters replicated and the image batch sharded across `data_axis`.

    The forward is embarrassingly parallel over the batch, so XLA partitions
    it with zero collectives — N chips segment N×(per-chip batch) thumbnails
    concurrently. The batch's leading dim must be divisible by the mesh's
    data-axis size (callers pad; see SAM2Predictor).

    ``to_shape``: wrap segment_step_packed_to_shape instead — extra
    (row_idx, col_idx) args (replicated) resample the mask on device so each
    chip returns thumbnail-sized packed bits.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    batched = NamedSharding(mesh, P(data_axis))
    if to_shape:
        inner = partial(segment_step_packed_to_shape.__wrapped__, cfg)
        return jax.jit(
            inner, in_shardings=(repl, batched, repl, repl, repl), out_shardings=batched
        )
    fn = segment_step_packed_from_thumbs if from_thumbs else segment_step_packed
    inner = partial(fn.__wrapped__, cfg)  # un-jitted body, cfg closed over
    return jax.jit(inner, in_shardings=(repl, batched, repl), out_shardings=batched)


def init_params(cfg: SAM2Config, seed: int = 0):
    model = SAM2ImageModel(cfg)
    dummy = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    boxes = jnp.zeros((1, 1, 4), jnp.float32)
    # jit the whole init: eager init dispatches every op as its own tiny
    # program, which is pathological on remote-compile TPU backends.
    init_fn = jax.jit(lambda key: model.init(key, dummy, boxes))
    return init_fn(jax.random.PRNGKey(seed))["params"]
