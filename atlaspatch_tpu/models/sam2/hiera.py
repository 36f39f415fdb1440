"""Hiera (hierarchical ViT) trunk for SAM2, in Flax — NHWC, static shapes.

Architecture per the reference spec (reference: atlas_patch/configs/
sam2.1_hiera_t.yaml:9-15): conv patch embed stride 4, interpolated background
positional embedding + tiled window embedding, 4 stages with dim/head doubling,
query pooling (2x2 max) at the first block of stages 2-4, window attention with
per-stage window sizes, and full global attention at designated blocks.

TPU notes: everything is a static-shape tensor op — window partitioning is a
reshape/transpose chain, pooling is reduce_window, attention is batched einsum
that XLA tiles onto the MXU (a Pallas flash-attention kernel can be swapped in
for the 4096-token global blocks via ops/attention.py).
"""

from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp

from atlaspatch_tpu.models.sam2.config import HieraBlockSpec, SAM2Config


def _gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Trunk GELU: exact erf by default (bit-parity with the torch oracle);
    ATLASPATCH_GELU_TANH=1 opts into the tanh approximation for symmetry
    with the ViT serving flag. Measured on a v5e at hiera-tiny 1024²
    (trained weights, bf16, batch 32): a NO-OP — 101.1 thumbs/s resident
    either way, binary masks bit-identical. Unlike ViT-L (+32%,
    docs/PERF.md), this trunk's pace is set by windowed attention and
    interpolation, not the MLP erf. Read at trace time."""
    approx = os.environ.get("ATLASPATCH_GELU_TANH") == "1"
    return jax.nn.gelu(x, approximate=approx)


def window_partition(x: jnp.ndarray, window_size: int) -> tuple[jnp.ndarray, tuple[int, int]]:
    """(B,H,W,C) → (B*nW, ws, ws, C) with bottom/right zero padding."""
    B, H, W, C = x.shape
    pad_h = (window_size - H % window_size) % window_size
    pad_w = (window_size - W % window_size) % window_size
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.reshape(B, Hp // window_size, window_size, Wp // window_size, window_size, C)
    windows = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window_size, window_size, C)
    return windows, (Hp, Wp)


def window_unpartition(
    windows: jnp.ndarray, window_size: int, pad_hw: tuple[int, int], hw: tuple[int, int]
) -> jnp.ndarray:
    """Inverse of window_partition, cropping away padding."""
    Hp, Wp = pad_hw
    H, W = hw
    C = windows.shape[-1]
    B = windows.shape[0] // ((Hp // window_size) * (Wp // window_size))
    x = windows.reshape(B, Hp // window_size, Wp // window_size, window_size, window_size, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
    return x[:, :H, :W, :]


def max_pool_2x2(x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """(B,H,W,C) max pool, kernel=stride (floor mode like torch ceil_mode=False)."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, stride, stride, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )


class MultiScaleAttention(nn.Module):
    dim_out: int
    num_heads: int
    query_stride: int | None = None  # 2 at stage transitions, else None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, _ = x.shape
        head_dim = self.dim_out // self.num_heads
        qkv = nn.Dense(self.dim_out * 3, name="qkv")(x)
        qkv = qkv.reshape(B, H * W, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        if self.query_stride:
            q = q.reshape(B, H, W, self.dim_out)
            q = max_pool_2x2(q, self.query_stride)
            H, W = q.shape[1], q.shape[2]
            q = q.reshape(B, H * W, self.num_heads, head_dim)

        # (B, heads, T, d); global blocks (4096 tokens) route to the Pallas
        # flash-attention kernel on TPU, small windowed blocks to plain einsum.
        from atlaspatch_tpu.ops.attention import attention

        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        out = attention(q, k, v, sm_scale=head_dim**-0.5)
        out = out.transpose(0, 2, 1, 3).reshape(B, H, W, self.dim_out)
        return nn.Dense(self.dim_out, name="proj")(out)


class MLP(nn.Module):
    hidden_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden_dim, name="proj_in")(x)
        x = _gelu(x)
        return nn.Dense(self.out_dim, name="proj_out")(x)


class MultiScaleBlock(nn.Module):
    """One trunk block; its (dim, window, query-stride) schedule entry comes
    from SAM2Config.block_schedule() — the single source of truth shared with
    validate_input_size, so the model and the size validator cannot drift."""

    cfg: SAM2Config
    spec: HieraBlockSpec

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        dim = self.spec.dim
        dim_out = self.spec.dim_out
        window_size = self.spec.window_size
        query_stride = self.spec.query_stride

        residual = x
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layer_norm1")(x)

        if dim != dim_out:
            proj = nn.Dense(dim_out, name="proj")(h)
            residual = max_pool_2x2(proj, query_stride) if query_stride else proj

        ws = window_size
        if window_size > 0:
            H, W = h.shape[1], h.shape[2]
            h, pad_hw = window_partition(h, window_size)

        h = MultiScaleAttention(
            dim_out=dim_out,
            num_heads=self.spec.num_heads,
            query_stride=query_stride,
            name="attn",
        )(h)

        if query_stride:
            ws = window_size // cfg.query_stride
            H, W = residual.shape[1], residual.shape[2]
            pad_h = (ws - H % ws) % ws if ws else 0
            pad_w = (ws - W % ws) % ws if ws else 0
            pad_hw = (H + pad_h, W + pad_w)

        if window_size > 0:
            h = window_unpartition(h, ws, pad_hw, (H, W))

        x = residual + h
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layer_norm2")(x)
        x = x + MLP(int(dim_out * cfg.mlp_ratio), dim_out, name="mlp")(h)
        return x


class HieraDet(nn.Module):
    """Hiera trunk: returns per-stage feature maps (high → low resolution)."""

    cfg: SAM2Config

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> list[jnp.ndarray]:
        cfg = self.cfg
        x = nn.Conv(
            cfg.hidden_size,
            kernel_size=(cfg.patch_kernel, cfg.patch_kernel),
            strides=(cfg.patch_stride, cfg.patch_stride),
            padding=[(cfg.patch_padding, cfg.patch_padding)] * 2,
            name="patch_embed",
        )(pixel_values)

        h, w = x.shape[1], x.shape[2]
        pos_embed_bkg = self.param(
            "pos_embed",
            nn.initializers.zeros,
            (1, *cfg.window_pos_embed_bkg_size, cfg.hidden_size),
        )
        win0 = cfg.window_size_per_stage[0]
        pos_embed_window = self.param(
            "pos_embed_window", nn.initializers.zeros, (1, win0, win0, cfg.hidden_size)
        )
        # Interpolate the background embedding to (h, w) with torch-exact
        # bicubic (a=-0.75, align_corners=False) and tile the window embedding.
        from atlaspatch_tpu.models.sam2.interp import interpolate_torch

        pos = interpolate_torch(pos_embed_bkg, (h, w), "bicubic").astype(x.dtype)
        pos = pos + jnp.tile(pos_embed_window, (1, h // win0, w // win0, 1))
        x = x + pos

        outputs: list[jnp.ndarray] = []
        stage_ends = set(cfg.stage_ends)
        for spec in cfg.block_schedule():
            x = MultiScaleBlock(
                cfg=cfg, spec=spec, name=f"blocks_{spec.total_block_idx}"
            )(x)
            if spec.total_block_idx in stage_ends:
                outputs.append(x)
        return outputs


class FpnNeck(nn.Module):
    """FPN neck: lateral 1x1 convs to fpn_hidden_size + nearest top-down fusion
    for the configured levels (reference spec: fpn_top_down_levels [2,3])."""

    cfg: SAM2Config

    @nn.compact
    def __call__(self, stage_outputs: list[jnp.ndarray]) -> list[jnp.ndarray]:
        cfg = self.cfg
        n = len(cfg.backbone_channel_list) - 1
        convs = [
            nn.Conv(cfg.fpn_hidden_size, kernel_size=(1, 1), name=f"convs_{i}")
            for i in range(len(cfg.backbone_channel_list))
        ]
        outputs: list[jnp.ndarray] = []
        prev = None
        # stage_outputs[i] has channels embed_dim_per_stage[i]; convs are ordered
        # by backbone_channel_list (low-res first), so conv index is n - i.
        for i in range(n, -1, -1):
            lateral = convs[n - i](stage_outputs[i])
            if i in cfg.fpn_top_down_levels and i != n and prev is not None:
                B, H, W, C = prev.shape
                top_down = jax.image.resize(
                    prev.astype(jnp.float32), (B, H * 2, W * 2, C), method="nearest"
                ).astype(lateral.dtype)
                prev = lateral + top_down
            else:
                prev = lateral
            outputs.append(prev)
        # outputs currently low→high resolution; keep that order (HF neck order),
        # callers slice the levels they need.
        return outputs
