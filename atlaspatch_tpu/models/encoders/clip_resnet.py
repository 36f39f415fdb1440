"""CLIP's ModifiedResNet visual tower in Flax (clip_rn50/101/50x4/50x16/50x64).

Architecture (reference encoders: atlas_patch/models/patch/clip.py:13-23 via
open_clip "openai" weights): 3-conv stem with avg-pool, anti-aliased
Bottlenecks (avg-pool before the strided 1x1), and a global attention-pool
head with a learned positional embedding over the final spatial grid plus a
mean token.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from atlaspatch_tpu.models.encoders.convert import _np

from atlaspatch_tpu.models.encoders.resnet import FrozenBatchNorm


@dataclass(frozen=True)
class ClipResNetSpec:
    layers: tuple[int, ...]
    width: int
    embed_dim: int  # attnpool output dim
    heads: int
    image_size: int

    @property
    def final_channels(self) -> int:
        return self.width * 32

    @property
    def spacial_dim(self) -> int:
        return self.image_size // 32


CLIP_RESNET_SPECS = {
    "clip_rn50": ClipResNetSpec((3, 4, 6, 3), 64, 1024, 32, 224),
    "clip_rn101": ClipResNetSpec((3, 4, 23, 3), 64, 512, 32, 224),
    "clip_rn50x4": ClipResNetSpec((4, 6, 10, 6), 80, 640, 40, 288),
    "clip_rn50x16": ClipResNetSpec((6, 8, 18, 8), 96, 768, 48, 384),
    "clip_rn50x64": ClipResNetSpec((3, 15, 36, 10), 128, 1024, 64, 448),
}


def _avg_pool(x: jnp.ndarray, stride: int) -> jnp.ndarray:
    return nn.avg_pool(x, window_shape=(stride, stride), strides=(stride, stride))


class ClipBottleneck(nn.Module):
    planes: int  # output = planes * 4
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        out = nn.relu(FrozenBatchNorm(self.planes, name="bn1")(out))
        out = nn.Conv(self.planes, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False, name="conv2")(out)
        out = nn.relu(FrozenBatchNorm(self.planes, name="bn2")(out))
        if self.stride > 1:
            out = _avg_pool(out, self.stride)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, name="conv3")(out)
        out = FrozenBatchNorm(self.planes * 4, name="bn3")(out)
        if self.downsample:
            identity = x
            if self.stride > 1:
                identity = _avg_pool(identity, self.stride)
            identity = nn.Conv(
                self.planes * 4, (1, 1), use_bias=False, name="downsample_conv"
            )(identity)
            identity = FrozenBatchNorm(self.planes * 4, name="downsample_bn")(identity)
        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    spec: ClipResNetSpec

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, C) → (B, embed_dim): attention with a mean query token."""
        s = self.spec
        B, H, W, C = x.shape
        tokens = x.reshape(B, H * W, C)
        mean_tok = tokens.mean(axis=1, keepdims=True)
        tokens = jnp.concatenate([mean_tok, tokens], axis=1)  # (B, HW+1, C)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(1.0 / C**0.5),
            (s.spacial_dim**2 + 1, C),
        )
        tokens = tokens + pos[None].astype(tokens.dtype)

        head_dim = C // s.heads
        q = nn.Dense(C, name="q_proj")(tokens[:, :1])
        k = nn.Dense(C, name="k_proj")(tokens)
        v = nn.Dense(C, name="v_proj")(tokens)

        def split(t):
            return t.reshape(B, -1, s.heads, head_dim).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k)) * (head_dim**-0.5)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, split(v))
        out = out.transpose(0, 2, 1, 3).reshape(B, 1, C)
        return nn.Dense(s.embed_dim, name="c_proj")(out)[:, 0]


class ClipModifiedResNet(nn.Module):
    spec: ClipResNetSpec

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = self.spec
        half = s.width // 2
        x = nn.Conv(half, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)], use_bias=False, name="conv1")(x)
        x = nn.relu(FrozenBatchNorm(half, name="bn1")(x))
        x = nn.Conv(half, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False, name="conv2")(x)
        x = nn.relu(FrozenBatchNorm(half, name="bn2")(x))
        x = nn.Conv(s.width, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False, name="conv3")(x)
        x = nn.relu(FrozenBatchNorm(s.width, name="bn3")(x))
        x = _avg_pool(x, 2)

        inplanes = s.width
        for stage, n_blocks in enumerate(s.layers):
            planes = s.width * (2**stage)
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                needs_down = b == 0 and (stride > 1 or inplanes != planes * 4)
                x = ClipBottleneck(
                    planes,
                    stride=stride if b == 0 else 1,
                    downsample=needs_down,
                    name=f"layer{stage + 1}_{b}",
                )(x)
                inplanes = planes * 4
        return AttentionPool2d(s, name="attnpool")(x)


def open_clip_resnet_to_flax(sd, spec: ClipResNetSpec, prefix: str = "visual.") -> dict:
    """open_clip/openai ModifiedResNet state dict → Flax params."""

    np_ = _np  # shared torch->numpy helper (convert.py)

    def conv(key):
        return {"kernel": np_(sd[f"{prefix}{key}.weight"]).transpose(2, 3, 1, 0)}

    def bn(key):
        return {
            "scale": np_(sd[f"{prefix}{key}.weight"]),
            "bias": np_(sd[f"{prefix}{key}.bias"]),
            "mean": np_(sd[f"{prefix}{key}.running_mean"]),
            "var": np_(sd[f"{prefix}{key}.running_var"]),
        }

    def lin(key):
        return {
            "kernel": np_(sd[f"{prefix}{key}.weight"]).T,
            "bias": np_(sd[f"{prefix}{key}.bias"]),
        }

    params: dict = {
        "conv1": conv("conv1"), "bn1": bn("bn1"),
        "conv2": conv("conv2"), "bn2": bn("bn2"),
        "conv3": conv("conv3"), "bn3": bn("bn3"),
    }
    for stage, n_blocks in enumerate(spec.layers):
        for b in range(n_blocks):
            src = f"layer{stage + 1}.{b}"
            block: dict = {}
            for c in (1, 2, 3):
                block[f"conv{c}"] = conv(f"{src}.conv{c}")
                block[f"bn{c}"] = bn(f"{src}.bn{c}")
            if f"{prefix}{src}.downsample.0.weight" in sd:
                block["downsample_conv"] = conv(f"{src}.downsample.0")
                block["downsample_bn"] = bn(f"{src}.downsample.1")
            params[f"layer{stage + 1}_{b}"] = block
    params["attnpool"] = {
        "positional_embedding": np_(sd[f"{prefix}attnpool.positional_embedding"]),
        "q_proj": lin("attnpool.q_proj"),
        "k_proj": lin("attnpool.k_proj"),
        "v_proj": lin("attnpool.v_proj"),
        "c_proj": lin("attnpool.c_proj"),
    }
    return params
