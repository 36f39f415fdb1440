"""Swin Transformer (tiny) with the CHIEF-CTransPath ConvStem, in Flax.

Covers the `chief-ctranspath` encoder (reference: atlas_patch/models/patch/
chief_ctranspath.py:64-186): a 3-conv stem (3x3 s2 + BN + ReLU twice, then 1x1
to embed_dim) replaces the patch embed of swin_tiny_patch4_window7_224; output
is the final-norm feature map mean-pooled over space → 768.

All window geometry (relative-position indices, shifted-window attention
masks) is static and precomputed with numpy at trace time — the compiled
program is pure reshapes + batched MXU matmuls.
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
class SwinSpec:
    img_size: int = 224
    patch_size: int = 4
    embed_dim: int = 96
    depths: tuple[int, ...] = (2, 2, 6, 2)
    heads: tuple[int, ...] = (3, 6, 12, 24)
    window: int = 7
    mlp_ratio: float = 4.0
    conv_stem: bool = True  # CHIEF ConvStem vs plain conv patchify
    ln_eps: float = 1e-5

    @property
    def embedding_dim(self) -> int:
        return self.embed_dim * 2 ** (len(self.depths) - 1)


def _rel_pos_index(window: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window), indexing="ij"))
    coords_flat = coords.reshape(2, -1)
    rel = coords_flat[:, :, None] - coords_flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1)  # (T, T)


def _shift_attn_mask(resolution: int, window: int, shift: int) -> np.ndarray | None:
    if shift == 0:
        return None
    img_mask = np.zeros((resolution, resolution), np.int32)
    cnt = 0
    for h_slice in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for w_slice in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img_mask[h_slice, w_slice] = cnt
            cnt += 1
    n = resolution // window
    windows = img_mask.reshape(n, window, n, window).transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = windows[:, None, :] - windows[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)  # (nW, T, T)


class WindowAttention(nn.Module):
    dim: int
    heads: int
    window: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: np.ndarray | None) -> jnp.ndarray:
        """x: (B*nW, T, C); mask: (nW, T, T) or None."""
        Bn, T, C = x.shape
        head_dim = self.dim // self.heads
        qkv = nn.Dense(3 * self.dim, name="qkv")(x)
        qkv = qkv.reshape(Bn, T, 3, self.heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (head_dim**-0.5)

        table = self.param(
            "rel_pos_table",
            nn.initializers.normal(0.02),
            ((2 * self.window - 1) ** 2, self.heads),
        )
        index = _rel_pos_index(self.window).reshape(-1)
        bias = table[index].reshape(T, T, self.heads).transpose(2, 0, 1)
        attn = attn + bias[None].astype(attn.dtype)

        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(Bn // nW, nW, self.heads, T, T)
            attn = attn + jnp.asarray(mask)[None, :, None].astype(attn.dtype)
            attn = attn.reshape(Bn, self.heads, T, T)

        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(Bn, T, C)
        return nn.Dense(self.dim, name="proj")(out)


class SwinBlock(nn.Module):
    spec: SwinSpec
    dim: int
    heads: int
    resolution: int
    shift: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = self.spec
        B, H, W, C = x.shape
        window = min(s.window, self.resolution)
        shift = self.shift if self.resolution > window else 0

        h = nn.LayerNorm(epsilon=s.ln_eps, name="norm1")(x)
        if shift:
            h = jnp.roll(h, (-shift, -shift), axis=(1, 2))
        n = H // window
        hw = h.reshape(B, n, window, n, window, C).transpose(0, 1, 3, 2, 4, 5)
        hw = hw.reshape(B * n * n, window * window, C)
        mask = _shift_attn_mask(self.resolution, window, shift)
        hw = WindowAttention(self.dim, self.heads, window, name="attn")(hw, mask)
        h = hw.reshape(B, n, n, window, window, C).transpose(0, 1, 3, 2, 4, 5)
        h = h.reshape(B, H, W, C)
        if shift:
            h = jnp.roll(h, (shift, shift), axis=(1, 2))
        x = x + h

        h = nn.LayerNorm(epsilon=s.ln_eps, name="norm2")(x)
        h = nn.Dense(int(self.dim * s.mlp_ratio), name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="fc2")(h)
        return x + h


class PatchMerging(nn.Module):
    out_dim: int
    ln_eps: float

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(epsilon=self.ln_eps, name="norm")(x)
        return nn.Dense(self.out_dim, use_bias=False, name="reduction")(x)


class SwinNet(nn.Module):
    spec: SwinSpec

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        s = self.spec
        if s.conv_stem:
            c = s.embed_dim // 8
            x = nn.Conv(c, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)], use_bias=False, name="stem_conv0")(images)
            x = nn.relu(FrozenBatchNorm(c, name="stem_bn0")(x))
            x = nn.Conv(2 * c, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)], use_bias=False, name="stem_conv1")(x)
            x = nn.relu(FrozenBatchNorm(2 * c, name="stem_bn1")(x))
            x = nn.Conv(s.embed_dim, (1, 1), name="stem_proj")(x)
        else:
            x = nn.Conv(
                s.embed_dim,
                (s.patch_size, s.patch_size),
                strides=(s.patch_size, s.patch_size),
                padding="VALID",
                name="stem_proj",
            )(images)
        x = nn.LayerNorm(epsilon=s.ln_eps, name="patch_norm")(x)

        resolution = s.img_size // s.patch_size
        dim = s.embed_dim
        for stage, depth in enumerate(s.depths):
            if stage > 0:
                x = PatchMerging(dim * 2, s.ln_eps, name=f"merge{stage}")(x)
                dim *= 2
                resolution //= 2
            for b in range(depth):
                shift = 0 if b % 2 == 0 else min(s.window, resolution) // 2
                x = SwinBlock(
                    s,
                    dim,
                    s.heads[stage],
                    resolution,
                    shift,
                    name=f"stage{stage}_block{b}",
                )(x)
        x = nn.LayerNorm(epsilon=s.ln_eps, name="norm")(x)
        return x.mean(axis=(1, 2))


# --- converters ----------------------------------------------------------------------
def _lin(sd, key, bias=True):
    out = {"kernel": _np(sd[f"{key}.weight"]).T}
    if bias and f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def _ln(sd, key):
    return {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}


def timm_swin_to_flax(sd, spec: SwinSpec) -> dict:
    """timm swin naming (new layout: layer i >= 1 holds its own downsample),
    which is what the CHIEF checkpoint is loaded into after the reference's
    key remap (chief_ctranspath.py:141-151). The remap is applied here when
    the dict still uses the old layout."""
    # Apply the CHIEF old→new downsample remap when needed.
    if any(k.startswith("layers.0.downsample.") for k in sd):
        remapped = {}
        for k, v in sd.items():
            for i in (2, 1, 0):
                old = f"layers.{i}.downsample."
                if k.startswith(old):
                    k = k.replace(f"layers.{i}.", f"layers.{i + 1}.")
                    break
            remapped[k] = v
        sd = remapped
    sd = {k: v for k, v in sd.items()
          if "relative_position_index" not in k and "attn_mask" not in k}

    params: dict = {"patch_norm": _ln(sd, "patch_embed.norm"), "norm": _ln(sd, "norm")}
    if spec.conv_stem:
        params["stem_conv0"] = {"kernel": _np(sd["patch_embed.proj.0.weight"]).transpose(2, 3, 1, 0)}
        params["stem_bn0"] = {
            "scale": _np(sd["patch_embed.proj.1.weight"]),
            "bias": _np(sd["patch_embed.proj.1.bias"]),
            "mean": _np(sd["patch_embed.proj.1.running_mean"]),
            "var": _np(sd["patch_embed.proj.1.running_var"]),
        }
        params["stem_conv1"] = {"kernel": _np(sd["patch_embed.proj.3.weight"]).transpose(2, 3, 1, 0)}
        params["stem_bn1"] = {
            "scale": _np(sd["patch_embed.proj.4.weight"]),
            "bias": _np(sd["patch_embed.proj.4.bias"]),
            "mean": _np(sd["patch_embed.proj.4.running_mean"]),
            "var": _np(sd["patch_embed.proj.4.running_var"]),
        }
        params["stem_proj"] = {
            "kernel": _np(sd["patch_embed.proj.6.weight"]).transpose(2, 3, 1, 0),
            "bias": _np(sd["patch_embed.proj.6.bias"]),
        }
    else:
        params["stem_proj"] = {
            "kernel": _np(sd["patch_embed.proj.weight"]).transpose(2, 3, 1, 0),
            "bias": _np(sd["patch_embed.proj.bias"]),
        }

    for stage in range(len(spec.depths)):
        if stage > 0:
            params[f"merge{stage}"] = {
                "norm": _ln(sd, f"layers.{stage}.downsample.norm"),
                "reduction": _lin(sd, f"layers.{stage}.downsample.reduction", bias=False),
            }
        for b in range(spec.depths[stage]):
            p = f"layers.{stage}.blocks.{b}"
            params[f"stage{stage}_block{b}"] = {
                "norm1": _ln(sd, f"{p}.norm1"),
                "norm2": _ln(sd, f"{p}.norm2"),
                "attn": {
                    "qkv": _lin(sd, f"{p}.attn.qkv"),
                    "proj": _lin(sd, f"{p}.attn.proj"),
                    "rel_pos_table": _np(sd[f"{p}.attn.relative_position_bias_table"]),
                },
                "fc1": _lin(sd, f"{p}.mlp.fc1"),
                "fc2": _lin(sd, f"{p}.mlp.fc2"),
            }
    return params


def hf_swin_to_flax(sd, spec: SwinSpec, prefix: str = "") -> dict:
    """transformers SwinModel naming (plain conv patchify stem)."""
    g = lambda k: prefix + k  # noqa: E731
    params: dict = {
        "stem_proj": {
            "kernel": _np(sd[g("embeddings.patch_embeddings.projection.weight")]).transpose(2, 3, 1, 0),
            "bias": _np(sd[g("embeddings.patch_embeddings.projection.bias")]),
        },
        "patch_norm": _ln(sd, g("embeddings.norm")),
        "norm": _ln(sd, g("layernorm")),
    }
    for stage in range(len(spec.depths)):
        # HF stores downsample at the END of stage `stage` — our merge{stage+1}
        if f"{prefix}encoder.layers.{stage}.downsample.reduction.weight" in sd:
            params[f"merge{stage + 1}"] = {
                "norm": _ln(sd, g(f"encoder.layers.{stage}.downsample.norm")),
                "reduction": _lin(
                    sd, g(f"encoder.layers.{stage}.downsample.reduction"), bias=False
                ),
            }
        for b in range(spec.depths[stage]):
            p = g(f"encoder.layers.{stage}.blocks.{b}")
            q_w = _np(sd[f"{p}.attention.self.query.weight"]).T
            k_w = _np(sd[f"{p}.attention.self.key.weight"]).T
            v_w = _np(sd[f"{p}.attention.self.value.weight"]).T
            q_b = _np(sd[f"{p}.attention.self.query.bias"])
            k_b = _np(sd[f"{p}.attention.self.key.bias"])
            v_b = _np(sd[f"{p}.attention.self.value.bias"])
            params[f"stage{stage}_block{b}"] = {
                "norm1": _ln(sd, f"{p}.layernorm_before"),
                "norm2": _ln(sd, f"{p}.layernorm_after"),
                "attn": {
                    "qkv": {
                        "kernel": np.concatenate([q_w, k_w, v_w], axis=1),
                        "bias": np.concatenate([q_b, k_b, v_b]),
                    },
                    "proj": _lin(sd, f"{p}.attention.output.dense"),
                    "rel_pos_table": _np(
                        sd[f"{p}.attention.self.relative_position_bias_table"]
                    ),
                },
                "fc1": _lin(sd, f"{p}.intermediate.dense"),
                "fc2": _lin(sd, f"{p}.output.dense"),
            }
    return params
