"""BEiT3 (torchscale) vision encoder in Flax — the MUSK tower.

Covers `musk` (reference: atlas_patch/models/patch/musk.py:12-85 — BEiT3-large
at 384px, Inception normalization, 1024-d global image embedding). The
multiway transformer degenerates to the vision ("A") experts for image-only
input; sub-LayerNorm (torchscale `subln`) puts an extra LN after the attention
context and inside the FFN. Positions are fairseq-style with a 2-slot offset.

`musk_ms_aug_apply` reproduces the MUSK wrapper's ms_aug=True inference used
by the reference (musk.py:60-70): per scale s, bicubic-upsample to s·384
(torch semantics), chessboard-split into s² crops of 384, encode each crop,
average the CLS vectors over crops, and concatenate scales — 2048-d for the
default scales (1, 2). Note the reference module declares embedding_dim=1024
(musk.py:13) but its extract_batch stores the model's actual output width, so
the features written to H5 are 2048-d; we declare the true stored width.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from atlaspatch_tpu.models.encoders.convert import _np


@dataclass(frozen=True)
class Beit3Spec:
    img_size: int = 384
    patch_size: int = 16
    dim: int = 1024
    depth: int = 24
    heads: int = 16
    ffn_dim: int = 4096
    ln_eps: float = 1e-5
    final_norm: bool = True

    @property
    def tokens(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @property
    def embedding_dim(self) -> int:
        return self.dim


class Beit3Attention(nn.Module):
    spec: Beit3Spec

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = self.spec
        B, T, _ = x.shape
        head_dim = s.dim // s.heads
        q = nn.Dense(s.dim, name="q_proj")(x)
        k = nn.Dense(s.dim, name="k_proj")(x)
        v = nn.Dense(s.dim, name="v_proj")(x)

        def split(t):
            return t.reshape(B, T, s.heads, head_dim).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhqd,bhkd->bhqk", split(q) * head_dim**-0.5, split(k))
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, split(v))
        out = out.transpose(0, 2, 1, 3).reshape(B, T, s.dim)
        out = nn.LayerNorm(epsilon=s.ln_eps, name="inner_attn_ln")(out)  # subln
        return nn.Dense(s.dim, name="out_proj")(out)


class Beit3Block(nn.Module):
    spec: Beit3Spec

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = self.spec
        h = nn.LayerNorm(epsilon=s.ln_eps, name="ln1")(x)
        x = x + Beit3Attention(s, name="attn")(h)
        h = nn.LayerNorm(epsilon=s.ln_eps, name="ln2")(x)
        h = nn.Dense(s.ffn_dim, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.LayerNorm(epsilon=s.ln_eps, name="ffn_ln")(h)  # subln
        h = nn.Dense(s.dim, name="fc2")(h)
        return x + h


class Beit3Vision(nn.Module):
    spec: Beit3Spec

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """(B, S, S, 3) normalized → (B, dim) CLS embedding."""
        s = self.spec
        B = images.shape[0]
        x = nn.Conv(
            s.dim,
            kernel_size=(s.patch_size, s.patch_size),
            strides=(s.patch_size, s.patch_size),
            padding="VALID",
            name="patch_embed",
        )(images)
        x = x.reshape(B, -1, s.dim)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, s.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, s.dim)).astype(x.dtype), x], axis=1)

        # fairseq positional embedding: table has 2 reserved slots; token i uses
        # row i + 2.
        pos_table = self.param(
            "pos_embed", nn.initializers.normal(0.02), (s.tokens + 1 + 2, s.dim)
        )
        x = x + pos_table[2 : 2 + s.tokens + 1][None].astype(x.dtype)

        for i in range(s.depth):
            x = Beit3Block(s, name=f"blocks_{i}")(x)
        if s.final_norm:
            x = nn.LayerNorm(epsilon=s.ln_eps, name="norm")(x)
        return x[:, 0]


def musk_ms_aug_apply(model, params, images, scales: tuple[int, ...] = (1, 2)):
    """MUSK ms_aug=True forward (reference musk.py:60-70): multi-scale
    chessboard TTA over the vision tower, mean CLS per scale, scales
    concatenated. No output normalization (the reference passes
    out_norm=False). images: (B, S, S, 3) normalized pixels."""
    from atlaspatch_tpu.models.sam2.interp import interpolate_torch

    B, S = images.shape[0], images.shape[1]
    outs = []
    for s in scales:
        if s == 1:
            cls = model.apply({"params": params}, images)
        else:
            up = interpolate_torch(images, (S * s, S * s), "bicubic")
            # chessboard split: crop (i, j) at batch slot (i*s + j)*B + b
            crops = (
                up.reshape(B, s, S, s, S, -1)
                .transpose(1, 3, 0, 2, 4, 5)
                .reshape(s * s * B, S, S, -1)
            )
            cls = model.apply({"params": params}, crops)
            cls = cls.reshape(s * s, B, cls.shape[-1]).mean(axis=0)
        outs.append(cls)
    return jnp.concatenate(outs, axis=-1)


def musk_beit3_to_flax(sd, spec: Beit3Spec) -> dict:
    """MUSK/torchscale state dict → Flax params (vision 'A' experts).

    Naming: beit3.vision_embed.{proj,cls_token}, beit3.encoder.embed_positions.A,
    beit3.encoder.layers.N.{self_attn.*, self_attn_layer_norm.A,
    ffn.A.{fc1,fc2,ffn_layernorm}, final_layer_norm.A}, beit3.encoder.layer_norm.A.
    """

    np_ = _np  # shared torch->numpy helper (convert.py)

    def pick(*keys):
        for k in keys:
            if k in sd:
                return sd[k]
        raise KeyError(keys[0])

    def lin(*keys):
        w = pick(*[f"{k}.weight" for k in keys])
        out = {"kernel": np_(w).T}
        for k in keys:
            if f"{k}.bias" in sd:
                out["bias"] = np_(sd[f"{k}.bias"])
                break
        return out

    def ln(*keys):
        return {
            "scale": np_(pick(*[f"{k}.weight" for k in keys])),
            "bias": np_(pick(*[f"{k}.bias" for k in keys])),
        }

    p = "beit3."
    params: dict = {
        "patch_embed": {
            "kernel": np_(sd[f"{p}vision_embed.proj.weight"]).transpose(2, 3, 1, 0),
            "bias": np_(sd[f"{p}vision_embed.proj.bias"]),
        },
        "cls_token": np_(sd[f"{p}vision_embed.cls_token"]),
        "pos_embed": np_(
            pick(f"{p}encoder.embed_positions.A.weight", f"{p}encoder.embed_positions.weight")
        ),
    }
    if f"{p}encoder.layer_norm.A.weight" in sd or f"{p}encoder.layer_norm.weight" in sd:
        params["norm"] = ln(f"{p}encoder.layer_norm.A", f"{p}encoder.layer_norm")
    for i in range(spec.depth):
        q = f"{p}encoder.layers.{i}"
        params[f"blocks_{i}"] = {
            "ln1": ln(f"{q}.self_attn_layer_norm.A", f"{q}.self_attn_layer_norm"),
            "ln2": ln(f"{q}.final_layer_norm.A", f"{q}.final_layer_norm"),
            "attn": {
                "q_proj": lin(f"{q}.self_attn.q_proj.A", f"{q}.self_attn.q_proj"),
                "k_proj": lin(f"{q}.self_attn.k_proj.A", f"{q}.self_attn.k_proj"),
                "v_proj": lin(f"{q}.self_attn.v_proj.A", f"{q}.self_attn.v_proj"),
                "out_proj": lin(f"{q}.self_attn.out_proj.A", f"{q}.self_attn.out_proj"),
                "inner_attn_ln": ln(
                    f"{q}.self_attn.inner_attn_ln.A", f"{q}.self_attn.inner_attn_ln"
                ),
            },
            "fc1": lin(f"{q}.ffn.A.fc1", f"{q}.ffn.fc1"),
            "fc2": lin(f"{q}.ffn.A.fc2", f"{q}.ffn.fc2"),
            "ffn_ln": ln(f"{q}.ffn.A.ffn_layernorm", f"{q}.ffn.ffn_layernorm"),
        }
    return params
