"""CoCa visual tower (open_clip) in Flax: ViT trunk + attentional pooler.

Covers `omiclip` (open_clip coca_ViT-L-14 — reference: atlas_patch/models/
patch/omiclip.py:12-66, encode_image → 768). The tower is a CLIP-style ViT
(pre-LN, class token) whose final representation is produced by an
AttentionalPooler: learned query tokens cross-attend the LayerNormed token
sequence through a MultiheadAttention with separate q/k/v projections;
`ln_post` then normalizes the pooled queries and the first query is the image
latent (token pooling), optionally projected.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from atlaspatch_tpu.models.encoders.convert import _np

from atlaspatch_tpu.models.encoders.vit import ViT, ViTSpec
from atlaspatch_tpu.models.encoders import convert as C


@dataclass(frozen=True)
class CoCaSpec:
    trunk: ViTSpec
    n_queries: int = 256
    pooler_heads: int = 8
    output_dim: int = 768
    has_proj: bool = False  # proj after pooled token


def conch_v1_spec() -> CoCaSpec:
    """CONCH v1 (reference: conch.py:20-65): CoCa with a timm ViT-B/16 trunk and
    a single-query contrastive attentional pooler → 512-d (proj_contrast=False,
    normalize=False). Naming verified lazily at checkpoint-load time."""
    trunk = ViTSpec(
        img_size=224,
        patch_size=16,
        dim=768,
        depth=12,
        heads=12,
        act="gelu",
        final_norm=True,  # timm trunk keeps its final norm
        pool="none",
        ln_eps=1e-5,
    )
    return CoCaSpec(trunk=trunk, n_queries=1, pooler_heads=8, output_dim=512)


def coca_vit_l14_spec() -> CoCaSpec:
    trunk = ViTSpec(
        img_size=224,
        patch_size=14,
        dim=1024,
        depth=24,
        heads=16,
        act="gelu",
        pre_ln=True,
        patch_bias=False,
        final_norm=False,  # ln_post applies after pooling in CoCa
        pool="none",
        ln_eps=1e-5,
    )
    return CoCaSpec(trunk=trunk, n_queries=256, pooler_heads=8, output_dim=768)


class AttentionalPooler(nn.Module):
    d_model: int
    context_dim: int
    heads: int
    n_queries: int
    ln_eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, T, context_dim) tokens → (B, n_queries, d_model)."""
        B = x.shape[0]
        query = self.param(
            "query", nn.initializers.normal(0.02), (self.n_queries, self.d_model)
        )
        x = nn.LayerNorm(epsilon=self.ln_eps, name="ln_k")(x)
        q_in = nn.LayerNorm(epsilon=self.ln_eps, name="ln_q")(query)
        q_in = jnp.broadcast_to(q_in[None], (B, self.n_queries, self.d_model)).astype(x.dtype)

        head_dim = self.d_model // self.heads
        q = nn.Dense(self.d_model, name="q_proj")(q_in)
        k = nn.Dense(self.d_model, name="k_proj")(x)
        v = nn.Dense(self.d_model, name="v_proj")(x)

        def split(t):
            return t.reshape(B, -1, self.heads, head_dim).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k)) * (head_dim**-0.5)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, split(v))
        out = out.transpose(0, 2, 1, 3).reshape(B, self.n_queries, self.d_model)
        return nn.Dense(self.d_model, name="out_proj")(out)


class CoCaVisual(nn.Module):
    spec: CoCaSpec

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        s = self.spec
        tokens = ViT(s.trunk, name="trunk")(images)  # (B, T, width), no final norm
        pooled = AttentionalPooler(
            d_model=s.output_dim,
            context_dim=s.trunk.dim,
            heads=s.pooler_heads,
            n_queries=s.n_queries,
            ln_eps=s.trunk.ln_eps,
            name="attn_pool",
        )(tokens)
        pooled = nn.LayerNorm(epsilon=s.trunk.ln_eps, name="ln_post")(pooled)
        latent = pooled[:, 0]
        if s.has_proj:
            latent = nn.Dense(s.output_dim, use_bias=False, name="proj")(latent)
        return latent


def conch_v1_to_flax(sd, spec: CoCaSpec) -> dict:
    """CONCH v1 checkpoint → Flax params: timm ViT trunk under visual.trunk.*,
    contrastive pooler under visual.attn_pool_contrast.*, ln under
    visual.ln_contrast.*."""
    trunk_sd = {k[len("visual.trunk."):]: v for k, v in sd.items() if k.startswith("visual.trunk.")}
    trunk = C.timm_vit_to_flax(trunk_sd, spec.trunk)

    np_ = _np  # shared torch->numpy helper (convert.py)

    g = lambda k: "visual.attn_pool_contrast." + k  # noqa: E731
    d = spec.output_dim
    in_bias = np_(sd[g("attn.in_proj_bias")])
    return {
        "trunk": trunk,
        "attn_pool": {
            "query": np_(sd[g("query")]),
            "ln_q": {"scale": np_(sd[g("ln_q.weight")]), "bias": np_(sd[g("ln_q.bias")])},
            "ln_k": {"scale": np_(sd[g("ln_k.weight")]), "bias": np_(sd[g("ln_k.bias")])},
            "q_proj": {"kernel": np_(sd[g("attn.q_proj_weight")]).T, "bias": in_bias[:d]},
            "k_proj": {"kernel": np_(sd[g("attn.k_proj_weight")]).T, "bias": in_bias[d : 2 * d]},
            "v_proj": {"kernel": np_(sd[g("attn.v_proj_weight")]).T, "bias": in_bias[2 * d :]},
            "out_proj": {
                "kernel": np_(sd[g("attn.out_proj.weight")]).T,
                "bias": np_(sd[g("attn.out_proj.bias")]),
            },
        },
        "ln_post": {
            "scale": np_(sd["visual.ln_contrast.weight"]),
            "bias": np_(sd["visual.ln_contrast.bias"]),
        },
    }


def open_clip_coca_to_flax(sd, spec: CoCaSpec, prefix: str = "visual.") -> dict:
    """open_clip CoCa visual state dict → Flax params.

    Pooler MHA with kdim != embed_dim stores separate q/k/v projection weights
    (torch MultiheadAttention q_proj_weight / k_proj_weight / v_proj_weight +
    packed in_proj_bias).
    """
    trunk = C.open_clip_vit_to_flax(sd, spec.trunk, prefix=prefix)
    trunk.pop("norm", None)  # ln_post handled at the CoCa level
    proj = trunk.pop("proj", None)

    np_ = _np  # shared torch->numpy helper (convert.py)

    g = lambda k: prefix + "attn_pool." + k  # noqa: E731
    d = spec.output_dim
    in_bias = np_(sd[g("attn.in_proj_bias")])
    params: dict = {
        "trunk": trunk,
        "attn_pool": {
            "query": np_(sd[g("query")]),
            "ln_q": {"scale": np_(sd[g("ln_q.weight")]), "bias": np_(sd[g("ln_q.bias")])},
            "ln_k": {"scale": np_(sd[g("ln_k.weight")]), "bias": np_(sd[g("ln_k.bias")])},
            "q_proj": {"kernel": np_(sd[g("attn.q_proj_weight")]).T, "bias": in_bias[:d]},
            "k_proj": {"kernel": np_(sd[g("attn.k_proj_weight")]).T, "bias": in_bias[d : 2 * d]},
            "v_proj": {"kernel": np_(sd[g("attn.v_proj_weight")]).T, "bias": in_bias[2 * d :]},
            "out_proj": {
                "kernel": np_(sd[g("attn.out_proj.weight")]).T,
                "bias": np_(sd[g("attn.out_proj.bias")]),
            },
        },
        "ln_post": {
            "scale": np_(sd[f"{prefix}ln_post.weight"]),
            "bias": np_(sd[f"{prefix}ln_post.bias"]),
        },
    }
    if spec.has_proj and proj is not None:
        params["proj"] = proj
    return params
