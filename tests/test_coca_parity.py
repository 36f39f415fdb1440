"""CoCa attentional-pooler visual tower parity vs an independent torch replica
(open_clip CoCa semantics: ln_k on tokens, ln_q on queries, MHA with separate
q/k/v projections, ln_post after pooling, token-0 latent)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from atlaspatch_tpu.models.encoders.coca import CoCaSpec, CoCaVisual, open_clip_coca_to_flax
from atlaspatch_tpu.models.encoders.vit import ViTSpec


class TorchAttentionalPooler(tnn.Module):
    def __init__(self, d_model, context_dim, n_head, n_queries):
        super().__init__()
        self.query = tnn.Parameter(torch.randn(n_queries, d_model))
        self.attn = tnn.MultiheadAttention(
            d_model, n_head, kdim=context_dim, vdim=context_dim, batch_first=True
        )
        self.ln_q = tnn.LayerNorm(d_model, eps=1e-5)
        self.ln_k = tnn.LayerNorm(context_dim, eps=1e-5)

    def forward(self, x):
        x = self.ln_k(x)
        N = x.shape[0]
        q = self.ln_q(self.query)
        out = self.attn(q.unsqueeze(0).expand(N, -1, -1), x, x, need_weights=False)[0]
        return out


class TorchCoCaVisual(tnn.Module):
    """Minimal CLIP-ViT trunk (pre-LN) + CoCa pooling, matching open_clip."""

    def __init__(self, img, patch, width, depth, heads, d_model, n_queries, pool_heads):
        super().__init__()
        scale = width**-0.5
        self.conv1 = tnn.Conv2d(3, width, patch, stride=patch, bias=False)
        self.class_embedding = tnn.Parameter(scale * torch.randn(width))
        self.positional_embedding = tnn.Parameter(
            scale * torch.randn((img // patch) ** 2 + 1, width)
        )
        self.ln_pre = tnn.LayerNorm(width, eps=1e-5)
        self.blocks = tnn.ModuleList()
        for _ in range(depth):
            block = tnn.ModuleDict(
                dict(
                    ln_1=tnn.LayerNorm(width, eps=1e-5),
                    attn=tnn.MultiheadAttention(width, heads, batch_first=True),
                    ln_2=tnn.LayerNorm(width, eps=1e-5),
                    c_fc=tnn.Linear(width, width * 4),
                    c_proj=tnn.Linear(width * 4, width),
                )
            )
            self.blocks.append(block)
        self.attn_pool = TorchAttentionalPooler(d_model, width, pool_heads, n_queries)
        self.ln_post = tnn.LayerNorm(d_model, eps=1e-5)

    def forward(self, x):
        x = self.conv1(x).flatten(2).transpose(1, 2)  # (B, T, width)
        cls = self.class_embedding.expand(x.shape[0], 1, -1)
        x = torch.cat([cls, x], dim=1) + self.positional_embedding
        x = self.ln_pre(x)
        for b in self.blocks:
            h = b["ln_1"](x)
            h = b["attn"](h, h, h, need_weights=False)[0]
            x = x + h
            h = b["ln_2"](x)
            # open_clip uses exact GELU in CoCa configs
            h = b["c_proj"](F.gelu(b["c_fc"](h)))
            x = x + h
        pooled = self.attn_pool(x)
        pooled = self.ln_post(pooled)
        return pooled[:, 0]


def test_coca_parity(rng):
    torch.manual_seed(13)
    oracle = TorchCoCaVisual(
        img=32, patch=8, width=24, depth=2, heads=4, d_model=16, n_queries=5, pool_heads=2
    ).eval()

    trunk = ViTSpec(
        img_size=32,
        patch_size=8,
        dim=24,
        depth=2,
        heads=4,
        act="gelu",
        pre_ln=True,
        patch_bias=False,
        final_norm=False,
        pool="none",
        ln_eps=1e-5,
    )
    spec = CoCaSpec(trunk=trunk, n_queries=5, pooler_heads=2, output_dim=16)

    # Build an open_clip-style state dict from the oracle.
    sd = {}
    osd = oracle.state_dict()
    sd["visual.conv1.weight"] = osd["conv1.weight"]
    sd["visual.class_embedding"] = osd["class_embedding"]
    sd["visual.positional_embedding"] = osd["positional_embedding"]
    sd["visual.ln_pre.weight"] = osd["ln_pre.weight"]
    sd["visual.ln_pre.bias"] = osd["ln_pre.bias"]
    for i in range(2):
        p = f"visual.transformer.resblocks.{i}"
        sd[f"{p}.ln_1.weight"] = osd[f"blocks.{i}.ln_1.weight"]
        sd[f"{p}.ln_1.bias"] = osd[f"blocks.{i}.ln_1.bias"]
        sd[f"{p}.attn.in_proj_weight"] = osd[f"blocks.{i}.attn.in_proj_weight"]
        sd[f"{p}.attn.in_proj_bias"] = osd[f"blocks.{i}.attn.in_proj_bias"]
        sd[f"{p}.attn.out_proj.weight"] = osd[f"blocks.{i}.attn.out_proj.weight"]
        sd[f"{p}.attn.out_proj.bias"] = osd[f"blocks.{i}.attn.out_proj.bias"]
        sd[f"{p}.ln_2.weight"] = osd[f"blocks.{i}.ln_2.weight"]
        sd[f"{p}.ln_2.bias"] = osd[f"blocks.{i}.ln_2.bias"]
        sd[f"{p}.mlp.c_fc.weight"] = osd[f"blocks.{i}.c_fc.weight"]
        sd[f"{p}.mlp.c_fc.bias"] = osd[f"blocks.{i}.c_fc.bias"]
        sd[f"{p}.mlp.c_proj.weight"] = osd[f"blocks.{i}.c_proj.weight"]
        sd[f"{p}.mlp.c_proj.bias"] = osd[f"blocks.{i}.c_proj.bias"]
    # ln_post exists in the trunk converter's expectations; supply CoCa-level one
    sd["visual.ln_post.weight"] = osd["ln_post.weight"]
    sd["visual.ln_post.bias"] = osd["ln_post.bias"]
    for key in ("query", "ln_q.weight", "ln_q.bias", "ln_k.weight", "ln_k.bias"):
        sd[f"visual.attn_pool.{key}"] = osd[f"attn_pool.{key}"]
    for key in ("q_proj_weight", "k_proj_weight", "v_proj_weight", "in_proj_bias"):
        sd[f"visual.attn_pool.attn.{key}"] = osd[f"attn_pool.attn.{key}"]
    sd["visual.attn_pool.attn.out_proj.weight"] = osd["attn_pool.attn.out_proj.weight"]
    sd["visual.attn_pool.attn.out_proj.bias"] = osd["attn_pool.attn.out_proj.bias"]

    params = open_clip_coca_to_flax(sd, spec)
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    model = CoCaVisual(spec)
    params_j = jax.tree.map(lambda v: jnp.asarray(np.asarray(v)), params)
    got = np.asarray(model.apply({"params": params_j}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
