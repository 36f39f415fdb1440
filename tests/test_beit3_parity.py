"""BEiT3 vision encoder (MUSK tower) parity vs an independent torch replica of
the torchscale multiway encoder's vision path (subln, fairseq position offset)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from atlaspatch_tpu.models.encoders.beit3 import Beit3Spec, Beit3Vision, musk_beit3_to_flax


class TorchBeit3Vision(tnn.Module):
    """torchscale BEiT3 vision path with multiway 'A' experts and subln."""

    def __init__(self, spec: Beit3Spec):
        super().__init__()
        self.spec = spec
        d = spec.dim
        self.proj = tnn.Conv2d(3, d, spec.patch_size, stride=spec.patch_size)
        self.cls_token = tnn.Parameter(torch.randn(1, 1, d) * 0.02)
        self.pos = tnn.Embedding(spec.tokens + 1 + 2, d)
        self.layers = tnn.ModuleList()
        for _ in range(spec.depth):
            self.layers.append(
                tnn.ModuleDict(
                    dict(
                        ln1=tnn.LayerNorm(d, eps=spec.ln_eps),
                        q=tnn.Linear(d, d),
                        k=tnn.Linear(d, d),
                        v=tnn.Linear(d, d),
                        inner_ln=tnn.LayerNorm(d, eps=spec.ln_eps),
                        out=tnn.Linear(d, d),
                        ln2=tnn.LayerNorm(d, eps=spec.ln_eps),
                        fc1=tnn.Linear(d, spec.ffn_dim),
                        ffn_ln=tnn.LayerNorm(spec.ffn_dim, eps=spec.ln_eps),
                        fc2=tnn.Linear(spec.ffn_dim, d),
                    )
                )
            )
        self.final_ln = tnn.LayerNorm(d, eps=spec.ln_eps)

    def forward(self, x):
        s = self.spec
        B = x.shape[0]
        h = self.proj(x).flatten(2).transpose(1, 2)
        h = torch.cat([self.cls_token.expand(B, -1, -1), h], dim=1)
        positions = torch.arange(2, h.shape[1] + 2)
        h = h + self.pos(positions)[None]
        heads = s.heads
        hd = s.dim // heads
        for layer in self.layers:
            r = layer["ln1"](h)
            q = layer["q"](r).view(B, -1, heads, hd).transpose(1, 2)
            k = layer["k"](r).view(B, -1, heads, hd).transpose(1, 2)
            v = layer["v"](r).view(B, -1, heads, hd).transpose(1, 2)
            attn = (q * hd**-0.5) @ k.transpose(-1, -2)
            attn = attn.softmax(dim=-1)
            ctx = (attn @ v).transpose(1, 2).reshape(B, -1, s.dim)
            ctx = layer["inner_ln"](ctx)
            h = h + layer["out"](ctx)
            r = layer["ln2"](h)
            r = layer["fc2"](layer["ffn_ln"](F.gelu(layer["fc1"](r))))
            h = h + r
        return self.final_ln(h)[:, 0]


def test_beit3_parity(rng):
    spec = Beit3Spec(img_size=32, patch_size=8, dim=32, depth=2, heads=4, ffn_dim=64)
    torch.manual_seed(17)
    oracle = TorchBeit3Vision(spec).eval()

    sd = {}
    osd = oracle.state_dict()
    sd["beit3.vision_embed.proj.weight"] = osd["proj.weight"]
    sd["beit3.vision_embed.proj.bias"] = osd["proj.bias"]
    sd["beit3.vision_embed.cls_token"] = osd["cls_token"]
    sd["beit3.encoder.embed_positions.A.weight"] = osd["pos.weight"]
    sd["beit3.encoder.layer_norm.A.weight"] = osd["final_ln.weight"]
    sd["beit3.encoder.layer_norm.A.bias"] = osd["final_ln.bias"]
    for i in range(2):
        q = f"beit3.encoder.layers.{i}"
        mapping = {
            f"{q}.self_attn_layer_norm.A": f"layers.{i}.ln1",
            f"{q}.self_attn.q_proj": f"layers.{i}.q",
            f"{q}.self_attn.k_proj": f"layers.{i}.k",
            f"{q}.self_attn.v_proj": f"layers.{i}.v",
            f"{q}.self_attn.inner_attn_ln": f"layers.{i}.inner_ln",
            f"{q}.self_attn.out_proj": f"layers.{i}.out",
            f"{q}.final_layer_norm.A": f"layers.{i}.ln2",
            f"{q}.ffn.A.fc1": f"layers.{i}.fc1",
            f"{q}.ffn.A.ffn_layernorm": f"layers.{i}.ffn_ln",
            f"{q}.ffn.A.fc2": f"layers.{i}.fc2",
        }
        for dst, src in mapping.items():
            sd[f"{dst}.weight"] = osd[f"{src}.weight"]
            sd[f"{dst}.bias"] = osd[f"{src}.bias"]

    params = musk_beit3_to_flax(sd, spec)
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    model = Beit3Vision(spec)
    params_j = jax.tree.map(lambda v: jnp.asarray(np.asarray(v)), params)
    got = np.asarray(model.apply({"params": params_j}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_musk_ms_aug_parity(rng):
    """ms_aug multi-scale TTA vs a torch replica of MUSK's MultiScaleForward:
    bicubic 2x upsample, 2x2 chessboard split, mean CLS per scale, concat."""
    from atlaspatch_tpu.models.encoders.beit3 import musk_ms_aug_apply

    spec = Beit3Spec(img_size=32, patch_size=8, dim=32, depth=2, heads=4, ffn_dim=64)
    torch.manual_seed(23)
    oracle = TorchBeit3Vision(spec).eval()

    osd = oracle.state_dict()
    sd = {
        "beit3.vision_embed.proj.weight": osd["proj.weight"],
        "beit3.vision_embed.proj.bias": osd["proj.bias"],
        "beit3.vision_embed.cls_token": osd["cls_token"],
        "beit3.encoder.embed_positions.A.weight": osd["pos.weight"],
        "beit3.encoder.layer_norm.A.weight": osd["final_ln.weight"],
        "beit3.encoder.layer_norm.A.bias": osd["final_ln.bias"],
    }
    for i in range(2):
        q = f"beit3.encoder.layers.{i}"
        mapping = {
            f"{q}.self_attn_layer_norm.A": f"layers.{i}.ln1",
            f"{q}.self_attn.q_proj": f"layers.{i}.q",
            f"{q}.self_attn.k_proj": f"layers.{i}.k",
            f"{q}.self_attn.v_proj": f"layers.{i}.v",
            f"{q}.self_attn.inner_attn_ln": f"layers.{i}.inner_ln",
            f"{q}.self_attn.out_proj": f"layers.{i}.out",
            f"{q}.final_layer_norm.A": f"layers.{i}.ln2",
            f"{q}.ffn.A.fc1": f"layers.{i}.fc1",
            f"{q}.ffn.A.ffn_layernorm": f"layers.{i}.ffn_ln",
            f"{q}.ffn.A.fc2": f"layers.{i}.fc2",
        }
        for dst, src in mapping.items():
            sd[f"{dst}.weight"] = osd[f"{src}.weight"]
            sd[f"{dst}.bias"] = osd[f"{src}.bias"]

    params = musk_beit3_to_flax(sd, spec)
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)

    # Torch oracle: MUSK utils.MultiScaleForward with scales (1, 2)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        cls1 = oracle(xt)
        up = F.interpolate(xt, size=(64, 64), mode="bicubic")
        crops = torch.cat(
            [up[:, :, i * 32 : (i + 1) * 32, j * 32 : (j + 1) * 32] for i in range(2) for j in range(2)],
            dim=0,
        )
        cls2 = oracle(crops).view(4, 2, -1).mean(dim=0)
        want = torch.cat([cls1, cls2], dim=-1).numpy()

    model = Beit3Vision(spec)
    params_j = jax.tree.map(lambda v: jnp.asarray(np.asarray(v)), params)
    got = np.asarray(musk_ms_aug_apply(model, params_j, jnp.asarray(x)))
    assert got.shape == (2, 64)  # 2 scales x dim
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-4)
