"""Numerical parity of the unified Flax ViT against transformers torch oracles
(random weights, tiny topology-identical configs) for each source family:
plain ViT, DINOv2 (+LayerScale, +SwiGLU), CLIP vision tower (+projection),
SigLIP (+MAP attention-pool head), and the timm naming scheme.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from atlaspatch_tpu.models.encoders.convert import (
    hf_clip_to_flax,
    hf_dinov2_to_flax,
    hf_siglip_to_flax,
    hf_vit_to_flax,
    timm_vit_to_flax,
)
from atlaspatch_tpu.models.encoders.vit import ViT, ViTSpec


def _run_flax(spec, params, x_nhwc):
    import jax

    model = ViT(spec)
    params = jax.tree.map(lambda v: jnp.asarray(np.asarray(v)), params)
    return np.asarray(model.apply({"params": params}, jnp.asarray(x_nhwc)))


def _rand_images(rng, n, size):
    return rng.standard_normal((n, size, size, 3)).astype(np.float32)


def test_hf_vit_parity(rng):
    from transformers import ViTConfig, ViTModel

    torch.manual_seed(0)
    cfg = ViTConfig(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        image_size=32,
        patch_size=8,
    )
    oracle = ViTModel(cfg, add_pooling_layer=False).eval()
    spec = ViTSpec(
        img_size=32, patch_size=8, dim=32, depth=2, heads=4, mlp_hidden=64, ln_eps=1e-12,
        pool="cls",
    )
    params = hf_vit_to_flax(oracle.state_dict(), spec)
    x = _rand_images(rng, 2, 32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2))).last_hidden_state[:, 0].numpy()
    got = _run_flax(spec, params, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("swiglu", [False, True])
def test_hf_dinov2_parity(rng, swiglu):
    from transformers import Dinov2Config, Dinov2Model

    torch.manual_seed(1)
    cfg = Dinov2Config(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        mlp_ratio=4,
        image_size=32,
        patch_size=8,
        use_swiglu_ffn=swiglu,
    )
    oracle = Dinov2Model(cfg).eval()
    hidden = (int(32 * 4 * 2 / 3) + 7) // 8 * 8 if swiglu else 128
    spec = ViTSpec(
        img_size=32,
        patch_size=8,
        dim=32,
        depth=2,
        heads=4,
        mlp_hidden=hidden,
        layerscale=True,
        swiglu=swiglu,
        act="silu" if swiglu else "gelu",
        ln_eps=1e-6,
        pool="cls",
    )
    params = hf_dinov2_to_flax(oracle.state_dict(), spec)
    x = _rand_images(rng, 2, 32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2))).last_hidden_state[:, 0].numpy()
    got = _run_flax(spec, params, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_hf_clip_parity(rng):
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    torch.manual_seed(2)
    cfg = CLIPVisionConfig(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        image_size=32,
        patch_size=8,
        projection_dim=16,
        hidden_act="quick_gelu",
    )
    oracle = CLIPVisionModelWithProjection(cfg).eval()
    spec = ViTSpec(
        img_size=32,
        patch_size=8,
        dim=32,
        depth=2,
        heads=4,
        mlp_hidden=64,
        act="quick_gelu",
        pre_ln=True,
        patch_bias=False,
        proj_dim=16,
        ln_eps=1e-5,
        pool="cls",
    )
    params = hf_clip_to_flax(oracle.state_dict(), spec)
    x = _rand_images(rng, 2, 32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2))).image_embeds.numpy()
    got = _run_flax(spec, params, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_hf_siglip_parity(rng):
    from transformers import SiglipVisionConfig, SiglipVisionModel

    torch.manual_seed(3)
    cfg = SiglipVisionConfig(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        image_size=32,
        patch_size=8,
    )
    oracle = SiglipVisionModel(cfg).eval()
    spec = ViTSpec(
        img_size=32,
        patch_size=8,
        dim=32,
        depth=2,
        heads=4,
        mlp_hidden=64,
        act="gelu_tanh",
        class_token=False,
        pos_mode="patches",
        ln_eps=1e-6,
        pool="map",
    )
    params = hf_siglip_to_flax(oracle.state_dict(), spec)
    x = _rand_images(rng, 2, 32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2))).pooler_output.numpy()
    got = _run_flax(spec, params, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_timm_naming_equivalence(rng):
    """timm naming converts identically to the HF ViT path (same architecture)."""
    from transformers import ViTConfig, ViTModel

    torch.manual_seed(4)
    cfg = ViTConfig(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        image_size=32,
        patch_size=8,
    )
    oracle = ViTModel(cfg, add_pooling_layer=False).eval()
    sd = oracle.state_dict()

    timm_sd = {
        "cls_token": sd["embeddings.cls_token"],
        "pos_embed": sd["embeddings.position_embeddings"],
        "patch_embed.proj.weight": sd["embeddings.patch_embeddings.projection.weight"],
        "patch_embed.proj.bias": sd["embeddings.patch_embeddings.projection.bias"],
        "norm.weight": sd["layernorm.weight"],
        "norm.bias": sd["layernorm.bias"],
    }
    for i in range(2):
        p = f"encoder.layer.{i}"
        timm_sd[f"blocks.{i}.norm1.weight"] = sd[f"{p}.layernorm_before.weight"]
        timm_sd[f"blocks.{i}.norm1.bias"] = sd[f"{p}.layernorm_before.bias"]
        timm_sd[f"blocks.{i}.norm2.weight"] = sd[f"{p}.layernorm_after.weight"]
        timm_sd[f"blocks.{i}.norm2.bias"] = sd[f"{p}.layernorm_after.bias"]
        timm_sd[f"blocks.{i}.attn.qkv.weight"] = torch.cat(
            [
                sd[f"{p}.attention.attention.query.weight"],
                sd[f"{p}.attention.attention.key.weight"],
                sd[f"{p}.attention.attention.value.weight"],
            ]
        )
        timm_sd[f"blocks.{i}.attn.qkv.bias"] = torch.cat(
            [
                sd[f"{p}.attention.attention.query.bias"],
                sd[f"{p}.attention.attention.key.bias"],
                sd[f"{p}.attention.attention.value.bias"],
            ]
        )
        timm_sd[f"blocks.{i}.attn.proj.weight"] = sd[f"{p}.attention.output.dense.weight"]
        timm_sd[f"blocks.{i}.attn.proj.bias"] = sd[f"{p}.attention.output.dense.bias"]
        timm_sd[f"blocks.{i}.mlp.fc1.weight"] = sd[f"{p}.intermediate.dense.weight"]
        timm_sd[f"blocks.{i}.mlp.fc1.bias"] = sd[f"{p}.intermediate.dense.bias"]
        timm_sd[f"blocks.{i}.mlp.fc2.weight"] = sd[f"{p}.output.dense.weight"]
        timm_sd[f"blocks.{i}.mlp.fc2.bias"] = sd[f"{p}.output.dense.bias"]

    spec = ViTSpec(
        img_size=32, patch_size=8, dim=32, depth=2, heads=4, mlp_hidden=64, ln_eps=1e-12
    )
    params_hf = hf_vit_to_flax(sd, spec)
    params_timm = timm_vit_to_flax(timm_sd, spec)
    x = _rand_images(rng, 1, 32)
    np.testing.assert_allclose(
        _run_flax(spec, params_hf, x), _run_flax(spec, params_timm, x), rtol=1e-6, atol=1e-6
    )


def test_gelu_tanh_serving_flag(monkeypatch):
    """ATLASPATCH_GELU_TANH=1 swaps the exact erf GELU for the tanh
    approximation at trace time (opt-in serving mode, docs/PERF.md):
    outputs must differ from the exact path, but only by approximation
    error — and specs that already name a non-erf activation are
    unaffected."""
    import jax

    spec = ViTSpec(img_size=32, patch_size=16, dim=64, depth=2, heads=4)
    model = ViT(spec)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    monkeypatch.delenv("ATLASPATCH_GELU_TANH", raising=False)
    exact = np.asarray(model.apply({"params": params}, x))
    monkeypatch.setenv("ATLASPATCH_GELU_TANH", "1")
    approx = np.asarray(model.apply({"params": params}, x))
    assert not np.array_equal(exact, approx)
    np.testing.assert_allclose(exact, approx, atol=5e-2)

    # silu spec: flag is a no-op
    spec_s = ViTSpec(img_size=32, patch_size=16, dim=64, depth=1, heads=4,
                     act="silu")
    model_s = ViT(spec_s)
    params_s = model_s.init(jax.random.PRNGKey(0), x)["params"]
    with_flag = np.asarray(model_s.apply({"params": params_s}, x))
    monkeypatch.delenv("ATLASPATCH_GELU_TANH")
    without = np.asarray(model_s.apply({"params": params_s}, x))
    np.testing.assert_array_equal(with_flag, without)

    # int8 serving mode defaults to tanh; ATLASPATCH_GELU_TANH=0 restores erf
    from atlaspatch_tpu.models.encoders.vit import _act

    v = jnp.float32(-2.0)
    exact = float(_act("gelu")(v))
    approx = float(_act("gelu_tanh")(v))
    assert exact != approx
    assert float(_act("gelu", quantized=True)(v)) == approx
    monkeypatch.setenv("ATLASPATCH_GELU_TANH", "0")
    assert float(_act("gelu", quantized=True)(v)) == exact
