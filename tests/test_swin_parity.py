"""Swin transformer parity vs transformers SwinModel (shifted windows,
relative position bias, patch merging), plus timm-naming converter consistency."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from atlaspatch_tpu.models.encoders.swin import (
    SwinNet,
    SwinSpec,
    hf_swin_to_flax,
    timm_swin_to_flax,
)


@pytest.fixture(scope="module")
def oracle_and_spec():
    from transformers import SwinConfig, SwinModel

    torch.manual_seed(11)
    cfg = SwinConfig(
        image_size=56,
        patch_size=4,
        embed_dim=16,
        depths=[2, 2],
        num_heads=[2, 4],
        window_size=7,
        mlp_ratio=4.0,
    )
    oracle = SwinModel(cfg, add_pooling_layer=True).eval()
    spec = SwinSpec(
        img_size=56,
        patch_size=4,
        embed_dim=16,
        depths=(2, 2),
        heads=(2, 4),
        window=7,
        conv_stem=False,
    )
    return oracle, spec


def test_hf_swin_parity(rng, oracle_and_spec):
    oracle, spec = oracle_and_spec
    params = hf_swin_to_flax(oracle.state_dict(), spec)
    x = rng.standard_normal((2, 56, 56, 3)).astype(np.float32)
    with torch.no_grad():
        out = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        want = out.pooler_output.numpy()  # avg-pool of final-norm features
    model = SwinNet(spec)
    params_j = jax.tree.map(lambda v: jnp.asarray(np.asarray(v)), params)
    got = np.asarray(model.apply({"params": params_j}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_timm_naming_roundtrip(rng, oracle_and_spec):
    """timm-style keys (incl. the CHIEF old-layout downsample remap) convert to
    the same params as the HF path."""
    oracle, spec = oracle_and_spec
    hf_sd = oracle.state_dict()

    timm_sd = {
        "patch_embed.proj.weight": hf_sd["embeddings.patch_embeddings.projection.weight"],
        "patch_embed.proj.bias": hf_sd["embeddings.patch_embeddings.projection.bias"],
        "patch_embed.norm.weight": hf_sd["embeddings.norm.weight"],
        "patch_embed.norm.bias": hf_sd["embeddings.norm.bias"],
        "norm.weight": hf_sd["layernorm.weight"],
        "norm.bias": hf_sd["layernorm.bias"],
    }
    for stage, depth in enumerate(spec.depths):
        if f"encoder.layers.{stage}.downsample.reduction.weight" in hf_sd:
            # emit OLD layout (downsample at end of stage) to exercise the remap
            timm_sd[f"layers.{stage}.downsample.norm.weight"] = hf_sd[
                f"encoder.layers.{stage}.downsample.norm.weight"
            ]
            timm_sd[f"layers.{stage}.downsample.norm.bias"] = hf_sd[
                f"encoder.layers.{stage}.downsample.norm.bias"
            ]
            timm_sd[f"layers.{stage}.downsample.reduction.weight"] = hf_sd[
                f"encoder.layers.{stage}.downsample.reduction.weight"
            ]
        for b in range(depth):
            hp = f"encoder.layers.{stage}.blocks.{b}"
            tp = f"layers.{stage}.blocks.{b}"
            timm_sd[f"{tp}.norm1.weight"] = hf_sd[f"{hp}.layernorm_before.weight"]
            timm_sd[f"{tp}.norm1.bias"] = hf_sd[f"{hp}.layernorm_before.bias"]
            timm_sd[f"{tp}.norm2.weight"] = hf_sd[f"{hp}.layernorm_after.weight"]
            timm_sd[f"{tp}.norm2.bias"] = hf_sd[f"{hp}.layernorm_after.bias"]
            timm_sd[f"{tp}.attn.qkv.weight"] = torch.cat(
                [
                    hf_sd[f"{hp}.attention.self.query.weight"],
                    hf_sd[f"{hp}.attention.self.key.weight"],
                    hf_sd[f"{hp}.attention.self.value.weight"],
                ]
            )
            timm_sd[f"{tp}.attn.qkv.bias"] = torch.cat(
                [
                    hf_sd[f"{hp}.attention.self.query.bias"],
                    hf_sd[f"{hp}.attention.self.key.bias"],
                    hf_sd[f"{hp}.attention.self.value.bias"],
                ]
            )
            timm_sd[f"{tp}.attn.proj.weight"] = hf_sd[f"{hp}.attention.output.dense.weight"]
            timm_sd[f"{tp}.attn.proj.bias"] = hf_sd[f"{hp}.attention.output.dense.bias"]
            timm_sd[f"{tp}.attn.relative_position_bias_table"] = hf_sd[
                f"{hp}.attention.self.relative_position_bias_table"
            ]
            timm_sd[f"{tp}.mlp.fc1.weight"] = hf_sd[f"{hp}.intermediate.dense.weight"]
            timm_sd[f"{tp}.mlp.fc1.bias"] = hf_sd[f"{hp}.intermediate.dense.bias"]
            timm_sd[f"{tp}.mlp.fc2.weight"] = hf_sd[f"{hp}.output.dense.weight"]
            timm_sd[f"{tp}.mlp.fc2.bias"] = hf_sd[f"{hp}.output.dense.bias"]

    params_a = hf_swin_to_flax(hf_sd, spec)
    params_b = timm_swin_to_flax(timm_sd, spec)
    flat_a = jax.tree_util.tree_leaves_with_path(params_a)
    flat_b = dict(
        (jax.tree_util.keystr(p), v) for p, v in jax.tree_util.tree_leaves_with_path(params_b)
    )
    assert len(flat_a) == len(flat_b)
    for path, val in flat_a:
        np.testing.assert_array_equal(val, flat_b[jax.tree_util.keystr(path)], err_msg=str(path))


def test_conv_stem_shapes(rng):
    spec = SwinSpec(img_size=56, embed_dim=16, depths=(1, 1), heads=(2, 4), conv_stem=True)
    model = SwinNet(spec)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 56, 56, 3)))["params"]
    out = model.apply({"params": params}, jnp.zeros((2, 56, 56, 3)))
    assert out.shape == (2, 32)
    assert params["stem_conv0"]["kernel"].shape == (3, 3, 3, 2)
    assert params["stem_proj"]["kernel"].shape == (1, 1, 4, 16)
