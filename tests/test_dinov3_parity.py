"""DINOv3 (axial-RoPE ViT) parity vs transformers DINOv3ViTModel."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from atlaspatch_tpu.models.encoders.convert import hf_dinov3_to_flax
from atlaspatch_tpu.models.encoders.vit import ViT, ViTSpec


@pytest.mark.parametrize("gated", [False, True])
def test_dinov3_parity(rng, gated):
    from transformers import DINOv3ViTConfig, DINOv3ViTModel

    torch.manual_seed(5)
    cfg = DINOv3ViTConfig(
        patch_size=8,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        image_size=32,
        num_register_tokens=3,
        use_gated_mlp=gated,
        layerscale_value=0.9,
    )
    oracle = DINOv3ViTModel(cfg).eval()
    spec = ViTSpec(
        img_size=32,
        patch_size=8,
        dim=32,
        depth=2,
        heads=4,
        mlp_hidden=64,
        layerscale=True,
        gated_mlp=gated,
        reg_tokens=3,
        pos_mode="rope",
        rope_theta=100.0,
        ln_eps=1e-5,
        pool="cls",
    )
    params = hf_dinov3_to_flax(oracle.state_dict(), spec)
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        out = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        want = out.pooler_output.numpy()
    model = ViT(spec)
    params_j = jax.tree.map(lambda v: jnp.asarray(np.asarray(v)), params)
    got = np.asarray(model.apply({"params": params_j}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
