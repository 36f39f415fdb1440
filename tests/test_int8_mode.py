"""W8A8 int8 serving mode: quantized layout, numerics vs float32, plumbing.

The int8 path exists for MXU throughput (int8 dots measured ~2x bf16 at
ViT-L MLP shapes on a v5e); these tests pin its correctness contract:
per-channel weight quantization round-trips within one step, features track
the f32 oracle closely, and non-ViT families fall back to bfloat16."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from atlaspatch_tpu.models.encoders.vit import (
    QUANT_LAYER_NAMES,
    ViT,
    ViTSpec,
    quantize_vit_params,
)
from atlaspatch_tpu.models.encoders.zoo import ENTRIES, build_extractor


def _leaf_paths(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _leaf_paths(v, prefix + (k,))
    else:
        yield prefix, tree


def test_quantize_roundtrip_error_bound():
    spec = ViTSpec(img_size=32, patch_size=16, dim=64, depth=2, heads=4)
    model = ViT(spec)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    qparams = quantize_vit_params(jax.tree.map(np.asarray, params))
    checked = 0
    for path, leaf in _leaf_paths(qparams):
        if path[-1] == "kernel_q":
            assert leaf.dtype == np.int8
            parent = qparams
            for p in path[:-1]:
                parent = parent[p]
            orig = params
            for p in path[:-1]:
                orig = orig[p]
            w = np.asarray(orig["kernel"], np.float32)
            deq = leaf.astype(np.float32) * parent["qscale"]
            # symmetric per-channel quantization: error bounded by scale/2
            assert (np.abs(deq - w) <= parent["qscale"] / 2 + 1e-7).all()
            checked += 1
    # every eligible block layer quantized: depth 2 x (qkv, proj, fc1, fc2)
    assert checked == 2 * 4


def test_quantizer_leaves_non_block_layers_alone():
    spec = ViTSpec(img_size=32, patch_size=16, dim=64, depth=1, heads=4,
                   pool="map", proj_dim=32)
    model = ViT(spec)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    qparams = quantize_vit_params(jax.tree.map(np.asarray, params))
    for path, leaf in _leaf_paths(qparams):
        if "kernel_q" in path[-1:]:
            assert any(p.startswith("blocks_") for p in path), path
    # head (MAP pooling) and projection keep plain kernels
    assert "kernel" in qparams["head"]["mlp"]["fc1"]
    assert "kernel" in qparams["proj"]


def test_int8_layout_matches_model_init():
    """quantize_vit_params output must have exactly the tree structure the
    quantized model expects (so converted checkpoints load cleanly)."""
    spec = ViTSpec(img_size=32, patch_size=16, dim=64, depth=2, heads=4)
    f32_params = ViT(spec).init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    from dataclasses import replace

    qmodel = ViT(replace(spec, quant_int8=True))
    qinit = qmodel.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    qconv = quantize_vit_params(jax.tree.map(np.asarray, f32_params))
    paths_init = {p for p, _ in _leaf_paths(qinit)}
    paths_conv = {p for p, _ in _leaf_paths(qconv)}
    assert paths_init == paths_conv
    # and the quantized model applies the converted tree
    out = qmodel.apply({"params": qconv}, jnp.zeros((1, 32, 32, 3), jnp.bfloat16))
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_int8_features_track_float32(monkeypatch):
    monkeypatch.setenv("ATLASPATCH_ALLOW_RANDOM_WEIGHTS", "1")
    entry = ENTRIES["vit_b_16"]
    cpu = jax.devices("cpu")[0]
    rng = np.random.default_rng(0)
    patches = [rng.integers(0, 256, (256, 256, 3), dtype=np.uint8) for _ in range(4)]

    f32 = build_extractor(entry, device=cpu, compute_dtype="float32", max_batch=4)
    feats_f32 = f32.extract_batch(patches, batch_size=4)
    i8 = build_extractor(entry, device=cpu, compute_dtype="int8", max_batch=4)
    kinds = {str(a.dtype) for a in jax.tree.leaves(i8.params)}
    assert "int8" in kinds
    feats_i8 = i8.extract_batch(patches, batch_size=4)
    assert feats_i8.dtype == np.float32

    num = (feats_f32 * feats_i8).sum(axis=1)
    den = np.linalg.norm(feats_f32, axis=1) * np.linalg.norm(feats_i8, axis=1)
    cos = num / den
    assert (cos > 0.98).all(), cos
    f32.cleanup()
    i8.cleanup()


def test_int8_falls_back_for_non_vit(monkeypatch, caplog):
    monkeypatch.setenv("ATLASPATCH_ALLOW_RANDOM_WEIGHTS", "1")
    entry = ENTRIES["resnet18"]
    ext = build_extractor(entry, device=jax.devices("cpu")[0], compute_dtype="int8", max_batch=2)
    assert ext.compute_dtype == "bfloat16"
    kinds = {str(a.dtype) for a in jax.tree.leaves(ext.params)}
    assert "int8" not in kinds
    ext.cleanup()


def test_registry_accepts_int8_dtype(monkeypatch):
    monkeypatch.setenv("ATLASPATCH_ALLOW_RANDOM_WEIGHTS", "1")
    from atlaspatch_tpu.models.encoders.zoo import build_default_registry
    from atlaspatch_tpu.services.feature_embedding import resolve_feature_dtype

    assert resolve_feature_dtype("tpu", "int8") == "int8"
    assert resolve_feature_dtype("cpu", "int8") == "float32"
    registry = build_default_registry(device="cpu", dtype="int8")
    assert "vit_b_16" in registry.available()
