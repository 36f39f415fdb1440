"""Encoder zoo registry sanity: every reference name present, dims correct,
models constructible, small towers initialize and run."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from atlaspatch_tpu.models.encoders.zoo import ENTRIES, ZOO_STATUS, _model_for, build_default_registry

# The 66 names the reference registers (SURVEY.md §2 rows 20-44).
REFERENCE_NAMES = {
    "resnet18", "resnet34", "resnet50", "resnet101", "resnet152",
    "convnext_tiny", "convnext_small", "convnext_base", "convnext_large",
    "vit_b_16", "vit_b_32", "vit_l_16", "vit_l_32", "vit_h_14",
    "dinov2_small", "dinov2_base", "dinov2_large", "dinov2_giant",
    "dinov3_vits16", "dinov3_vits16_plus", "dinov3_vitb16", "dinov3_vitl16",
    "dinov3_vitl16_sat", "dinov3_vith16_plus", "dinov3_vit7b16", "dinov3_vit7b16_sat",
    "clip_rn50", "clip_rn101", "clip_rn50x4", "clip_rn50x16", "clip_rn50x64",
    "clip_vit_b_32", "clip_vit_b_16", "clip_vit_l_14", "clip_vit_l_14_336",
    "conch_v1", "conch_v15", "omiclip",
    "quilt_b_32", "quilt_b_16", "quilt_b_16_pmb",
    "uni_v1", "uni_v2",
    "lunit_resnet50_bt", "lunit_resnet50_swav", "lunit_resnet50_mocov2",
    "lunit_vit_small_patch16_dino", "lunit_vit_small_patch8_dino",
    "plip", "medsiglip", "musk", "openmidnight", "pathorchestra",
    "h_optimus_0", "h_optimus_1", "h0_mini",
    "hibou_b", "hibou_l", "biomedclip",
    "phikon_v1", "phikon_v2", "virchow_v1", "virchow_v2",
    "prov_gigapath", "midnight", "chief-ctranspath",
}

REFERENCE_DIMS = {
    "resnet18": 512, "resnet50": 2048, "convnext_tiny": 768, "convnext_large": 1536,
    "vit_b_16": 768, "vit_h_14": 1280, "dinov2_small": 384, "dinov2_giant": 1536,
    "dinov3_vit7b16": 4096, "clip_rn50": 1024, "clip_rn50x4": 640,
    "clip_vit_b_16": 512, "clip_vit_l_14": 768, "conch_v1": 512, "conch_v15": 768,
    "omiclip": 768, "quilt_b_16": 512, "uni_v1": 1024, "uni_v2": 1536,
    "lunit_resnet50_bt": 2048, "lunit_vit_small_patch16_dino": 384,
    "plip": 512, "medsiglip": 1152, "musk": 2048, "openmidnight": 1536,
    "pathorchestra": 1024, "h_optimus_0": 1536, "h0_mini": 1536,
    "hibou_b": 768, "hibou_l": 1024, "biomedclip": 512, "phikon_v1": 768,
    "phikon_v2": 1024, "virchow_v1": 2560, "virchow_v2": 2560,
    "prov_gigapath": 1536, "midnight": 3072, "chief-ctranspath": 768,
}


def test_all_reference_names_registered():
    assert set(ENTRIES.keys()) == REFERENCE_NAMES
    assert len(ENTRIES) == 66
    assert ZOO_STATUS["pending"] == []


def test_embedding_dims():
    for name, dim in REFERENCE_DIMS.items():
        assert ENTRIES[name].embedding_dim == dim, name


def test_all_models_constructible():
    for name, entry in ENTRIES.items():
        model = _model_for(entry)
        assert model is not None, name


def test_registry_builds_and_lists():
    registry = build_default_registry(device="cpu")
    assert sorted(registry.available()) == sorted(REFERENCE_NAMES)


@pytest.mark.parametrize("name", ["resnet18", "lunit_vit_small_patch16_dino", "chief-ctranspath"])
def test_small_towers_forward(name, monkeypatch):
    """Init + forward for small towers (random weights) produces correct dims."""
    monkeypatch.setenv("ATLASPATCH_ALLOW_RANDOM_WEIGHTS", "1")
    from atlaspatch_tpu.models.encoders.zoo import build_extractor

    entry = ENTRIES[name]
    ext = build_extractor(entry, device=jax.devices("cpu")[0], max_batch=2)
    rng = np.random.default_rng(0)
    patches = [rng.integers(0, 256, (64, 64, 3), dtype=np.uint8) for _ in range(2)]
    feats = ext.extract_batch(patches, batch_size=2)
    assert feats.shape == (2, entry.embedding_dim)
    assert np.isfinite(feats).all()
    ext.cleanup()


@pytest.mark.parametrize("parallel", ["data", "tensor"])
def test_registry_mesh_parallel(parallel, monkeypatch):
    """build_default_registry(mesh=...) shards extraction over the virtual
    mesh; features match the single-device build bit-for-bit on CPU."""
    monkeypatch.setenv("ATLASPATCH_ALLOW_RANDOM_WEIGHTS", "1")
    from jax.sharding import Mesh

    name = "lunit_vit_small_patch16_dino" if parallel == "tensor" else "resnet18"
    entry = ENTRIES[name]
    rng = np.random.default_rng(3)
    patches = [rng.integers(0, 256, (64, 64, 3), dtype=np.uint8) for _ in range(5)]

    single = build_default_registry(device="cpu").create(name)
    want = single.extract_batch(patches, batch_size=4)
    single.cleanup()

    n = 4
    shape = (1, n) if parallel == "tensor" else (n, 1)
    mesh = Mesh(np.asarray(jax.devices()[:n]).reshape(shape), axis_names=("data", "model"))
    sharded = build_default_registry(
        device="cpu", mesh=mesh, tensor_parallel=parallel == "tensor"
    ).create(name)
    got = sharded.extract_batch(patches, batch_size=4)
    sharded.cleanup()

    assert got.shape == (5, entry.embedding_dim)
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5)


def test_npz_weights_roundtrip(tmp_path, monkeypatch):
    """convert_weights flatten/unflatten + the .npz loading path: an archive in
    ATLASPATCH_WEIGHTS_DIR is loaded (not random-initialized) and produces the
    same features as applying the saved params directly."""
    from atlaspatch_tpu.models.encoders.zoo import _model_for, build_extractor
    from atlaspatch_tpu.tools.convert_weights import _flatten, unflatten
    import jax.numpy as jnp

    entry = ENTRIES["resnet18"]
    model = _model_for(entry)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(42), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )["params"]

    flat = _flatten(jax.tree.map(np.asarray, params))
    np.savez(tmp_path / "resnet18.npz", **flat)
    restored = unflatten(dict(np.load(tmp_path / "resnet18.npz")))
    chex_equal = jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)), params, restored
    )
    assert all(jax.tree.leaves(chex_equal))

    monkeypatch.setenv("ATLASPATCH_WEIGHTS_DIR", str(tmp_path))
    monkeypatch.delenv("ATLASPATCH_ALLOW_RANDOM_WEIGHTS", raising=False)
    ext = build_extractor(entry, device=jax.devices("cpu")[0], max_batch=2)
    rng = np.random.default_rng(1)
    patches = [rng.integers(0, 256, (64, 64, 3), dtype=np.uint8) for _ in range(2)]
    feats = ext.extract_batch(patches, batch_size=2)
    assert feats.shape == (2, entry.embedding_dim)

    # oracle: preprocess on host exactly as the engine does, apply saved params
    x = np.stack([entry.preprocess.apply_host(p) for p in patches])
    xn = (x.astype(np.float32) / 255.0 - np.asarray(entry.preprocess.mean)) / np.asarray(
        entry.preprocess.std
    )
    want = np.asarray(model.apply({"params": params}, jnp.asarray(xn, jnp.float32)))
    np.testing.assert_allclose(feats, want, rtol=1e-5, atol=1e-5)
    ext.cleanup()


def test_bfloat16_params_reach_the_matmuls(monkeypatch):
    """compute_dtype=bfloat16 must store params as bf16 on device: Flax
    modules default to dtype promotion, so f32 params would silently upcast
    every matmul back to f32 (measured 19-46% slower on the TPU MXU). The
    float32 build must stay exactly float32."""
    monkeypatch.setenv("ATLASPATCH_ALLOW_RANDOM_WEIGHTS", "1")
    from atlaspatch_tpu.models.encoders.zoo import build_extractor

    entry = ENTRIES["resnet18"]
    cpu = jax.devices("cpu")[0]
    rng = np.random.default_rng(0)
    patches = [rng.integers(0, 256, (224, 224, 3), dtype=np.uint8) for _ in range(2)]

    bf16 = build_extractor(entry, device=cpu, compute_dtype="bfloat16", max_batch=2)
    dtypes = {str(a.dtype) for a in jax.tree.leaves(bf16.params)}
    assert "bfloat16" in dtypes and "float32" not in dtypes
    feats_bf16 = bf16.extract_batch(patches, batch_size=2)
    assert feats_bf16.dtype == np.float32  # output contract stays f32

    f32 = build_extractor(entry, device=cpu, compute_dtype="float32", max_batch=2)
    assert {str(a.dtype) for a in jax.tree.leaves(f32.params)} == {"float32"}
    feats_f32 = f32.extract_batch(patches, batch_size=2)

    # bf16 numerics stay close to the f32 oracle (cosine per feature row)
    num = (feats_f32 * feats_bf16).sum(axis=1)
    den = np.linalg.norm(feats_f32, axis=1) * np.linalg.norm(feats_bf16, axis=1)
    assert (num / den > 0.995).all()
    bf16.cleanup()
    f32.cleanup()


def test_reference_pinned_preprocessing():
    """Models whose transforms the reference HARDCODES (rather than resolving
    from a downloaded timm/HF config) must match them field-for-field:
    geometry (resize/crop), interpolation, and normalization. References:
    chief_ctranspath.py:24-31, gigapath.py:20-24, hoptimus.py:15-31,
    midnight.py:19-23, musk.py:21-25, openmidnight.py:15-28,
    pathorchestra.py:52-58. torchvision's Resize default is bilinear;
    `mode="square"` here reproduces Resize((S,S))/Resize(S) on the pipeline's
    square patch inputs."""
    IMNET = (0.485, 0.456, 0.406)
    HOPT = (0.707223, 0.578729, 0.703617)
    HALF = (0.5, 0.5, 0.5)
    # name -> (crop, resize, mode, interpolation, mean)
    pinned = {
        "chief-ctranspath": (224, 224, "square", "bilinear", IMNET),
        "prov_gigapath": (224, 256, "shortest", "bicubic", IMNET),
        "h_optimus_0": (224, 224, "square", "bilinear", HOPT),
        "h_optimus_1": (224, 224, "square", "bilinear", HOPT),
        "midnight": (224, 224, "square", "bilinear", HALF),
        "musk": (384, 384, "shortest", "bicubic", HALF),
        "openmidnight": (224, 224, "square", "bilinear", IMNET),
        "pathorchestra": (224, 224, "square", "bilinear", IMNET),
    }
    for name, (crop, resize, mode, interp, mean) in pinned.items():
        p = ENTRIES[name].preprocess
        got = (p.crop, p.resize, p.mode, p.interpolation, tuple(p.mean))
        assert got == (crop, resize, mode, interp, mean), f"{name}: {got}"


def test_shortest_mode_geometry_matches_torchvision():
    """mode='shortest' reproduces torchvision Resize+CenterCrop geometry
    exactly: the long side TRUNCATES (int(size*long/short)) and the crop
    offset uses python round() — checked against hand-computed values from
    torchvision's _compute_resized_output_size / F.center_crop."""
    from PIL import Image

    from atlaspatch_tpu.models.encoders.engine import PreprocessSpec

    spec = PreprocessSpec(crop=224, resize=256, mode="shortest")

    # 300x437 input: torchvision resizes to short=256, long=int(437*256/300)
    # = int(372.906) = 372 (round() would give 373)
    img = Image.new("RGB", (300, 437), (10, 20, 30))
    out = spec.apply_host(img)
    assert out.shape == (224, 224, 3)
    resized = img.resize((256, int(256 * 437 / 300)))
    assert resized.size == (256, 372)

    # odd crop margins: from a 256x373 intermediate the crop offset is
    # int(round((373-224)/2.0)) = int(round(74.5)) = 74 (banker's rounding)
    import numpy as np

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (373, 256, 3), dtype=np.uint8)
    spec_noresize = PreprocessSpec(crop=224, resize=256, mode="shortest")
    # short side is already 256 -> no resize, straight to the crop
    out = spec_noresize.apply_host(arr)
    top, left = int(round((373 - 224) / 2.0)), int(round((256 - 224) / 2.0))
    np.testing.assert_array_equal(out, arr[top : top + 224, left : left + 224])


def test_pad_to_pow2_batch_never_exceeds_max():
    from atlaspatch_tpu.services.segmentation import _pad_to_pow2_batch

    assert _pad_to_pow2_batch(33, 33) == 33
    assert _pad_to_pow2_batch(5, 32) == 8
    assert _pad_to_pow2_batch(32, 32) == 32
    assert _pad_to_pow2_batch(1, 32) == 1


def test_twoway_block_mlp_depth_independent_of_layer_count():
    """The per-block decoder MLP is structurally lin1/lin2 (2 Dense layers)
    in SAM2 no matter how many transformer layers are stacked."""
    import dataclasses

    import jax.numpy as jnp

    from atlaspatch_tpu.models.sam2.config import SAM2Config
    from atlaspatch_tpu.models.sam2.model import init_params

    cfg = dataclasses.replace(SAM2Config.test_tiny(), decoder_num_layers=3)
    params = init_params(cfg)
    tf = params["mask_decoder"]["transformer"]
    layers = [k for k in tf if k.startswith("layers_")]
    assert len(layers) == 3
    for k in layers:
        mlp = tf[k]["mlp"]
        # 2 Dense layers exactly: proj_in + proj_out, no hidden layers_i
        assert sorted(mlp.keys()) == ["proj_in", "proj_out"], sorted(mlp)
