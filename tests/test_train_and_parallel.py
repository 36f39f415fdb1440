"""Training step, mesh sharding, multihost sharding, engine, and plugin tests."""

from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def test_norm_param_mask_selects_norms():
    from atlaspatch_tpu.models.sam2.config import SAM2Config
    from atlaspatch_tpu.models.sam2.model import init_params
    from atlaspatch_tpu.models.train.finetune import norm_param_mask

    cfg = SAM2Config.test_tiny()
    params = init_params(cfg)
    mask = norm_param_mask(params)
    flat = jax.tree_util.tree_leaves_with_path(mask)
    trainable = [jax.tree_util.keystr(p) for p, v in flat if v]
    frozen = [jax.tree_util.keystr(p) for p, v in flat if not v]
    assert any("layer_norm1" in t for t in trainable)
    assert any("upscale_layer_norm" in t for t in trainable)
    assert all("qkv" not in t for t in trainable)
    assert any("qkv" in f for f in frozen)


def test_train_step_updates_only_norm_params():
    from atlaspatch_tpu.models.sam2.config import SAM2Config
    from atlaspatch_tpu.models.sam2.model import init_params
    from atlaspatch_tpu.models.train.finetune import (
        make_optimizer,
        make_train_step,
        norm_param_mask,
    )

    cfg = SAM2Config.test_tiny()
    params = init_params(cfg, seed=1)
    opt = make_optimizer(1e-3)
    opt_state = opt.init(params)
    step = jax.jit(make_train_step(cfg, opt))

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (2, cfg.image_size, cfg.image_size, 3), dtype=np.uint8))
    targets = jnp.asarray((rng.random((2, cfg.image_size, cfg.image_size)) > 0.5).astype(np.float32))

    new_params, _, loss = step(params, opt_state, images, targets)
    assert np.isfinite(float(loss))

    mask = norm_param_mask(params)
    changed = jax.tree.map(lambda a, b: bool(np.any(np.asarray(a) != np.asarray(b))), params, new_params)
    for path, did_change in jax.tree_util.tree_leaves_with_path(changed):
        key = jax.tree_util.keystr(path)
        is_norm = jax.tree_util.tree_leaves_with_path(mask)
        # frozen params must be bit-identical
    flat_mask = dict(
        (jax.tree_util.keystr(p), v) for p, v in jax.tree_util.tree_leaves_with_path(mask)
    )
    for path, did_change in jax.tree_util.tree_leaves_with_path(changed):
        key = jax.tree_util.keystr(path)
        if not flat_mask[key]:
            assert not did_change, f"frozen param {key} changed"
    assert any(
        did_change
        for path, did_change in jax.tree_util.tree_leaves_with_path(changed)
        if flat_mask[jax.tree_util.keystr(path)]
    ), "no norm parameter was updated"


def test_sharded_train_step_on_mesh():
    from atlaspatch_tpu.models.sam2.config import SAM2Config
    from atlaspatch_tpu.models.sam2.model import init_params
    from atlaspatch_tpu.models.train.finetune import make_optimizer, shard_train_step

    devices = np.asarray(jax.devices()[:4]).reshape(4, 1)
    mesh = Mesh(devices, axis_names=("data", "model"))
    cfg = SAM2Config.test_tiny()
    params = init_params(cfg)
    opt = make_optimizer()
    opt_state = opt.init(params)
    with mesh:
        step = shard_train_step(cfg, opt, mesh)
        rep = NamedSharding(mesh, P())
        dp = NamedSharding(mesh, P("data"))
        images = jax.device_put(jnp.zeros((8, cfg.image_size, cfg.image_size, 3), jnp.uint8), dp)
        targets = jax.device_put(jnp.zeros((8, cfg.image_size, cfg.image_size), jnp.float32), dp)
        p = jax.device_put(params, rep)
        s = jax.device_put(opt_state, rep)
        _, _, loss = step(p, s, images, targets)
        assert np.isfinite(float(loss))


def test_vit_tp_shardings():
    from atlaspatch_tpu.models.encoders.vit import ViT, ViTSpec
    from atlaspatch_tpu.parallel.sharding import vit_tp_shardings

    devices = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, axis_names=("data", "model"))
    spec = ViTSpec(img_size=32, patch_size=8, dim=64, depth=1, heads=4)
    vit = ViT(spec)
    params = vit.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    shardings = vit_tp_shardings(params, mesh)
    assert shardings["blocks_0"]["attn"]["qkv"]["kernel"].spec == P(None, "model")
    assert shardings["blocks_0"]["attn"]["proj"]["kernel"].spec == P("model", None)
    assert shardings["blocks_0"]["mlp"]["fc1"]["kernel"].spec == P(None, "model")
    assert shardings["blocks_0"]["mlp"]["fc2"]["kernel"].spec == P("model", None)
    assert shardings["norm"]["scale"].spec == P()

    # forward executes under the mesh with TP-sharded params
    sp = jax.tree.map(jax.device_put, params, shardings)
    imgs = jax.device_put(
        jnp.zeros((8, 32, 32, 3), jnp.float32), NamedSharding(mesh, P("data"))
    )
    with mesh:
        out = jax.jit(lambda p, x: vit.apply({"params": p}, x))(sp, imgs)
    assert out.shape == (8, 64)


def test_host_shard(monkeypatch):
    from atlaspatch_tpu.parallel import multihost

    items = list(range(10))
    assert multihost.host_shard(items) == items
    monkeypatch.setenv(multihost.ENV_NUM_HOSTS, "3")
    monkeypatch.setenv(multihost.ENV_HOST_ID, "1")
    assert multihost.host_shard(items) == [1, 4, 7]


def test_jax_engine_with_toy_model(rng):
    import flax.linen as nn

    from atlaspatch_tpu.models.encoders.engine import JaxFeatureExtractor, PreprocessSpec

    class Toy(nn.Module):
        @nn.compact
        def __call__(self, x):
            return x.mean(axis=(1, 2))  # (B, 3)

    model = Toy()
    spec = PreprocessSpec(crop=16, resize=16, mode="square", mean=(0, 0, 0), std=(1, 1, 1))
    ext = JaxFeatureExtractor(
        name="toy",
        embedding_dim=3,
        spec=spec,
        apply_fn=lambda p, x: model.apply({"params": p}, x),
        params={},
        max_batch=4,
        prep_workers=2,
    )
    patches = [rng.integers(0, 256, (32, 32, 3), dtype=np.uint8) for _ in range(10)]
    feats = ext.extract_batch(patches, batch_size=4)
    assert feats.shape == (10, 3)
    # spot-check: features equal the mean of the host-preprocessed patch
    want = spec.apply_host(patches[0]).astype(np.float32).mean(axis=(0, 1)) / 255.0
    np.testing.assert_allclose(feats[0], want, rtol=1e-5, atol=1e-5)


def test_custom_plugin_module(tmp_path: Path, rng):
    from atlaspatch_tpu.models.encoders.custom import register_feature_extractors_from_module
    from atlaspatch_tpu.models.encoders.registry import PatchFeatureExtractorRegistry

    plugin = tmp_path / "my_plugin.py"
    plugin.write_text(
        "import numpy as np\n"
        "from atlaspatch_tpu.models.encoders.custom import (\n"
        "    CustomEncoderComponents, register_custom_encoder)\n"
        "from atlaspatch_tpu.models.encoders.engine import PreprocessSpec\n"
        "def register_feature_extractors(registry, device, dtype, num_workers):\n"
        "    def loader(device, dtype):\n"
        "        return CustomEncoderComponents(\n"
        "            preprocess=PreprocessSpec(crop=8, resize=8, mode='square'),\n"
        "            numpy_fn=lambda imgs: imgs.reshape(imgs.shape[0], -1)[:, :4]\n"
        "                .astype('float32'),\n"
        "        )\n"
        "    register_custom_encoder(registry=registry, name='plugged',\n"
        "                            embedding_dim=4, loader=loader,\n"
        "                            device=device, dtype=dtype)\n"
    )
    registry = PatchFeatureExtractorRegistry()
    register_feature_extractors_from_module(plugin, registry=registry, device=None, dtype="float32")
    assert "plugged" in registry.available()
    ext = registry.create("plugged")
    feats = ext.extract_batch([rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)])
    assert feats.shape == (1, 4)


def test_sharded_segment_step_matches_single_device():
    """Mesh-DP serving path: make_sharded_segment_step output is bit-identical
    to the single-device packed step for the same params/batch."""
    from atlaspatch_tpu.models.sam2.config import SAM2Config
    from atlaspatch_tpu.models.sam2.model import (
        init_params,
        make_sharded_segment_step,
        segment_step_packed_from_thumbs,
    )

    cfg = SAM2Config.test_tiny()
    params = init_params(cfg)
    rng = np.random.default_rng(11)
    thumbs = rng.integers(0, 256, (4, 64, 80, 3), dtype=np.uint8)
    thr = jnp.float32(0.0)

    want = np.asarray(segment_step_packed_from_thumbs(cfg, params, jnp.asarray(thumbs), thr))

    devices = np.asarray(jax.devices()[:4]).reshape(4, 1)
    mesh = Mesh(devices, axis_names=("data", "model"))
    step = make_sharded_segment_step(cfg, mesh, from_thumbs=True)
    rep = NamedSharding(mesh, P())
    got = np.asarray(step(jax.device_put(params, rep), jnp.asarray(thumbs), thr))
    np.testing.assert_array_equal(got, want)


def test_segmentation_service_on_mesh(tmp_path):
    """SAM2Predictor with a mesh: grouped async path pads to the data-axis
    size and returns masks identical to the single-device predictor."""

    from atlaspatch_tpu.core.config import SegmentationConfig
    from atlaspatch_tpu.models.sam2.config import SAM2Config
    from atlaspatch_tpu.services.segmentation import SAM2Predictor

    cfg = SegmentationConfig(device="cpu", batch_size=4)
    sam2_cfg = SAM2Config.test_tiny()
    rng = np.random.default_rng(7)
    thumbs = [rng.integers(0, 256, (48, 64, 3), dtype=np.uint8) for _ in range(3)]

    single = SAM2Predictor(cfg, sam2_cfg)
    want = single.predict_masks_grouped_async(thumbs)()

    devices = np.asarray(jax.devices()[:4]).reshape(4, 1)
    mesh = Mesh(devices, axis_names=("data", "model"))
    sharded = SAM2Predictor(cfg, sam2_cfg, mesh=mesh)
    got = sharded.predict_masks_grouped_async(thumbs)()

    assert len(got) == len(want) == 3
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)

    # packed (pre-resized) path with a batch not divisible by the data axis
    imgs = rng.integers(
        0, 256, (3, sam2_cfg.image_size, sam2_cfg.image_size, 3), dtype=np.uint8
    )
    want2 = single.fetch_masks(single.predict_masks_async(imgs))
    got2 = sharded.fetch_masks(sharded.predict_masks_async(imgs))
    np.testing.assert_array_equal(got2, want2)


def test_embedding_mesh_helpers():
    from atlaspatch_tpu.parallel.mesh import embedding_mesh, replicate, shard_batch

    mesh = embedding_mesh(model_parallel=2, devices=jax.devices()[:8])
    assert mesh.shape == {"data": 4, "model": 2}

    batch = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    sharded = shard_batch(mesh, batch)
    assert sharded.sharding.spec == P("data")
    np.testing.assert_array_equal(np.asarray(sharded), batch)

    tree = {"w": np.ones((4, 4), np.float32)}
    rep = replicate(mesh, tree)
    assert rep["w"].sharding.spec == P()

    try:
        embedding_mesh(model_parallel=3, devices=jax.devices()[:8])
    except ValueError:
        pass
    else:
        raise AssertionError("expected ValueError for non-divisible model_parallel")


def test_sharded_segmentation_bfloat16():
    """Mesh-DP serving with bfloat16 params (the bench/production precision):
    partitioning changes XLA's bf16 fusion order, so pixels sitting exactly on
    the mask threshold may flip — masks must still agree >=99.5% per slide
    (fp32 is bit-identical; see test_segmentation_service_on_mesh)."""
    from atlaspatch_tpu.core.config import SegmentationConfig
    from atlaspatch_tpu.models.sam2.config import SAM2Config
    from atlaspatch_tpu.services.segmentation import SAM2Predictor

    cfg = SegmentationConfig(device="cpu", batch_size=4, precision="bfloat16")
    sam2_cfg = SAM2Config.test_tiny()
    rng = np.random.default_rng(13)
    thumbs = [rng.integers(0, 256, (40, 56, 3), dtype=np.uint8) for _ in range(3)]

    single = SAM2Predictor(cfg, sam2_cfg)
    want = single.predict_masks_grouped_async(thumbs)()

    devices = np.asarray(jax.devices()[:4]).reshape(4, 1)
    mesh = Mesh(devices, axis_names=("data", "model"))
    sharded = SAM2Predictor(cfg, sam2_cfg, mesh=mesh)
    got = sharded.predict_masks_grouped_async(thumbs)()

    for g, w in zip(got, want):
        assert g.shape == w.shape
        assert (g == w).mean() >= 0.995


def test_vit_tp_shardings_gated_mlp_and_int8():
    """TP rules must cover DINOv3's gated MLP (fc_gate/fc_up are the dominant
    params on the 7B-class models the plan exists for) and int8 layouts
    (kernel_q + per-output qscale), and a gated TP forward must match the
    replicated forward."""
    from atlaspatch_tpu.models.encoders.vit import ViT, ViTSpec, quantize_vit_params
    from atlaspatch_tpu.parallel.sharding import vit_tp_shardings

    devices = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, axis_names=("data", "model"))
    spec = ViTSpec(
        img_size=32, patch_size=8, dim=64, depth=1, heads=4,
        mlp_hidden=128, gated_mlp=True, layerscale=True,
    )
    vit = ViT(spec)
    params = vit.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    sh = vit_tp_shardings(params, mesh)
    mlp = sh["blocks_0"]["mlp"]
    assert mlp["fc_gate"]["kernel"].spec == P(None, "model")
    assert mlp["fc_up"]["kernel"].spec == P(None, "model")
    assert mlp["fc_gate"]["bias"].spec == P("model")
    assert mlp["fc2"]["kernel"].spec == P("model", None)
    assert mlp["fc2"]["bias"].spec == P()

    imgs_np = np.random.default_rng(0).uniform(size=(8, 32, 32, 3)).astype(np.float32)
    want = np.asarray(vit.apply({"params": params}, jnp.asarray(imgs_np)))
    sp = jax.tree.map(jax.device_put, params, sh)
    imgs = jax.device_put(jnp.asarray(imgs_np), NamedSharding(mesh, P("data")))
    with mesh:
        got = jax.jit(lambda p, x: vit.apply({"params": p}, x))(sp, imgs)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)

    # int8 layouts: quantized kernels shard like their float counterparts
    qparams = quantize_vit_params(jax.tree.map(np.asarray, params))
    qsh = vit_tp_shardings(qparams, mesh)
    qattn = qsh["blocks_0"]["attn"]
    qmlp = qsh["blocks_0"]["mlp"]
    assert qattn["qkv"]["kernel_q"].spec == P(None, "model")
    assert qattn["qkv"]["qscale"].spec == P("model")
    assert qattn["proj"]["kernel_q"].spec == P("model", None)
    assert qattn["proj"]["qscale"].spec == P()
    assert qmlp["fc_gate"]["kernel_q"].spec == P(None, "model")
    assert qmlp["fc2"]["kernel_q"].spec == P("model", None)
