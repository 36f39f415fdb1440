"""Mesh-sharded embedding engine: data-parallel and tensor-parallel paths on
the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from atlaspatch_tpu.models.encoders.engine import JaxFeatureExtractor, PreprocessSpec
from atlaspatch_tpu.models.encoders.vit import ViT, ViTSpec
from atlaspatch_tpu.parallel.sharding import vit_tp_shardings


def _toy_vit():
    spec = ViTSpec(img_size=16, patch_size=8, dim=32, depth=1, heads=4, pool="cls")
    model = ViT(spec)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]
    return model, params, spec


def _make_ext(model, params, mesh=None, shardings=None):
    return JaxFeatureExtractor(
        name="toy-vit",
        embedding_dim=32,
        spec=PreprocessSpec(crop=16, resize=16, mode="square", mean=(0, 0, 0), std=(1, 1, 1)),
        apply_fn=lambda p, x: model.apply({"params": p}, x),
        params=params,
        mesh=mesh,
        param_shardings=shardings,
        max_batch=8,
        prep_workers=2,
    )


def test_dp_mesh_matches_single_device(rng):
    model, params, _ = _toy_vit()
    patches = [rng.integers(0, 256, (16, 16, 3), dtype=np.uint8) for _ in range(13)]

    single = _make_ext(model, params).extract_batch(patches, batch_size=8)

    devices = np.asarray(jax.devices()[:8]).reshape(8, 1)
    mesh = Mesh(devices, axis_names=("data", "model"))
    dp = _make_ext(model, params, mesh=mesh).extract_batch(patches, batch_size=8)

    assert dp.shape == (13, 32)
    np.testing.assert_allclose(dp, single, rtol=1e-5, atol=1e-5)


def test_tp_mesh_matches_single_device(rng):
    model, params, _ = _toy_vit()
    patches = [rng.integers(0, 256, (16, 16, 3), dtype=np.uint8) for _ in range(8)]

    single = _make_ext(model, params).extract_batch(patches, batch_size=8)

    devices = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, axis_names=("data", "model"))
    shardings = vit_tp_shardings(params, mesh)
    tp = _make_ext(model, params, mesh=mesh, shardings=shardings).extract_batch(
        patches, batch_size=8
    )
    np.testing.assert_allclose(tp, single, rtol=1e-5, atol=1e-5)


def test_engine_musk_ms_aug_integration(rng):
    """The ms_aug multi-scale apply path composes with the batching engine:
    features come out (N, 2*dim) and match a direct single-call apply."""
    from atlaspatch_tpu.models.encoders.beit3 import (
        Beit3Spec,
        Beit3Vision,
        musk_ms_aug_apply,
    )

    spec = Beit3Spec(img_size=32, patch_size=8, dim=32, depth=1, heads=4, ffn_dim=64)
    model = Beit3Vision(spec)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32)
    )["params"]

    pre = PreprocessSpec(crop=32, resize=32, mode="square", mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5))
    engine = JaxFeatureExtractor(
        name="musk-tiny",
        embedding_dim=64,
        spec=pre,
        apply_fn=lambda p, x: musk_ms_aug_apply(model, p, x),
        params=params,
    )
    patches = [
        rng.integers(0, 256, (32, 32, 3), dtype=np.uint8) for _ in range(5)
    ]
    feats = engine.extract_batch(patches, batch_size=4)
    assert feats.shape == (5, 64) and np.isfinite(feats).all()

    # Oracle: normalize the same pixels directly and apply once.
    x = (np.stack(patches).astype(np.float32) / 255.0 - 0.5) / 0.5
    want = np.asarray(musk_ms_aug_apply(model, params, jnp.asarray(x)))
    np.testing.assert_allclose(feats, want, rtol=1e-4, atol=1e-5)


def test_h2d_depth_preserves_order(monkeypatch):
    """Pipeline depth must never reorder outputs (remainder chunk included)."""
    import numpy as np

    from atlaspatch_tpu.models.encoders.zoo import build_default_registry

    registry = build_default_registry(device="cpu", dtype="float32")
    ex = registry.create("resnet18")
    rng = np.random.default_rng(1)
    patches = list(rng.integers(0, 255, (22, 64, 64, 3), dtype=np.uint8))
    monkeypatch.setenv("ATLASPATCH_H2D_DEPTH", "1")
    a = np.asarray(ex.extract_batch(patches, batch_size=8))
    monkeypatch.setenv("ATLASPATCH_H2D_DEPTH", "3")
    b = np.asarray(ex.extract_batch(patches, batch_size=8))
    assert a.shape == (22, 512)
    np.testing.assert_array_equal(a, b)
    ex.cleanup()


def test_deferred_fetch_matches_blocking(monkeypatch):
    """Deferred fetch (copy_to_host_async at drain, one materialization at the
    end — the VERDICT r4 #3 link-latency fix) must be bit-identical to the
    blocking per-chunk fetch, remainder chunk included."""
    import numpy as np

    from atlaspatch_tpu.models.encoders.zoo import build_default_registry

    registry = build_default_registry(device="cpu", dtype="float32")
    ex = registry.create("resnet18")
    rng = np.random.default_rng(2)
    patches = list(rng.integers(0, 255, (22, 64, 64, 3), dtype=np.uint8))
    monkeypatch.setenv("ATLASPATCH_DEFERRED_FETCH", "0")
    blocking = np.asarray(ex.extract_batch(patches, batch_size=8))
    monkeypatch.setenv("ATLASPATCH_DEFERRED_FETCH", "1")
    deferred = np.asarray(ex.extract_batch(patches, batch_size=8))
    assert blocking.shape == (22, 512)
    np.testing.assert_array_equal(blocking, deferred)
    ex.cleanup()


def test_bf16_feature_d2h_opt_in(monkeypatch):
    """ATLASPATCH_FEATURE_D2H_BF16=1 halves D2H bytes; stored features stay
    f32 (host cast-back) within one bf16 rounding of the default path."""
    import numpy as np

    from atlaspatch_tpu.models.encoders.zoo import build_default_registry

    rng = np.random.default_rng(3)
    patches = list(rng.integers(0, 255, (9, 64, 64, 3), dtype=np.uint8))

    monkeypatch.delenv("ATLASPATCH_FEATURE_D2H_BF16", raising=False)
    ex = build_default_registry(device="cpu", dtype="float32").create("resnet18")
    base = np.asarray(ex.extract_batch(patches, batch_size=8))
    ex.cleanup()

    monkeypatch.setenv("ATLASPATCH_FEATURE_D2H_BF16", "1")
    ex2 = build_default_registry(device="cpu", dtype="float32").create("resnet18")
    halved = np.asarray(ex2.extract_batch(patches, batch_size=8))
    ex2.cleanup()

    assert halved.dtype == np.float32 and halved.shape == base.shape
    # one f32->bf16 rounding: 2^-8 relative on a ~unit-scale feature
    denom = np.maximum(np.abs(base), 1e-3)
    assert float(np.max(np.abs(halved - base) / denom)) < 2 ** -7


def test_deferred_window_bound_preserves_order(rng, monkeypatch):
    """Bounded deferred fetch (ATLASPATCH_DEFERRED_MAX_CHUNKS): when chunk
    count exceeds the window, the oldest chunks materialize mid-loop —
    output order and values must match the blocking path bit-exactly."""
    model, params, _ = _toy_vit()
    patches = [rng.integers(0, 256, (16, 16, 3), dtype=np.uint8) for _ in range(77)]

    monkeypatch.setenv("ATLASPATCH_DEFERRED_FETCH", "0")
    blocking = _make_ext(model, params).extract_batch(patches, batch_size=4)

    monkeypatch.setenv("ATLASPATCH_DEFERRED_FETCH", "1")
    monkeypatch.setenv("ATLASPATCH_DEFERRED_MAX_CHUNKS", "3")  # 20 chunks > 3
    bounded = _make_ext(model, params).extract_batch(patches, batch_size=4)

    assert bounded.shape == (77, 32)
    np.testing.assert_array_equal(bounded, blocking)
