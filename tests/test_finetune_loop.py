"""End-to-end SAM2 finetuning: CLI → train loop → loadable .npz.

The reference only documents its training recipe (backbone frozen, norm
layers trained — SURVEY.md §6); the loop itself is first-party
(atlaspatch_tpu/models/train/loop.py). Small image size + random init keep
this CPU-fast."""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np
from PIL import Image


def _make_dataset(root: Path, n: int = 4, size: int = 96) -> tuple[Path, Path]:
    images, masks = root / "images", root / "masks"
    images.mkdir(parents=True)
    masks.mkdir(parents=True)
    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:size, 0:size]
    for i in range(n):
        img = rng.integers(120, 255, (size, size, 3), dtype=np.uint8)
        cx, cy, r = rng.integers(24, size - 24, 3)
        blob = (xx - cx) ** 2 + (yy - cy) ** 2 < max(int(r), 12) ** 2
        img[blob] = (img[blob] * 0.5).astype(np.uint8)  # darker "tissue"
        Image.fromarray(img).save(images / f"s{i}.png")
        Image.fromarray((blob * 255).astype(np.uint8)).save(masks / f"s{i}_mask.png")
    return images, masks


def test_finetune_updates_only_norm_params(tmp_path: Path):
    import jax

    from atlaspatch_tpu.models.sam2.config import SAM2Config
    from atlaspatch_tpu.models.sam2.model import init_params
    from atlaspatch_tpu.models.train.finetune import norm_param_mask
    from atlaspatch_tpu.models.train.loop import finetune_sam2
    from atlaspatch_tpu.tools.convert_weights import unflatten

    images, masks = _make_dataset(tmp_path)
    out = tmp_path / "out"
    summary = finetune_sam2(
        images,
        masks,
        out,
        epochs=1,
        batch_size=2,
        image_size=128,
        device="cpu",
        seed=0,
    )
    assert summary["steps"] == 2
    assert np.isfinite(summary["first_loss"]) and np.isfinite(summary["final_loss"])
    npz = Path(summary["checkpoint"])
    assert npz.exists()

    import dataclasses

    cfg = dataclasses.replace(SAM2Config.tiny(), image_size=128)
    init = init_params(cfg)
    trained = unflatten(dict(np.load(npz)))
    mask = norm_param_mask(init)

    changed_norm, unchanged_other = 0, 0
    for (path_i, a), (_, b), (_, m) in zip(
        jax.tree_util.tree_flatten_with_path(init)[0],
        jax.tree_util.tree_flatten_with_path(trained)[0],
        jax.tree_util.tree_flatten_with_path(mask)[0],
    ):
        a, b = np.asarray(a), np.asarray(b)
        if m:
            changed_norm += int(not np.array_equal(a, b))
        else:
            assert np.array_equal(a, b), f"frozen param changed: {path_i}"
            unchanged_other += 1
    assert changed_norm > 0 and unchanged_other > 0


def test_finetune_cli_and_reload(tmp_path: Path):
    from click.testing import CliRunner

    from atlaspatch_tpu.cli import cli
    from atlaspatch_tpu.core.config import SegmentationConfig
    from atlaspatch_tpu.services.segmentation import SAM2Predictor

    images, masks = _make_dataset(tmp_path)
    out = tmp_path / "out"
    result = CliRunner().invoke(
        cli,
        [
            "finetune-sam2",
            str(images),
            "--masks",
            str(masks),
            "-o",
            str(out),
            "--image-size",
            "128",
            "--batch-size",
            "2",
            "--device",
            "cpu",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    npz = out / "sam2_finetuned.npz"
    assert npz.exists()
    assert "Finetuned" in result.output

    # The produced archive plugs straight into the segmentation service.
    import dataclasses

    from atlaspatch_tpu.models.sam2.config import SAM2Config

    cfg = SegmentationConfig(checkpoint_path=npz, device="cpu").validated()
    pred = SAM2Predictor(
        cfg, sam2_cfg=dataclasses.replace(SAM2Config.tiny(), image_size=128)
    )
    n_leaves = len(jax.tree_util.tree_leaves(pred.params))
    assert n_leaves > 100


def test_finetune_data_parallel_matches_single(tmp_path: Path):
    """Pure-DP sharded training must match single-device numerics (same
    batches, same updates — collectives only average identical math)."""
    from atlaspatch_tpu.models.train.loop import finetune_sam2

    images, masks = _make_dataset(tmp_path, n=4)
    s1 = finetune_sam2(
        images, masks, tmp_path / "o1", epochs=1, batch_size=2,
        image_size=128, device="cpu", seed=0,
    )
    s2 = finetune_sam2(
        images, masks, tmp_path / "o2", epochs=1, batch_size=2,
        image_size=128, device="cpu", seed=0, data_parallel=2,
    )
    assert s1["steps"] == s2["steps"]
    a = dict(np.load(s1["checkpoint"]))
    b = dict(np.load(s2["checkpoint"]))
    assert a.keys() == b.keys()
    worst = max(float(np.abs(a[k] - b[k]).max()) for k in a)
    assert worst < 5e-5, f"DP vs single divergence {worst}"


def test_finetune_resume_matches_uninterrupted(tmp_path: Path):
    """Interrupt-and-resume must reproduce the uninterrupted run exactly:
    orbax restores params+optimizer state and the epoch shuffles replay."""
    from atlaspatch_tpu.models.train.loop import finetune_sam2

    images, masks = _make_dataset(tmp_path, n=4)
    common = dict(
        epochs=2, batch_size=2, image_size=128, device="cpu", seed=0
    )
    full = finetune_sam2(images, masks, tmp_path / "full", **common)

    part = dict(common)
    part["epochs"] = 1
    finetune_sam2(images, masks, tmp_path / "res", save_every=1, **part)
    resumed = finetune_sam2(
        images, masks, tmp_path / "res", save_every=1, resume=True, **common
    )
    assert resumed["steps"] == full["steps"] == 4

    a = dict(np.load(full["checkpoint"]))
    b = dict(np.load(resumed["checkpoint"]))
    worst = max(float(np.abs(a[k] - b[k]).max()) for k in a)
    assert worst < 1e-6, f"resume diverged from uninterrupted run by {worst}"

    # resuming past completion is a reported no-op
    again = finetune_sam2(
        images, masks, tmp_path / "res", save_every=1, resume=True, **common
    )
    assert again["steps"] == 4 and again["first_loss"] is None


def test_finetune_resume_guards(tmp_path: Path):
    """--resume with nothing to resume, or with a changed run configuration,
    must fail loudly instead of silently retraining or misreplaying."""
    import pytest

    from atlaspatch_tpu.models.train.loop import finetune_sam2

    images, masks = _make_dataset(tmp_path, n=4)
    with pytest.raises(FileNotFoundError, match="no checkpoints"):
        finetune_sam2(
            images, masks, tmp_path / "empty", epochs=1, batch_size=2,
            image_size=128, device="cpu", resume=True,
        )

    finetune_sam2(
        images, masks, tmp_path / "run", epochs=1, batch_size=2,
        image_size=128, device="cpu", save_every=1,
    )
    with pytest.raises(ValueError, match="configuration differs"):
        finetune_sam2(
            images, masks, tmp_path / "run", epochs=2, batch_size=4,
            image_size=128, device="cpu", save_every=1, resume=True,
        )

    # meta.json written by an older build (missing later-added keys) stays
    # resumable: only RECORDED values are compared (regression: the strict
    # dict equality rejected every checkpoint that predates a new key).
    import json

    meta_path = tmp_path / "run" / "checkpoints" / "meta.json"
    saved = json.loads(meta_path.read_text())
    for key in ("trainable", "learning_rate"):
        saved.pop(key, None)
    meta_path.write_text(json.dumps(saved))
    again = finetune_sam2(
        images, masks, tmp_path / "run", epochs=1, batch_size=2,
        image_size=128, device="cpu", save_every=1, resume=True,
    )
    assert again["steps"] == 2 and again["first_loss"] is None


def test_make_optimizer_schedules():
    """Warmup starts at LR 0 (near-zero first update) and ramps; cosine and
    unknown-schedule validation behave."""
    import jax.numpy as jnp
    import pytest

    from atlaspatch_tpu.models.train.finetune import make_optimizer

    params = {"w": jnp.ones((4,))}
    grads = {"w": jnp.ones((4,))}

    opt = make_optimizer(1e-2, schedule="constant", warmup_steps=5)
    state = opt.init(params)
    u1, state = opt.update(grads, state, params)
    for _ in range(5):
        u_later, state = opt.update(grads, state, params)
    assert float(jnp.abs(u1["w"]).max()) < 1e-6  # first step at lr≈0
    assert float(jnp.abs(u_later["w"]).max()) > 1e-4  # post-warmup real step

    opt_c = make_optimizer(1e-2, schedule="cosine", warmup_steps=2, total_steps=10)
    state_c = opt_c.init(params)
    opt_c.update(grads, state_c, params)  # builds and steps without error

    with pytest.raises(ValueError, match="unknown LR schedule"):
        make_optimizer(1e-2, schedule="linear")


def test_finetune_augment_deterministic_and_effective(tmp_path: Path):
    """--augment changes the trained result but stays deterministic for a
    given seed (two augmented runs match exactly)."""
    from atlaspatch_tpu.models.train.loop import finetune_sam2

    images, masks = _make_dataset(tmp_path, n=4)
    common = dict(epochs=1, batch_size=2, image_size=128, device="cpu", seed=0)
    plain = finetune_sam2(images, masks, tmp_path / "p", **common)
    aug1 = finetune_sam2(images, masks, tmp_path / "a1", augment=True, **common)
    aug2 = finetune_sam2(images, masks, tmp_path / "a2", augment=True, **common)

    p = dict(np.load(plain["checkpoint"]))
    a = dict(np.load(aug1["checkpoint"]))
    b = dict(np.load(aug2["checkpoint"]))
    assert any(not np.array_equal(p[k], a[k]) for k in p), "augment had no effect"
    worst = max(float(np.abs(a[k] - b[k]).max()) for k in a)
    assert worst == 0.0, f"augmented runs not deterministic: {worst}"


def test_finetune_with_reference_yaml_config(tmp_path: Path):
    """--sam2-config (the reference's hydra YAML format) drives the train
    loop's architecture, mirroring inference's config path."""
    from atlaspatch_tpu.models.train.loop import finetune_sam2

    yaml_path = tmp_path / "custom.yaml"
    yaml_path.write_text(
        """
model:
  image_size: 128
  image_encoder:
    trunk:
      embed_dim: 16
      num_heads: 1
      stages: [1, 1, 1, 1]
      global_att_blocks: [3]
      window_pos_embed_bkg_spatial_size: [7, 7]
      window_spec: [8, 4, 4, 4]
    neck:
      d_model: 32
      backbone_channel_list: [128, 64, 32, 16]
      fpn_top_down_levels: [2, 3]
"""
    )
    images, masks = _make_dataset(tmp_path, n=2)
    summary = finetune_sam2(
        images,
        masks,
        tmp_path / "out",
        epochs=1,
        batch_size=2,
        device="cpu",
        config_path=yaml_path,
    )
    assert summary["image_size"] == 128
    assert summary["steps"] == 1 and np.isfinite(summary["final_loss"])
