"""Preflight command tests: converter → shape check → forward smoke rows.

Uses the same synthetic upstream-layout checkpoints as the converter harness,
saved as real .pt files, so the preflight exercises the exact discovery →
torch-load → convert → validate chain a user hits with downloaded weights.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from atlaspatch_tpu.models.encoders.zoo import ENTRIES, _model_for
from atlaspatch_tpu.tools.verify_weights import (
    run_preflight,
    verify_encoder,
    verify_sam2,
)
from tests.upstream_layouts import synth_state_dict


def _save_synthetic_ckpt(name: str, out_dir: Path) -> Path:
    entry = ENTRIES[name]
    model = _model_for(entry)
    size = entry.preprocess.crop
    target = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3), jnp.float32))
    )["params"]
    sd = synth_state_dict(entry, jax.tree.map(lambda x: x, target))
    path = out_dir / f"{name}.pt"
    torch.save({k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()}, path)
    return path


def test_preflight_pass_fail_skip(tmp_path: Path):
    _save_synthetic_ckpt("resnet18", tmp_path)
    # corrupt checkpoint: truncate one weight's shape
    bad = torch.load(tmp_path / "resnet18.pt", weights_only=False)
    key = next(k for k in bad if bad[k].ndim == 4)
    bad[key] = bad[key][..., :-1]
    torch.save(bad, tmp_path / "vit_b_32.pt")  # wrong layout for that entry too

    lines: list[str] = []
    results = run_preflight(
        tmp_path,
        names=["resnet18", "vit_b_32", "resnet50"],
        smoke=True,
        include_sam2=False,
        report=lines.append,
    )
    by_name = {r.name: r for r in results}
    assert by_name["resnet18"].status == "PASS"
    assert "finite" in by_name["resnet18"].detail
    assert by_name["vit_b_32"].status == "FAIL"
    assert by_name["resnet50"].status == "SKIP"
    assert any(line.startswith("preflight:") for line in lines)


def test_preflight_shape_drift_detected(tmp_path: Path):
    path = _save_synthetic_ckpt("resnet18", tmp_path)
    sd = torch.load(path, weights_only=False)
    key = next(k for k in sd if sd[k].ndim == 4 and sd[k].shape[0] > 8)
    sd[key] = sd[key][:-3]  # converter succeeds; shapes no longer match
    torch.save(sd, path)
    res = verify_encoder(ENTRIES["resnet18"], path, smoke=False)
    assert res.status == "FAIL"
    assert "shape" in res.detail


def test_preflight_unknown_name(tmp_path: Path):
    with pytest.raises(ValueError, match="unknown encoder"):
        run_preflight(tmp_path, names=["not_a_model"], report=lambda _s: None)


def test_preflight_sam2_npz(tmp_path: Path):
    from atlaspatch_tpu.models.sam2.config import SAM2Config
    from atlaspatch_tpu.models.sam2.model import init_params
    from atlaspatch_tpu.tools.convert_weights import _flatten

    params = init_params(SAM2Config.tiny())
    np.savez(tmp_path / "sam2_hiera_tiny.npz", **_flatten(jax.tree.map(np.asarray, params)))
    res = verify_sam2(tmp_path / "sam2_hiera_tiny.npz", smoke=False)
    assert res.status == "PASS", res.detail

    # a checkpoint for the wrong architecture must FAIL the shape check
    tiny = init_params(SAM2Config.test_tiny())
    np.savez(tmp_path / "sam2_wrong.npz", **_flatten(jax.tree.map(np.asarray, tiny)))
    res_bad = verify_sam2(tmp_path / "sam2_wrong.npz", smoke=False)
    assert res_bad.status == "FAIL"
    assert "shape" in res_bad.detail


def _fake_hf_cache(tmp_path: Path, repo: str, files: dict) -> Path:
    import json

    snap = tmp_path / "hub" / f"models--{repo.replace('/', '--')}" / "snapshots" / "abc123"
    snap.mkdir(parents=True)
    for fname, payload in files.items():
        (snap / fname).write_text(json.dumps(payload))
    return snap


def test_hf_config_crosscheck_pass_and_fail(tmp_path: Path, monkeypatch):
    """verify-weights diffs pinned preprocessing/arch constants against any
    HF processor/config JSONs in the cache (VERDICT r3 item 2)."""
    from atlaspatch_tpu.tools.verify_weights import _hf_snapshot_dir, verify_hf_config

    entry = ENTRIES["phikon_v1"]  # owkin/phikon: ViT-B, square-224, ImageNet norm
    pre, spec = entry.preprocess, entry.spec

    good = {
        "preprocessor_config.json": {
            "image_mean": list(pre.mean),
            "image_std": list(pre.std),
            "size": {"height": pre.resize, "width": pre.resize},
            "do_resize": True,
            "do_normalize": True,
        },
        "config.json": {
            "hidden_size": spec.dim,
            "num_hidden_layers": spec.depth,
            "num_attention_heads": spec.heads,
            "patch_size": spec.patch_size,
            "image_size": spec.img_size,
        },
    }
    monkeypatch.setenv("HF_HUB_CACHE", str(tmp_path / "hub"))
    snap = _fake_hf_cache(tmp_path, "owkin/phikon", good)
    assert _hf_snapshot_dir(entry) == snap
    row = verify_hf_config(entry, snap)
    assert row is not None and row.status == "PASS", row.detail
    assert "mean/std" in row.detail and "dim" in row.detail

    bad = dict(good)
    bad["config.json"] = dict(good["config.json"], hidden_size=1024)
    bad["preprocessor_config.json"] = dict(
        good["preprocessor_config.json"], image_mean=[0.5, 0.5, 0.5]
    )
    snap2 = _fake_hf_cache(tmp_path / "second", "owkin/phikon", bad)
    row = verify_hf_config(entry, snap2)
    assert row is not None and row.status == "FAIL"
    assert "image_mean" in row.detail and "hidden_size" in row.detail


def test_hf_config_native_image_size_not_flagged(tmp_path: Path):
    """HF config.json carries the NATIVE training resolution (dinov2: 518)
    while the zoo pins the reference's SERVING size (224, interpolated
    pos-embeds) — that expected mismatch must not FAIL the preflight."""
    from atlaspatch_tpu.tools.verify_weights import verify_hf_config

    entry = ENTRIES["dinov2_large"]
    spec = entry.spec
    snap = _fake_hf_cache(tmp_path, "facebook/dinov2-large", {
        "config.json": {
            "hidden_size": spec.dim,
            "num_hidden_layers": spec.depth,
            "num_attention_heads": spec.heads,
            "patch_size": spec.patch_size,
            "image_size": 518,  # native, != pinned serving img_size 224
        },
    })
    row = verify_hf_config(entry, snap)
    assert row is not None and row.status == "PASS", row.detail


def test_hf_config_malformed_values_degrade_to_fail_row(tmp_path: Path):
    """Malformed-but-parseable processor values (list sizes, odd-length
    means) must yield a FAIL row for that entry — never an exception — and
    must not hide the config.json architecture diff."""
    from atlaspatch_tpu.tools.verify_weights import verify_hf_config

    entry = ENTRIES["phikon_v1"]
    spec = entry.spec
    snap = _fake_hf_cache(tmp_path, "owkin/phikon", {
        "preprocessor_config.json": {
            "image_mean": [0.485, 0.456, 0.406, 0.0],  # 4 elements
            "size": [224, 224],                          # list form
            "crop_size": {"shortest_edge": None},        # edge unreadable
            "do_center_crop": True,
            "do_resize": True,
            "do_normalize": True,
        },
        "config.json": {"hidden_size": 1024},            # wrong arch too
    })
    row = verify_hf_config(entry, snap)
    assert row is not None and row.status == "FAIL"
    assert "image_mean" in row.detail
    # the load-bearing arch mismatch is still reported alongside
    assert "hidden_size" in row.detail


def test_hf_config_crosscheck_absent_is_silent(tmp_path: Path, monkeypatch):
    """No cached JSONs (or no checkable keys) -> no row, no noise."""
    from atlaspatch_tpu.tools.verify_weights import _hf_snapshot_dir, verify_hf_config

    entry = ENTRIES["phikon_v1"]
    monkeypatch.setenv("HF_HUB_CACHE", str(tmp_path / "empty_hub"))
    assert _hf_snapshot_dir(entry) is None
    snap = _fake_hf_cache(tmp_path, "owkin/phikon", {"config.json": {"model_type": "vit"}})
    assert verify_hf_config(entry, snap) is None
