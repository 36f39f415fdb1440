"""Orbax checkpoint save/restore round-trip for the finetuning state."""

from pathlib import Path

import numpy as np
import pytest
import jax

from atlaspatch_tpu.models.sam2.config import SAM2Config
from atlaspatch_tpu.models.sam2.model import init_params
from atlaspatch_tpu.models.train.checkpoints import (
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)
from atlaspatch_tpu.models.train.finetune import make_optimizer

pytest.importorskip("orbax.checkpoint")


def test_checkpoint_roundtrip(tmp_path: Path):
    cfg = SAM2Config.test_tiny()
    params = init_params(cfg, seed=3)
    opt = make_optimizer()
    opt_state = opt.init(params)

    save_checkpoint(tmp_path, 5, params, opt_state)
    save_checkpoint(tmp_path, 10, params, opt_state)
    assert latest_step(tmp_path) == 10

    restored_params, restored_opt, step = restore_checkpoint(
        tmp_path, None, params, opt_state
    )
    assert step == 10
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(restored_params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sam2_npz_checkpoint_load(tmp_path, monkeypatch):
    """The SAM2 predictor loads tools/convert_weights.py .npz archives (via
    ATLASPATCH_WEIGHTS_DIR) and reproduces the saved parameters exactly."""
    import jax
    import numpy as np

    from atlaspatch_tpu.core.config import SegmentationConfig
    from atlaspatch_tpu.models.sam2.config import SAM2Config
    from atlaspatch_tpu.models.sam2.model import init_params
    from atlaspatch_tpu.services.segmentation import SAM2Predictor
    from atlaspatch_tpu.tools.convert_weights import _flatten, unflatten  # noqa: F401

    cfg = SAM2Config.test_tiny()
    params = init_params(cfg, seed=3)
    np.savez(tmp_path / "sam2_hiera_tiny.npz", **_flatten(jax.tree.map(np.asarray, params)))

    monkeypatch.setenv("ATLASPATCH_WEIGHTS_DIR", str(tmp_path))
    monkeypatch.delenv("ATLASPATCH_SAM2_CHECKPOINT", raising=False)
    pred = SAM2Predictor(SegmentationConfig(device="cpu"), cfg)
    same = jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)), pred.params, params
    )
    assert all(jax.tree.leaves(same))
