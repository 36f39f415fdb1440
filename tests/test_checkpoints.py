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
