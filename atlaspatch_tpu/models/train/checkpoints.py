"""Training checkpoint save/restore (orbax) for SAM2 finetuning.

The reference has no training code; its checkpoint/resume story is the
pipeline's idempotent H5 outputs (SURVEY.md §5). For the finetuning capability
added here (models/train/finetune.py), params + optimizer state persist via
orbax with step-numbered directories and latest-step restore.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax


def save_checkpoint(ckpt_dir: str | Path, step: int, params: Any, opt_state: Any) -> Path:
    import orbax.checkpoint as ocp

    path = Path(ckpt_dir).resolve() / f"step_{step:08d}"
    checkpointer = ocp.StandardCheckpointer()
    checkpointer.save(path, {"params": params, "opt_state": opt_state})
    checkpointer.wait_until_finished()
    return path


def latest_step(ckpt_dir: str | Path) -> int | None:
    steps = sorted(
        int(p.name.split("_")[1])
        for p in Path(ckpt_dir).glob("step_*")
        if p.is_dir() and p.name.split("_")[1].isdigit()
    )
    return steps[-1] if steps else None


def restore_checkpoint(
    ckpt_dir: str | Path, step: int | None, params_like: Any, opt_state_like: Any
) -> tuple[Any, Any, int]:
    """Restore (params, opt_state, step); templates provide structure/shapes."""
    import orbax.checkpoint as ocp

    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    path = Path(ckpt_dir).resolve() / f"step_{step:08d}"
    checkpointer = ocp.StandardCheckpointer()
    template = {
        "params": jax.tree.map(ocp.utils.to_shape_dtype_struct, params_like)
        if hasattr(ocp.utils, "to_shape_dtype_struct")
        else params_like,
        "opt_state": opt_state_like,
    }
    try:
        restored = checkpointer.restore(path, template)
    except Exception:
        restored = checkpointer.restore(path)
    return restored["params"], restored["opt_state"], step
