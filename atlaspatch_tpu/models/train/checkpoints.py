"""Training checkpoint save/restore (orbax) for SAM2 finetuning.

The reference has no training code; its checkpoint/resume story is the
pipeline's idempotent H5 outputs (SURVEY.md §5). For the finetuning capability
added here (models/train/finetune.py), params + optimizer state persist via
orbax with step-numbered directories and latest-step restore.

Multi-host runs use a plain atomic ``step_XXXXXXXX.npz`` of the flattened
pytrees instead: orbax's save() performs its own global barrier assuming ALL
processes call it, but the finetune loop has exactly one writer (process 0
snapshotting the replicated state) while the others wait at the loop's own
barrier — mixing the two deadlocks/mismatches the coordination service
(observed: "sync_global_devices name mismatch ('_Checkpointer:save_start')").
Both formats coexist under one checkpoint dir; restore picks by what exists.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any

import jax
import numpy as np


def _npz_path(ckpt_dir: str | Path, step: int) -> Path:
    return Path(ckpt_dir).resolve() / f"step_{step:08d}.npz"


def save_checkpoint(ckpt_dir: str | Path, step: int, params: Any, opt_state: Any) -> Path:
    if jax.process_count() > 1:
        return _save_npz(ckpt_dir, step, params, opt_state)
    import orbax.checkpoint as ocp

    path = Path(ckpt_dir).resolve() / f"step_{step:08d}"
    checkpointer = ocp.StandardCheckpointer()
    checkpointer.save(path, {"params": params, "opt_state": opt_state})
    checkpointer.wait_until_finished()
    return path


def _save_npz(ckpt_dir: str | Path, step: int, params: Any, opt_state: Any) -> Path:
    path = _npz_path(ckpt_dir, step)
    path.parent.mkdir(parents=True, exist_ok=True)
    arrays: dict[str, np.ndarray] = {}
    for prefix, tree in (("p", params), ("o", opt_state)):
        for i, leaf in enumerate(jax.tree.leaves(tree)):
            arrays[f"{prefix}{i}"] = np.asarray(leaf)
    tmp = path.with_name(path.name + ".tmp.npz")
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)  # readers only ever see a complete checkpoint
    return path


def _step_of(p: Path) -> int | None:
    name = p.name
    if name.endswith(".tmp.npz"):
        return None
    if name.endswith(".npz"):
        name = name[: -len(".npz")]
    elif not p.is_dir():
        return None
    tail = name.split("_", 1)[1] if "_" in name else ""
    return int(tail) if tail.isdigit() else None


def latest_step(ckpt_dir: str | Path) -> int | None:
    steps = sorted(
        s for p in Path(ckpt_dir).glob("step_*") if (s := _step_of(p)) is not None
    )
    return steps[-1] if steps else None


def restore_checkpoint(
    ckpt_dir: str | Path, step: int | None, params_like: Any, opt_state_like: Any
) -> tuple[Any, Any, int]:
    """Restore (params, opt_state, step); templates provide structure/shapes."""
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    npz = _npz_path(ckpt_dir, step)
    if npz.exists():
        data = np.load(npz)
        out = []
        for prefix, like in (("p", params_like), ("o", opt_state_like)):
            treedef = jax.tree.structure(like)
            out.append(
                jax.tree.unflatten(
                    treedef, [data[f"{prefix}{i}"] for i in range(treedef.num_leaves)]
                )
            )
        return out[0], out[1], step

    import orbax.checkpoint as ocp

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
