"""Device mesh + sharding helpers for batched encoder inference.

Mesh layout: ('data', 'model'). Patch embedding is batch-sharded over 'data'
(the idiomatic replacement for the reference's thread/DataLoader parallelism —
SURVEY.md §2 row 51/52); ViT-g/7B-class encoders additionally shard attention
heads and MLP hidden over 'model' (see models/encoders/engine.py).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def embedding_mesh(model_parallel: int = 1, devices=None) -> Mesh:
    """Mesh over the given devices (default: THIS HOST's — jax.devices() under
    jax.distributed spans hosts, and device_put of host numpy batches to
    non-addressable chips raises; per-host slides feed per-host chips)."""
    devs = np.asarray(devices if devices is not None else jax.local_devices())
    if devs.size % model_parallel != 0:
        raise ValueError(
            f"model_parallel={model_parallel} must divide device count {devs.size}"
        )
    grid = devs.reshape(devs.size // model_parallel, model_parallel)
    return Mesh(grid, axis_names=("data", "model"))


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host array batch-sharded over the mesh's data axis."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.device_put(batch, sharding)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Replicate a pytree (e.g. params) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
