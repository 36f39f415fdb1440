"""Tensor-parallel sharding rules for the unified ViT encoders.

For ViT-g/7B-class encoders that exceed one chip (SURVEY.md §5: "2-4-way
tensor sharding of MLP/attention heads within a slice"), parameters are
sharded over the mesh's 'model' axis:

  qkv kernel (D, 3D)   → shard output features (head-parallel attention)
  attn proj (D, D)     → shard input features (row-parallel; psum by XLA)
  mlp fc1 (D, H)       → shard hidden (column-parallel)
  mlp fc2 (H, D)       → shard input hidden (row-parallel)

Everything else (norms, embeddings, patch conv) is replicated. Activations
stay batch-sharded over 'data'; with these param shardings jit/XLA inserts the
minimal all-reduces on the proj/fc2 outputs.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for_path(path) -> P:
    names = [p.key for p in path if hasattr(p, "key")]
    joined = "/".join(names)
    if joined.endswith("qkv/kernel") or joined.endswith("fc1/kernel"):
        return P(None, "model")
    if joined.endswith("qkv/bias") or joined.endswith("fc1/bias"):
        return P("model")
    if joined.endswith("proj/kernel") and "attn" in joined:
        return P("model", None)
    if joined.endswith("fc2/kernel"):
        return P("model", None)
    return P()


def vit_tp_shardings(params: Any, mesh: Mesh) -> Any:
    """Pytree of NamedShardings implementing head/MLP tensor parallelism."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: NamedSharding(mesh, _spec_for_path(path)), params
    )


def shard_vit_params(params: Any, mesh: Mesh) -> Any:
    shardings = vit_tp_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)


def make_sharded_encoder_step(model, mesh: Mesh):
    """jit a ViT forward with batch over 'data' and params TP over 'model'."""
    batch_sharded = NamedSharding(mesh, P("data"))
    out_sharded = NamedSharding(mesh, P("data"))

    def fwd(params, images):
        return model.apply({"params": params}, images)

    return jax.jit(fwd, in_shardings=(None, batch_sharded), out_shardings=out_sharded)
