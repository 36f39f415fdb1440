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


# column-parallel (shard OUTPUT features): qkv and every MLP up-projection —
# including DINOv3's gated pair, whose fc_gate/fc_up are the dominant params
# on the 7B-class models this plan exists for. Row-parallel (shard INPUT):
# attn proj and the MLP down-projection.
_COL_PARALLEL = ("qkv", "fc1", "fc_gate", "fc_up")


def _spec_for_path(path) -> P:
    names = [p.key for p in path if hasattr(p, "key")]
    joined = "/".join(names)
    leaf = names[-1] if names else ""
    owner = names[-2] if len(names) >= 2 else ""
    if owner in _COL_PARALLEL:
        if leaf in ("kernel", "kernel_q"):
            return P(None, "model")
        if leaf in ("bias", "qscale"):
            return P("model")
    if owner == "fc2" or (owner == "proj" and "attn" in joined):
        if leaf in ("kernel", "kernel_q"):
            return P("model", None)
        # row-parallel bias/qscale apply to the un-sharded output dim
        return P()
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
