"""Converter validation harness over ALL zoo entries (VERDICT r1 #6).

For each of the 66 registered encoder names: build a synthetic state dict in
the exact upstream layout (tests/upstream_layouts.py), run the production
converter (zoo._convert), and require the result to match the Flax model's
``init`` tree exactly (structure AND every leaf shape). This validates each
entry's converter↔model consistency at its real configuration — dims, heads,
packed SwiGLU, register tokens, MAP/attn-pool heads, projections, the CHIEF
old-layout downsample remap — without network access. (Numerical parity per
family lives in the dedicated *_parity tests against torch oracles.)

Depths > MAX_DEPTH are reduced before the check (memory: the 7B DINOv3 at
full depth would allocate tens of GB); all non-depth constants stay real.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atlaspatch_tpu.models.encoders.zoo import ENTRIES, _convert, _model_for
from tests.upstream_layouts import synth_state_dict

MAX_DEPTH = 3


def _reduce_depth(spec):
    """Cap transformer depth; leave CNN/Swin stage layouts untouched."""
    if hasattr(spec, "trunk"):  # CoCaSpec
        return dataclasses.replace(spec, trunk=_reduce_depth(spec.trunk))
    if hasattr(spec, "depth") and isinstance(spec.depth, int) and spec.depth > MAX_DEPTH:
        return dataclasses.replace(spec, depth=MAX_DEPTH)
    return spec


def _input_size(entry) -> int:
    spec = entry.spec
    for attr in ("img_size", "image_size"):
        if hasattr(spec, attr):
            return int(getattr(spec, attr))
        if hasattr(spec, "trunk") and hasattr(spec.trunk, attr):
            return int(getattr(spec.trunk, attr))
    return int(entry.preprocess.crop)


def _shape_tree(tree):
    return jax.tree.map(lambda leaf: tuple(leaf.shape), tree)


@pytest.mark.parametrize("name", sorted(ENTRIES))
def test_converter_matches_model_init(name):
    entry = dataclasses.replace(
        ENTRIES[name], spec=_reduce_depth(ENTRIES[name].spec)
    )
    model = _model_for(entry)
    size = _input_size(entry)
    dummy = jnp.zeros((1, size, size, 3), jnp.float32)
    target = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), dummy)
    )["params"]
    target = jax.tree.map(lambda x: x, target)  # FrozenDict → comparable tree

    sd = synth_state_dict(entry, target)
    converted = _convert(entry, sd)

    want = _shape_tree(target)
    got = jax.tree.map(lambda a: tuple(np.asarray(a).shape), converted)
    assert got == want, (
        f"{name}: converted tree differs from model.init tree "
        f"(first-level keys got={sorted(got)} want={sorted(want)})"
    )
