"""Torchvision-style ConvNeXt in Flax (tiny/small/base/large).

Reference behavior: the whole classifier (LayerNorm2d + flatten + linear) is
replaced by Identity, so features are the *pre-norm* global-average-pooled map
flattened to (N, C) (reference: atlas_patch/models/patch/convnext.py:25-37 with
base.py:101-103 — SURVEY.md §2 row 22).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from atlaspatch_tpu.models.encoders.convert import _np


@dataclass(frozen=True)
class ConvNeXtSpec:
    depths: tuple[int, ...]
    dims: tuple[int, ...]

    @property
    def embedding_dim(self) -> int:
        return self.dims[-1]


CONVNEXT_SPECS = {
    "convnext_tiny": ConvNeXtSpec((3, 3, 9, 3), (96, 192, 384, 768)),
    "convnext_small": ConvNeXtSpec((3, 3, 27, 3), (96, 192, 384, 768)),
    "convnext_base": ConvNeXtSpec((3, 3, 27, 3), (128, 256, 512, 1024)),
    "convnext_large": ConvNeXtSpec((3, 3, 27, 3), (192, 384, 768, 1536)),
}


class CNBlock(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(
            self.dim,
            (7, 7),
            padding=[(3, 3), (3, 3)],
            feature_group_count=self.dim,
            name="dwconv",
        )(x)
        h = nn.LayerNorm(epsilon=1e-6, name="norm")(h)
        h = nn.Dense(4 * self.dim, name="pw1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="pw2")(h)
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,))
        return x + h * gamma


class ConvNeXt(nn.Module):
    spec: ConvNeXtSpec

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = self.spec
        x = nn.Conv(s.dims[0], (4, 4), strides=(4, 4), padding="VALID", name="stem_conv")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="stem_norm")(x)
        for stage in range(4):
            if stage > 0:
                x = nn.LayerNorm(epsilon=1e-6, name=f"down{stage}_norm")(x)
                x = nn.Conv(
                    s.dims[stage], (2, 2), strides=(2, 2), padding="VALID", name=f"down{stage}_conv"
                )(x)
            for b in range(s.depths[stage]):
                x = CNBlock(s.dims[stage], name=f"stage{stage}_block{b}")(x)
        # classifier replaced by Identity ⇒ pooled pre-norm features
        return x.mean(axis=(1, 2))


def torchvision_convnext_to_flax(sd, spec: ConvNeXtSpec) -> dict:
    """torchvision convnext state dict → Flax params.

    torchvision layout: features.0 = stem (conv + LayerNorm2d); features.{2,4,6}
    = downsample (LayerNorm2d + conv); features.{1,3,5,7} = stages of CNBlocks
    with block.{0 dwconv, 2 LN, 3 linear, 5 linear} and layer_scale.
    """

    np_ = _np  # shared torch->numpy helper (convert.py)

    def conv(key):
        return {
            "kernel": np_(sd[f"{key}.weight"]).transpose(2, 3, 1, 0),
            "bias": np_(sd[f"{key}.bias"]),
        }

    def ln(key):
        return {"scale": np_(sd[f"{key}.weight"]), "bias": np_(sd[f"{key}.bias"])}

    def lin(key):
        return {"kernel": np_(sd[f"{key}.weight"]).T, "bias": np_(sd[f"{key}.bias"])}

    params: dict = {
        "stem_conv": conv("features.0.0"),
        "stem_norm": ln("features.0.1"),
    }
    for stage in range(4):
        feat_idx = 1 + 2 * stage
        if stage > 0:
            params[f"down{stage}_norm"] = ln(f"features.{feat_idx - 1}.0")
            params[f"down{stage}_conv"] = conv(f"features.{feat_idx - 1}.1")
        for b in range(spec.depths[stage]):
            src = f"features.{feat_idx}.{b}.block"
            dw = conv(f"{src}.0")
            # torchvision depthwise conv weight is (C,1,7,7) → flax expects
            # (7,7,1,C) for feature_group_count=C
            params[f"stage{stage}_block{b}"] = {
                "dwconv": dw,
                "norm": ln(f"{src}.2"),
                "pw1": lin(f"{src}.3"),
                "pw2": lin(f"{src}.5"),
                "gamma": np_(sd[f"features.{feat_idx}.{b}.layer_scale"]).reshape(-1),
            }
    return params
