"""Torchvision-style ResNet in Flax (v1: BasicBlock / Bottleneck).

Covers resnet18/34/50/101/152 (reference: atlas_patch/models/patch/resnet.py:
9-38, head fc→Identity so features are the post-avgpool vector) and the Lunit
self-supervised ResNet50 variants (reference: lunit.py:13-17, same
architecture). BatchNorm runs in inference mode with folded running stats.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from atlaspatch_tpu.models.encoders.convert import _np


@dataclass(frozen=True)
class ResNetSpec:
    layers: tuple[int, ...]
    bottleneck: bool

    @property
    def embedding_dim(self) -> int:
        return 512 * (4 if self.bottleneck else 1)


RESNET_SPECS = {
    "resnet18": ResNetSpec((2, 2, 2, 2), False),
    "resnet34": ResNetSpec((3, 4, 6, 3), False),
    "resnet50": ResNetSpec((3, 4, 6, 3), True),
    "resnet101": ResNetSpec((3, 4, 23, 3), True),
    "resnet152": ResNetSpec((3, 8, 36, 3), True),
}


class FrozenBatchNorm(nn.Module):
    """Inference-mode batch norm using stored running statistics."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = scale * jnp.reciprocal(jnp.sqrt(var + self.eps))
        return x * inv + (bias - mean * inv)


def _conv(features, kernel, stride=1, name=None):
    return nn.Conv(
        features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=[(kernel // 2, kernel // 2)] * 2,
        use_bias=False,
        name=name,
    )


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        identity = x
        out = _conv(self.features, 3, self.stride, name="conv1")(x)
        out = FrozenBatchNorm(self.features, name="bn1")(out)
        out = nn.relu(out)
        out = _conv(self.features, 3, 1, name="conv2")(out)
        out = FrozenBatchNorm(self.features, name="bn2")(out)
        if self.downsample:
            identity = nn.Conv(
                self.features,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                name="downsample_conv",
            )(x)
            identity = FrozenBatchNorm(self.features, name="downsample_bn")(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    features: int  # base width; output = features * 4
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1")(x)
        out = nn.relu(FrozenBatchNorm(self.features, name="bn1")(out))
        out = _conv(self.features, 3, self.stride, name="conv2")(out)
        out = nn.relu(FrozenBatchNorm(self.features, name="bn2")(out))
        out = nn.Conv(self.features * 4, (1, 1), use_bias=False, name="conv3")(out)
        out = FrozenBatchNorm(self.features * 4, name="bn3")(out)
        if self.downsample:
            identity = nn.Conv(
                self.features * 4,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                name="downsample_conv",
            )(x)
            identity = FrozenBatchNorm(self.features * 4, name="downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    spec: ResNetSpec

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, 3) normalized → (B, embedding_dim) global-avg-pool features."""
        s = self.spec
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], use_bias=False, name="conv1"
        )(x)
        x = nn.relu(FrozenBatchNorm(64, name="bn1")(x))
        # torch max_pool2d(kernel=3, stride=2, padding=1)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, window_shape=(3, 3), strides=(2, 2), padding="VALID")

        block_cls = Bottleneck if s.bottleneck else BasicBlock
        expansion = 4 if s.bottleneck else 1
        in_features = 64
        for stage, n_blocks in enumerate(s.layers):
            features = 64 * (2**stage)
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                needs_down = b == 0 and (stride != 1 or in_features != features * expansion)
                x = block_cls(
                    features,
                    stride=stride if b == 0 else 1,
                    downsample=needs_down,
                    name=f"layer{stage + 1}_{b}",
                )(x)
                in_features = features * expansion
        return x.mean(axis=(1, 2))


def torchvision_resnet_to_flax(sd, spec: ResNetSpec) -> dict:
    """torchvision resnet state dict → Flax params (fc head dropped)."""

    np_ = _np  # shared torch->numpy helper (convert.py)

    def conv(key):
        return {"kernel": np_(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)}

    def bn(key):
        return {
            "scale": np_(sd[f"{key}.weight"]),
            "bias": np_(sd[f"{key}.bias"]),
            "mean": np_(sd[f"{key}.running_mean"]),
            "var": np_(sd[f"{key}.running_var"]),
        }

    params: dict = {"conv1": conv("conv1"), "bn1": bn("bn1")}
    n_convs = 3 if spec.bottleneck else 2
    for stage, n_blocks in enumerate(spec.layers):
        for b in range(n_blocks):
            src = f"layer{stage + 1}.{b}"
            block: dict = {}
            for c in range(1, n_convs + 1):
                block[f"conv{c}"] = conv(f"{src}.conv{c}")
                block[f"bn{c}"] = bn(f"{src}.bn{c}")
            if f"{src}.downsample.0.weight" in sd:
                block["downsample_conv"] = conv(f"{src}.downsample.0")
                block["downsample_bn"] = bn(f"{src}.downsample.1")
            params[f"layer{stage + 1}_{b}"] = block
    return params
