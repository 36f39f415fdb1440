"""Parity of the torchvision-layout CNN towers + converters against torch
replicas with torchvision's exact module naming and forward semantics
(reference extractors: atlas_patch/models/patch/resnet.py and convnext.py —
pre-fc pooled features with the classifier replaced by Identity)."""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from atlaspatch_tpu.models.encoders.convnext import (
    CONVNEXT_SPECS,
    ConvNeXt,
    torchvision_convnext_to_flax,
)
from atlaspatch_tpu.models.encoders.resnet import (
    RESNET_SPECS,
    ResNet,
    torchvision_resnet_to_flax,
)


# ------------------------------------------------------------- torch ResNet
class _TBasic(tnn.Module):
    def __init__(self, inp, planes, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(inp, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        if stride != 1 or inp != planes:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inp, planes, 1, stride, bias=False), tnn.BatchNorm2d(planes)
            )
        else:
            self.downsample = None

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + idt)


class _TBottleneck(tnn.Module):
    def __init__(self, inp, planes, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(inp, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        # torchvision v1.5: stride on the 3x3
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        if stride != 1 or inp != planes * 4:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inp, planes * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(planes * 4),
            )
        else:
            self.downsample = None

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return F.relu(out + idt)


class TorchResNet(tnn.Module):
    """torchvision-named ResNet trunk (fc omitted; features = pooled pre-fc)."""

    def __init__(self, layers, bottleneck):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        block = _TBottleneck if bottleneck else _TBasic
        exp = 4 if bottleneck else 1
        inp = 64
        for stage, n in enumerate(layers):
            planes = 64 * 2**stage
            mods = []
            for b in range(n):
                mods.append(block(inp, planes, (1 if stage == 0 else 2) if b == 0 else 1))
                inp = planes * exp
            self.add_module(f"layer{stage + 1}", tnn.Sequential(*mods))
        self.layers_cfg = layers

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, 2, 1)
        for i in range(len(self.layers_cfg)):
            x = getattr(self, f"layer{i + 1}")(x)
        return x.mean(dim=(2, 3))


def _randomize_bn_stats(model, gen):
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(torch.randn(m.num_features, generator=gen) * 0.3)
                m.running_var.copy_(torch.rand(m.num_features, generator=gen) + 0.5)
                m.weight.copy_(torch.randn(m.num_features, generator=gen) * 0.2 + 1)
                m.bias.copy_(torch.randn(m.num_features, generator=gen) * 0.2)


def test_resnet_parity_basic_and_bottleneck(rng):
    for name in ("resnet18", "resnet50"):
        spec = RESNET_SPECS[name]
        torch.manual_seed(5)
        gen = torch.Generator().manual_seed(6)
        oracle = TorchResNet(spec.layers, spec.bottleneck).eval()
        _randomize_bn_stats(oracle, gen)

        params = torchvision_resnet_to_flax(oracle.state_dict(), spec)
        x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            want = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        got = np.asarray(
            ResNet(spec).apply(
                {"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(x)
            )
        )
        assert got.shape == (2, spec.embedding_dim)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


# ----------------------------------------------------------- torch ConvNeXt
class _LayerNorm2d(tnn.LayerNorm):
    def forward(self, x):
        x = x.permute(0, 2, 3, 1)
        x = super().forward(x)
        return x.permute(0, 3, 1, 2)


class _TCNBlock(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.block = tnn.Sequential(
            tnn.Conv2d(dim, dim, 7, padding=3, groups=dim, bias=True),
            tnn.Identity(),  # Permute placeholder (handled in forward)
            tnn.LayerNorm(dim, eps=1e-6),
            tnn.Linear(dim, 4 * dim),
            tnn.GELU(),
            tnn.Linear(4 * dim, dim),
        )
        self.layer_scale = tnn.Parameter(torch.full((dim, 1, 1), 1e-6))

    def forward(self, x):
        h = self.block[0](x).permute(0, 2, 3, 1)
        h = self.block[2](h)
        h = self.block[3](h)
        h = self.block[4](h)
        h = self.block[5](h).permute(0, 3, 1, 2)
        return x + self.layer_scale * h


class TorchConvNeXt(tnn.Module):
    """torchvision-named ConvNeXt trunk (classifier = Identity per reference)."""

    def __init__(self, depths, dims):
        super().__init__()
        feats = [
            tnn.Sequential(
                tnn.Conv2d(3, dims[0], 4, 4, bias=True), _LayerNorm2d(dims[0], eps=1e-6)
            )
        ]
        for stage in range(4):
            if stage > 0:
                feats.append(
                    tnn.Sequential(
                        _LayerNorm2d(dims[stage - 1], eps=1e-6),
                        tnn.Conv2d(dims[stage - 1], dims[stage], 2, 2, bias=True),
                    )
                )
            feats.append(tnn.Sequential(*[_TCNBlock(dims[stage]) for _ in range(depths[stage])]))
        self.features = tnn.Sequential(*feats)

    def forward(self, x):
        return self.features(x).mean(dim=(2, 3))


def test_convnext_parity(rng):
    spec = CONVNEXT_SPECS["convnext_tiny"]
    torch.manual_seed(7)
    oracle = TorchConvNeXt(spec.depths, spec.dims).eval()
    # randomize layer_scale so the residual branch actually contributes
    with torch.no_grad():
        for m in oracle.modules():
            if isinstance(m, _TCNBlock):
                m.layer_scale.copy_(torch.randn_like(m.layer_scale) * 0.1)

    params = torchvision_convnext_to_flax(oracle.state_dict(), spec)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(
        ConvNeXt(spec).apply({"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(x))
    )
    assert got.shape == (2, spec.embedding_dim)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
