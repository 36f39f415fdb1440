"""Unified Vision Transformer in Flax covering the encoder zoo's ViT variants.

One parameterized implementation spans: torchvision ViT-B/L/H (vit.py
reference specs), DINOv2 small..giant (+LayerScale), timm pathology FMs — UNI
v1/v2, Virchow 1/2, H-optimus, Prov-GigaPath, PathOrchestra, OpenMidnight
(register tokens, LayerScale, SwiGLU-packed MLPs, SiLU), Phikon/Hibou, Lunit
DINO ViTs, and the CLIP/SigLIP visual towers (pre-LN, QuickGELU, attention-pool
head, projection). Reference encoder behaviors cited per registration in
zoo.py.

TPU shape discipline: static input sizes per encoder; attention as batched
einsum on the MXU; bfloat16 compute optional with float32 softmax.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, replace

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class ViTSpec:
    img_size: int = 224
    patch_size: int = 16
    dim: int = 768
    depth: int = 12
    heads: int = 12
    mlp_ratio: float = 4.0
    mlp_hidden: int | None = None  # explicit hidden dim overrides ratio
    qkv_bias: bool = True
    layerscale: bool = False
    reg_tokens: int = 0
    class_token: bool = True
    swiglu: bool = False
    act: str = "gelu"  # gelu | gelu_tanh | quick_gelu | silu
    pre_ln: bool = False  # CLIP-style LN right after embeddings
    final_norm: bool = True
    proj_dim: int | None = None  # CLIP projection from CLS
    pool: str = "cls"  # cls | mean | cls_mean_concat | map | none
    patch_bias: bool = True  # CLIP conv1 has no bias
    # Positional-embedding coverage:
    #   "prefix": cls + patches (standard ViT / DINOv2; registers get no pos)
    #   "patches": patches only, prefix prepended afterwards (timm no_embed_class)
    #   "all": cls + registers + patches
    #   "rope": no learned pos embed; DINOv3 axial RoPE on patch tokens
    pos_mode: str = "prefix"
    rope_theta: float = 100.0  # used when pos_mode == "rope"
    gated_mlp: bool = False  # DINOv3 GatedMLP: down(act(gate(x)) * up(x))
    ln_eps: float = 1e-6
    # W8A8 serving mode: block Dense layers run int8 x int8 -> int32 on the
    # MXU (2x bf16 throughput on v5e: measured 117 vs 61 T(FL)OP/s at ViT-L
    # MLP shapes). Opt-in via --feature-precision int8; params use the
    # quantized layout from quantize_vit_params().
    quant_int8: bool = False
    # With quant_int8: also run QK^T and PV as int8 MXU matmuls (dynamic
    # per-row/per-channel scales; softmax stays f32). Default off: measured
    # on v5e at ViT-L 197-token shapes these matmuls are ~3% of FLOPs and the
    # quantize/dequantize VPU passes cost more than the MXU time saved (see
    # docs/PERF.md). Kept for longer-sequence regimes.
    quant_int8_attn: bool = False

    @property
    def tokens(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @property
    def prefix_tokens(self) -> int:
        return (1 if self.class_token else 0) + self.reg_tokens

    @property
    def hidden_dim(self) -> int:
        return self.mlp_hidden if self.mlp_hidden is not None else int(self.dim * self.mlp_ratio)


def _act(name: str, quantized: bool = False):
    # tanh-GELU substitution for the exact erf GELU: the erf runs on the VPU
    # inside the transformer-layer fusions that set the ViT-L pace, and
    # swapping it measures +32% resident bf16 / +35% int8 on a v5e at cos
    # 0.9998+ feature agreement (docs/PERF.md round-3 ceiling analysis).
    # Default ON only in the int8 serving mode, whose contract is already
    # fastest-with-small-drift; exact float paths keep bit-parity with
    # torchvision/timm erf-GELU oracles. ATLASPATCH_GELU_TANH=1/0 forces it
    # on/off everywhere. Read at trace time.
    if name == "gelu":
        env = os.environ.get("ATLASPATCH_GELU_TANH")
        if env == "1" or (quantized and env != "0"):
            name = "gelu_tanh"
    return {
        "gelu": lambda x: jax.nn.gelu(x, approximate=False),
        "gelu_tanh": lambda x: jax.nn.gelu(x, approximate=True),
        "quick_gelu": lambda x: x * jax.nn.sigmoid(1.702 * x),
        "silu": jax.nn.silu,
        "relu": jax.nn.relu,
    }[name]


def _rope_cos_sin(spec: ViTSpec) -> tuple[jnp.ndarray, jnp.ndarray]:
    """DINOv3 axial RoPE tables for the static patch grid: (N_patches, head_dim)."""
    head_dim = spec.dim // spec.heads
    n = spec.img_size // spec.patch_size
    inv_freq = 1.0 / spec.rope_theta ** jnp.arange(0, 1, 4 / head_dim, dtype=jnp.float32)
    coords_1d = (jnp.arange(0.5, n, dtype=jnp.float32) / n) * 2.0 - 1.0
    yy, xx = jnp.meshgrid(coords_1d, coords_1d, indexing="ij")
    coords = jnp.stack([yy.reshape(-1), xx.reshape(-1)], axis=-1)  # (N, 2)
    angles = 2.0 * jnp.pi * coords[:, :, None] * inv_freq[None, None, :]
    angles = angles.reshape(angles.shape[0], -1)
    angles = jnp.tile(angles, (1, 2))
    return jnp.cos(angles), jnp.sin(angles)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def _int8_kernel_init(key, shape, dtype=jnp.int8):
    return jax.random.randint(key, shape, -127, 128, jnp.int32).astype(jnp.int8)


class Int8Dense(nn.Module):
    """W8A8 dynamic-quantized linear layer (the int8 serving mode).

    Weights: symmetric per-output-channel int8 (`kernel_q` + f32 `qscale`).
    Activations: symmetric per-row dynamic abs-max int8, quantized in-graph
    (a VPU elementwise pass). The int8 dot accumulates in int32 on the MXU;
    dequantization folds both scales into one f32 multiply.
    """

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_dim = x.shape[-1]
        kernel_q = self.param("kernel_q", _int8_kernel_init, (in_dim, self.features))
        qscale = self.param(
            "qscale", nn.initializers.constant(1.0 / 127.0), (self.features,)
        )
        xf = x.astype(jnp.float32)
        s_x = jnp.maximum(jnp.abs(xf).max(axis=-1, keepdims=True), 1e-8) / 127.0
        xq = jnp.clip(jnp.round(xf / s_x), -127.0, 127.0).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq,
            kernel_q,
            (((xq.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * (s_x * qscale.astype(jnp.float32))
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y.astype(x.dtype)


def _dense(spec: ViTSpec, features: int, *, use_bias: bool = True, name: str):
    """Block-level linear: Int8Dense in the quantized serving mode, nn.Dense
    otherwise. Only transformer-block layers quantize; embeddings, pooling
    heads, and projections stay in the float path."""
    if spec.quant_int8:
        return Int8Dense(features, use_bias=use_bias, name=name)
    return nn.Dense(features, use_bias=use_bias, name=name)


# Block-level layers eligible for int8 (path must sit under a blocks_* scope).
QUANT_LAYER_NAMES = ("qkv", "proj", "fc1", "fc2", "fc_gate", "fc_up")


def quantize_vit_params(params):
    """Standard float ViT param tree → the Int8Dense layout.

    Per-output-channel symmetric scales over each eligible block kernel:
    kernel (K, N) f32 → kernel_q (K, N) int8 + qscale (N,) f32; biases pass
    through. Everything outside blocks_* (patch embed, norms, heads,
    projections) is untouched.
    """
    import numpy as np

    def walk(node, path):
        if isinstance(node, dict):
            if (
                "kernel" in node
                and path
                and path[-1] in QUANT_LAYER_NAMES
                and any(str(p).startswith("blocks_") for p in path)
            ):
                w = np.asarray(node["kernel"], np.float32)
                s = np.maximum(np.abs(w).max(axis=0), 1e-8) / 127.0
                kq = np.clip(np.round(w / s), -127, 127).astype(np.int8)
                out = {"kernel_q": kq, "qscale": s.astype(np.float32)}
                if "bias" in node:
                    out["bias"] = np.asarray(node["bias"], np.float32)
                return out
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        return node

    return walk(params, ())


def _q8_dyn(x: jnp.ndarray, axis: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric dynamic abs-max int8 quantization along one axis."""
    s = jnp.maximum(jnp.abs(x).max(axis=axis, keepdims=True), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x / s), -127.0, 127.0).astype(jnp.int8)
    return xq, s


class Attention(nn.Module):
    spec: ViTSpec

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = self.spec
        B, T, _ = x.shape
        head_dim = s.dim // s.heads
        qkv = _dense(s, 3 * s.dim, use_bias=s.qkv_bias, name="qkv")(x)
        qkv = qkv.reshape(B, T, 3, s.heads, head_dim)
        # Token-major (B, T, H, D) throughout: dot_general takes the head
        # axis as a non-leading batch dim directly, so no (B,H,T,D)
        # transposes in or out — XLA materialized those as real copies
        # (~8% of the ViT-L forward in the round-3 traces).
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        if s.pos_mode == "rope":
            cos, sin = _rope_cos_sin(s)
            cos = cos.astype(q.dtype)[None, :, None, :]  # (1, T_patch, 1, D)
            sin = sin.astype(q.dtype)[None, :, None, :]
            n_prefix = T - cos.shape[1]
            qp = q[:, n_prefix:]
            kp = k[:, n_prefix:]
            qp = qp * cos + _rotate_half(qp) * sin
            kp = kp * cos + _rotate_half(kp) * sin
            q = jnp.concatenate([q[:, :n_prefix], qp], axis=1)
            k = jnp.concatenate([k[:, :n_prefix], kp], axis=1)

        if s.quant_int8 and s.quant_int8_attn:
            # int8 attention matmuls: QK^T with per-(b,h,row) dynamic scales
            # on both sides, PV with per-row prob scales x per-(b,h,channel)
            # value scales (constant over the contracted axis, like the
            # per-output-channel weight scales in Int8Dense). Softmax stays
            # f32 on the VPU. At ≤~1k tokens these matmuls are a few percent
            # of the FLOPs — this exists to MEASURE that headroom honestly.
            qq, sq = _q8_dyn(q.astype(jnp.float32), axis=-1)  # (B,T,H,1)
            kq, sk = _q8_dyn(k.astype(jnp.float32), axis=-1)
            acc = jax.lax.dot_general(
                qq, kq, (((3,), (3,)), ((0, 2), (0, 2))),
                preferred_element_type=jnp.int32,
            )  # (B,H,Tq,Tk)
            attn = acc.astype(jnp.float32) * (
                sq.transpose(0, 2, 1, 3) * sk.transpose(0, 2, 3, 1)
            )
            attn = jax.nn.softmax(attn * (head_dim**-0.5), axis=-1)
            aq, sa = _q8_dyn(attn, axis=-1)  # (B,H,Tq,1)
            vq, sv = _q8_dyn(v.astype(jnp.float32), axis=1)  # scale (B,1,H,D)
            acc2 = jax.lax.dot_general(
                aq, vq, (((3,), (1,)), ((0, 1), (0, 2))),
                preferred_element_type=jnp.int32,
            )  # (B,H,Tq,D)
            out = (acc2.astype(jnp.float32) * (sa * sv.transpose(0, 2, 1, 3)))
            out = out.transpose(0, 2, 1, 3).astype(x.dtype)
        else:
            attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (head_dim**-0.5)
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        out = out.reshape(B, T, s.dim)
        return _dense(s, s.dim, name="proj")(out)


class Mlp(nn.Module):
    spec: ViTSpec

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = self.spec
        if s.gated_mlp:
            gate = _dense(s, s.hidden_dim, name="fc_gate")(x)
            up = _dense(s, s.hidden_dim, name="fc_up")(x)
            h = _act(s.act, s.quant_int8)(gate) * up
        elif s.swiglu:
            h = _dense(s, 2 * s.hidden_dim, name="fc1")(x)
            x1, x2 = jnp.split(h, 2, axis=-1)
            h = _act(s.act, s.quant_int8)(x1) * x2
        else:
            h = _act(s.act, s.quant_int8)(_dense(s, s.hidden_dim, name="fc1")(x))
        return _dense(s, s.dim, name="fc2")(h)


class Block(nn.Module):
    spec: ViTSpec

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = self.spec
        h = nn.LayerNorm(epsilon=s.ln_eps, name="norm1")(x)
        h = Attention(s, name="attn")(h)
        if s.layerscale:
            h = h * self.param("ls1", nn.initializers.ones, (s.dim,))
        x = x + h
        h = nn.LayerNorm(epsilon=s.ln_eps, name="norm2")(x)
        h = Mlp(s, name="mlp")(h)
        if s.layerscale:
            h = h * self.param("ls2", nn.initializers.ones, (s.dim,))
        return x + h


class MAPHead(nn.Module):
    """SigLIP attention-pooling head: probe token cross-attends all tokens."""

    spec: ViTSpec

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = self.spec
        B, T, _ = x.shape
        head_dim = s.dim // s.heads
        probe = self.param("probe", nn.initializers.normal(0.02), (1, 1, s.dim))
        q = nn.Dense(s.dim, name="q_proj")(jnp.broadcast_to(probe, (B, 1, s.dim)))
        k = nn.Dense(s.dim, name="k_proj")(x)
        v = nn.Dense(s.dim, name="v_proj")(x)

        def split(t):
            return t.reshape(B, -1, s.heads, head_dim).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k)) * (head_dim**-0.5)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, split(v))
        out = out.transpose(0, 2, 1, 3).reshape(B, 1, s.dim)
        out = nn.Dense(s.dim, name="out_proj")(out)
        h = nn.LayerNorm(epsilon=s.ln_eps, name="norm")(out)
        # Pooling head stays float even in int8 mode (outside blocks_*).
        h = out + Mlp(replace(s, quant_int8=False), name="mlp")(h)
        return h[:, 0]


class ViT(nn.Module):
    spec: ViTSpec

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """(B, S, S, 3) normalized images → (B, D) features per spec.pool."""
        s = self.spec
        B = images.shape[0]
        # Patch embed stays a stride-P conv: a reshape+matmul formulation was
        # measured identical for bf16 and ~10% SLOWER for the int8 serving
        # graph on v5e (it broke a downstream fusion; 1075 → 975 pps at
        # ViT-L batch 32) — see docs/PERF.md round-3 ceiling analysis.
        x = nn.Conv(
            s.dim,
            kernel_size=(s.patch_size, s.patch_size),
            strides=(s.patch_size, s.patch_size),
            use_bias=s.patch_bias,
            padding="VALID",
            name="patch_embed",
        )(images)
        x = x.reshape(B, -1, s.dim)  # row-major tokens

        prefix = []
        if s.class_token:
            cls = self.param("cls_token", nn.initializers.zeros, (1, 1, s.dim))
            prefix.append(jnp.broadcast_to(cls, (B, 1, s.dim)).astype(x.dtype))
        if s.reg_tokens:
            reg = self.param("reg_token", nn.initializers.zeros, (1, s.reg_tokens, s.dim))
            prefix.append(jnp.broadcast_to(reg, (B, s.reg_tokens, s.dim)).astype(x.dtype))

        if s.pos_mode == "rope":
            # no learned positional embedding; RoPE applied inside attention
            x = jnp.concatenate(prefix + [x], axis=1)
        else:
            if s.pos_mode == "patches":
                n_pos = s.tokens
            elif s.pos_mode == "prefix":
                n_pos = s.tokens + (1 if s.class_token else 0)
            elif s.pos_mode == "all":
                n_pos = s.tokens + s.prefix_tokens
            else:
                raise ValueError(f"unknown pos_mode {s.pos_mode}")
            pos = self.param("pos_embed", nn.initializers.normal(0.02), (1, n_pos, s.dim))

            if s.pos_mode == "patches":
                x = x + pos.astype(x.dtype)
                if prefix:
                    x = jnp.concatenate(prefix + [x], axis=1)
            elif s.pos_mode == "all":
                x = jnp.concatenate(prefix + [x], axis=1) + pos.astype(x.dtype)
            else:  # "prefix": pos covers cls+patches; registers inserted after cls
                if s.class_token:
                    x = jnp.concatenate([prefix[0], x], axis=1) + pos.astype(x.dtype)
                    if s.reg_tokens:
                        x = jnp.concatenate([x[:, :1], prefix[1], x[:, 1:]], axis=1)
                else:
                    x = x + pos.astype(x.dtype)
                    if s.reg_tokens:
                        x = jnp.concatenate([prefix[0], x], axis=1)

        if s.pre_ln:
            x = nn.LayerNorm(epsilon=s.ln_eps, name="ln_pre")(x)

        for i in range(s.depth):
            x = Block(s, name=f"blocks_{i}")(x)

        if s.final_norm:
            x = nn.LayerNorm(epsilon=s.ln_eps, name="norm")(x)

        if s.pool == "none":
            return x
        if s.pool == "cls":
            out = x[:, 0]
        elif s.pool == "mean":
            out = x[:, s.prefix_tokens :].mean(axis=1)
        elif s.pool == "cls_mean_concat":
            out = jnp.concatenate(
                [x[:, 0], x[:, s.prefix_tokens :].mean(axis=1)], axis=-1
            )
        elif s.pool == "map":
            out = MAPHead(s, name="head")(x)
        else:
            raise ValueError(f"unknown pool {s.pool}")

        if s.proj_dim is not None:
            out = nn.Dense(s.proj_dim, use_bias=False, name="proj")(out)
        return out
