"""Pallas flash attention for TPU — used by SAM2's global-attention blocks.

The Hiera trunk's global blocks attend over 64x64 = 4096 tokens at 1024² input
(SURVEY.md §5: "Pallas flash-attention for the 4096-token SAM2 global blocks").
A naive attention materializes the (T, T) score matrix in HBM; this kernel
streams K/V blocks through VMEM with the standard online-softmax recurrence,
so HBM traffic stays O(T·D). Non-causal, no masking (the only case the
pipeline needs). Falls back to the jnp reference off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 512


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, sm_scale: float):
    """Grid: (BH, T // block_q). Refs: q (block_q, D); k/v (T, D); o (block_q, D)."""
    q = q_ref[:].astype(jnp.float32) * sm_scale
    block_q, d = q.shape
    t_kv = k_ref.shape[0]
    num_kb = t_kv // block_k

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (block_q, block_k)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    acc = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, _m, l = jax.lax.fori_loop(0, num_kb, body, (acc, m0, l0))
    o_ref[:] = (acc / l).astype(o_ref.dtype)


def _pick_block(t: int, preferred: int) -> int:
    b = min(preferred, t)
    while t % b:
        b //= 2
    return max(b, 1)


@functools.partial(jax.jit, static_argnames=("sm_scale",))
def flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, sm_scale: float | None = None
) -> jnp.ndarray:
    """(B, H, T, D) non-causal attention. T_q and T_kv may differ."""
    B, H, Tq, D = q.shape
    Tk = k.shape[2]
    if sm_scale is None:
        sm_scale = D**-0.5

    block_q = _pick_block(Tq, DEFAULT_BLOCK_Q)
    block_k = _pick_block(Tk, DEFAULT_BLOCK_K)

    qf = q.reshape(B * H, Tq, D)
    kf = k.reshape(B * H, Tk, D)
    vf = v.reshape(B * H, Tk, D)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, sm_scale=sm_scale),
        grid=(B * H, Tq // block_q),
        in_specs=[
            pl.BlockSpec((None, block_q, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, Tk, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, Tk, D), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, D), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Tq, D), q.dtype),
    )(qf, kf, vf)
    return out.reshape(B, H, Tq, D)


def reference_attention(q, k, v, sm_scale=None):
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q * sm_scale, k)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def attention(q, k, v, sm_scale=None, *, min_tokens: int = 1024):
    """Dispatch: Pallas flash attention on TPU for long sequences, jnp otherwise.

    Opt-in via ATLASPATCH_FLASH_ATTENTION=1: some TPU toolchains (e.g. remote
    Mosaic compile through a relay) compile custom kernels very slowly, and the
    XLA attention is already fast at SAM2's sizes — the kernel is there for
    environments where it wins.

    Q tokens and head dim must tile cleanly (T % 128 == 0); head dims that
    aren't multiples of 128 (SAM2 global blocks use 96) are zero-padded, which
    changes nothing since zero columns contribute nothing to scores."""
    import os

    B, H, Tq, D = q.shape
    use_pallas = (
        os.environ.get("ATLASPATCH_FLASH_ATTENTION") == "1"
        and jax.default_backend() == "tpu"
        and Tq >= min_tokens
        and Tq % 128 == 0
        and k.shape[2] % 128 == 0
    )
    if not use_pallas:
        return reference_attention(q, k, v, sm_scale)
    if sm_scale is None:
        sm_scale = D**-0.5
    d_pad = (-D) % 128
    if d_pad:
        pad = [(0, 0), (0, 0), (0, 0), (0, d_pad)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    out = flash_attention(q, k, v, sm_scale=sm_scale)
    return out[..., :D] if d_pad else out
