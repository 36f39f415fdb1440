"""Pallas flash-attention kernel vs the jnp reference (interpreter on CPU)."""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from atlaspatch_tpu.ops import attention as A


def _run_interpret(q, k, v, sm_scale, block_q=128, block_k=128):
    B, H, Tq, D = q.shape
    Tk = k.shape[2]
    qf = q.reshape(B * H, Tq, D)
    kf = k.reshape(B * H, Tk, D)
    vf = v.reshape(B * H, Tk, D)
    out = pl.pallas_call(
        functools.partial(A._flash_kernel, block_k=block_k, sm_scale=sm_scale),
        grid=(B * H, Tq // block_q),
        in_specs=[
            pl.BlockSpec((None, block_q, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, Tk, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, Tk, D), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, D), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Tq, D), q.dtype),
        interpret=True,
    )(qf, kf, vf)
    return out.reshape(B, H, Tq, D)


@pytest.mark.parametrize("shape", [(1, 2, 256, 64), (2, 4, 512, 96), (1, 1, 256, 128)])
def test_flash_matches_reference(rng, shape):
    B, H, T, D = shape
    q = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    k = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    v = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    want = A.reference_attention(q, k, v)
    got = _run_interpret(q, k, v, sm_scale=D**-0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_dispatch_falls_back_off_tpu(rng):
    q = jnp.asarray(rng.standard_normal((1, 2, 2048, 96)).astype(np.float32))
    out = A.attention(q, q, q)
    want = A.reference_attention(q, q, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=2e-5, atol=2e-5)
