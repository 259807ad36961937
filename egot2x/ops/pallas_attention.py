"""Pallas TPU flash-attention kernel.

Canonical streaming form: grid (batch·heads, q_blocks, k_blocks) with
the k dimension innermost. The (BLOCK_Q, D) output accumulator and the
running row-max/row-sum live in VMEM scratch that persists across the
k-block sweep; each step does two MXU matmuls
((BQ, D) @ (D, BK) and (BQ, BK) @ (BK, D)) on tiles the pipeline DMAs
in — O(N·D) HBM traffic, never materializing the (N, S) score matrix.

Used by :func:`egot2x.ops.attention.dot_product_attention` for long
sequences (MViT stage-1 runs ~25k tokens at 224² input, where the
reference's torch MHA materializes the full score matrix). Short
translator sequences stay on the XLA path, which already fuses them.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256
NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
                  sm_scale: float, s_valid: int, block_k: int):
    # q_ref: (1, BQ, D), k_ref/v_ref: (1, BK, D), o_ref: (1, BQ, D)
    kb = pl.program_id(2)
    n_kb = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0].astype(jnp.float32) * sm_scale
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (BQ, BK)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kb * block_k
    s = jnp.where(col < s_valid, s, NEG_INF)

    m_prev = m_ref[:]
    l_prev = l_ref[:]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    m_ref[:] = m_new
    l_ref[:] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jnp.dot(p, v,
                                              preferred_element_type=jnp.float32)

    @pl.when(kb == n_kb - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(o_ref.dtype)


def _pad_axis(x, axis, multiple):
    n = x.shape[axis]
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - n)
    return jnp.pad(x, pad)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def flash_attention(
    q: jax.Array,  # (BH, N, D)
    k: jax.Array,  # (BH, S, D)
    v: jax.Array,  # (BH, S, D)
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
) -> jax.Array:
    """Unmasked (bidirectional) softmax attention; returns (BH, N, D)."""
    n0, d0, s0 = q.shape[1], q.shape[2], k.shape[1]
    sm_scale = 1.0 / math.sqrt(d0)
    q = _pad_axis(_pad_axis(q, 2, 128), 1, block_q)
    k = _pad_axis(_pad_axis(k, 2, 128), 1, block_k)
    v = _pad_axis(_pad_axis(v, 2, 128), 1, block_k)
    bh, n, d = q.shape
    grid = (bh, n // block_q, k.shape[1] // block_k)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, sm_scale=sm_scale, s_valid=s0,
                          block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),   # running max
            pltpu.VMEM((block_q, 1), jnp.float32),   # running sum
            pltpu.VMEM((block_q, d), jnp.float32),   # output accumulator
        ],
        interpret=interpret,
    )(q, k, v)
    return out[:, :n0, :d0]
