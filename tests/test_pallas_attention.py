"""Pallas flash attention: interpret-mode correctness vs dense reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egot2x.ops.attention import dot_product_attention
from egot2x.ops.pallas_attention import flash_attention


def dense_ref(q, k, v):
    s = np.einsum("bnd,bsd->bns", q, k) / np.sqrt(q.shape[-1])
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bns,bsd->bnd", p, v)


@pytest.mark.parametrize("n,s,d", [(128, 128, 64), (300, 500, 64), (257, 130, 40)])
def test_flash_matches_dense(rng, n, s, d):
    q = rng.standard_normal((2, n, d)).astype(np.float32)
    k = rng.standard_normal((2, s, d)).astype(np.float32)
    v = rng.standard_normal((2, s, d)).astype(np.float32)
    out = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), block_q=128, block_k=128,
                                     interpret=True))
    np.testing.assert_allclose(out, dense_ref(q, k, v), rtol=1e-4, atol=1e-5)


def test_dot_product_attention_xla_path(rng):
    # short sequences keep the XLA path; numerics vs dense reference
    q = rng.standard_normal((1, 12, 2, 16)).astype(np.float32)
    out = dot_product_attention(jnp.asarray(q), jnp.asarray(q), jnp.asarray(q))
    flat = np.swapaxes(q, 1, 2).reshape(2, 12, 16)
    ref = dense_ref(flat, flat, flat).reshape(1, 2, 12, 16)
    np.testing.assert_allclose(np.asarray(out), np.swapaxes(ref, 1, 2),
                               rtol=1e-4, atol=1e-5)
