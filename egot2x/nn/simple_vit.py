"""Pre-LN ViT encoder ("simple_vit").

Behavioral reference: HOI/models/pnr/simple_vit.py —
``Transformer`` (:94-107): per layer ``x = attn(x) + x; x = ff(x) + x``
where Attention (:67-92) LayerNorms its input, projects a fused qkv
Linear (no bias) to heads·dim_head, scaled-dot-product attends, and
projects back with a bias-free Linear; FeedForward (:55-65) is
LN → Linear(mlp) → GELU → Linear. ``SimpleViT`` (:109-144) adds 2-D
sin-cos position embeddings over patch embeddings and a LN+Linear head.

This is the encoder used by the PNR-side ``TaskFusionMFTransformer3Task``
translator variant (video_model_transfer_3task.py:129-164).

TPU notes: the fused qkv keeps one wide matmul on the MXU; shapes are
static so the whole encoder fuses into a few kernels under jit.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


class SimpleViTAttention(nn.Module):
    """Pre-LN attention with fused bias-free qkv (simple_vit.py:67-92)."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        inner = self.heads * self.dim_head
        y = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype,
                       name="to_qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, n, _ = q.shape

        def heads(t):
            return t.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        dots = jnp.einsum("bhid,bhjd->bhij", q, k) * (self.dim_head ** -0.5)
        attn = jax.nn.softmax(dots, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                        name="to_out")(out)


class SimpleViTFeedForward(nn.Module):
    """LN → Linear → GELU → Linear (simple_vit.py:55-65)."""

    dim: int
    hidden_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        y = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)


class SimpleViTEncoder(nn.Module):
    """Stack of pre-LN attention/FF residual blocks (simple_vit.py:94-107)."""

    dim: int
    depth: int = 3
    heads: int = 8
    dim_head: int = 64
    mlp_dim: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i in range(self.depth):
            x = SimpleViTAttention(self.dim, self.heads, self.dim_head,
                                   dtype=self.dtype, name=f"attn_{i}")(x) + x
            x = SimpleViTFeedForward(self.dim, self.mlp_dim, dtype=self.dtype,
                                     name=f"ff_{i}")(x) + x
        return x


def posemb_sincos_2d(h: int, w: int, dim: int,
                     temperature: float = 10000.0) -> np.ndarray:
    """2-D sin-cos position embedding (simple_vit.py:38-52); (h·w, dim)."""
    assert dim % 4 == 0, "sincos-2d dim must be a multiple of 4"
    y, x = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    omega = np.arange(dim // 4) / (dim // 4 - 1)
    omega = 1.0 / (temperature ** omega)
    y = y.flatten()[:, None] * omega[None, :]
    x = x.flatten()[:, None] * omega[None, :]
    return np.concatenate(
        [np.sin(x), np.cos(x), np.sin(y), np.cos(y)], axis=1
    ).astype(np.float32)


class SimpleViT(nn.Module):
    """Patch-embedding ViT classifier (simple_vit.py:109-144); NHWC."""

    image_size: int
    patch_size: int
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    dim_head: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img: jax.Array) -> jax.Array:
        b, h, w, c = img.shape
        p = self.patch_size
        gh, gw = h // p, w // p
        x = img.reshape(b, gh, p, gw, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, p * p * c)
        x = nn.Dense(self.dim, dtype=self.dtype, name="patch_embed")(x)
        x = x + jnp.asarray(posemb_sincos_2d(gh, gw, self.dim), x.dtype)
        x = SimpleViTEncoder(self.dim, self.depth, self.heads, self.dim_head,
                             self.mlp_dim, dtype=self.dtype,
                             name="transformer")(x)
        x = x.mean(axis=1)
        x = nn.LayerNorm(dtype=self.dtype, name="head_ln")(x)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="head_fc")(x)
