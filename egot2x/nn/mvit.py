"""MViT: Multiscale Vision Transformer for video.

Behavioral reference: HOI/models/lta/video_model_builder.py:627-1408 —
``PatchEmbed`` (Conv3d (3,7,7)/(2,4,4) pad (1,3,3)), ``MultiScaleAttention``
(separate q/k/v projections with conv pooling in 'conv' mode),
``MultiScaleBlock`` (pre-LN, dim/head multipliers per stage, drop-path),
cls token + absolute positional embedding, ``TransformerBasicHead``.
Config defaults mirror HOI/configs/recognition/defaults.py:293-372
(MViT-B 16: EMBED_DIM 96, NUM_HEADS 1, DEPTH 16, MLP_RATIO 4).

TPU notes: token counts are static per stage; the pooled attention's
depthwise conv pooling is a (T,H,W)-windowed conv that XLA fuses with
the surrounding reshape, and all matmuls keep the head dim in lanes.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


def _round_up(x, m):
    return ((x + m - 1) // m) * m


class PatchEmbed(nn.Module):
    embed_dim: int = 96
    kernel: Tuple[int, int, int] = (3, 7, 7)
    stride: Tuple[int, int, int] = (2, 4, 4)
    padding: Tuple[int, int, int] = (1, 3, 3)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array):  # (B, T, H, W, C)
        k, s, p = self.kernel, self.stride, self.padding
        y = nn.Conv(self.embed_dim, k, strides=s,
                    padding=[(p[0], p[0]), (p[1], p[1]), (p[2], p[2])],
                    dtype=self.dtype, name="proj")(x)
        b, t, h, w, c = y.shape
        return y.reshape(b, t * h * w, c), (t, h, w)


def _attention_pool(x, thw, pool_stride, kernel, conv, cls_embed):
    """Pool token grid (B, H_heads?, N, C) via a depthwise conv."""
    if pool_stride is None or all(s == 1 for s in pool_stride):
        return x, thw
    t, h, w = thw
    if cls_embed:
        cls_tok, x = x[:, :1], x[:, 1:]
    b, n, c = x.shape
    grid = x.reshape(b, t, h, w, c)
    grid = conv(grid)
    nt, nh, nw = grid.shape[1:4]
    out = grid.reshape(b, nt * nh * nw, c)
    if cls_embed:
        out = jnp.concatenate([cls_tok, out], axis=1)
    return out, (nt, nh, nw)


def _skip_max_pool(x, thw, stride, cls_embed):
    """Max-pool the token grid for the residual path (MViT pool_skip)."""
    t, h, w = thw
    if cls_embed:
        cls_tok, x = x[:, :1], x[:, 1:]
    b, n, c = x.shape
    grid = x.reshape(b, t, h, w, c)
    grid = jax.lax.reduce_window(
        grid, -jnp.inf, jax.lax.max,
        window_dimensions=(1, stride[0], stride[1], stride[2], 1),
        window_strides=(1, stride[0], stride[1], stride[2], 1),
        padding="SAME",
    )
    out = grid.reshape(b, -1, c)
    if cls_embed:
        out = jnp.concatenate([cls_tok, out], axis=1)
    return out


class MultiScaleAttention(nn.Module):
    dim_out: int
    num_heads: int
    q_stride: Optional[Tuple[int, int, int]] = None
    kv_stride: Optional[Tuple[int, int, int]] = None
    pool_kernel: Tuple[int, int, int] = (3, 3, 3)
    cls_embed: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, thw: Tuple[int, int, int]):
        b, n, _ = x.shape
        heads = self.num_heads
        head_dim = self.dim_out // heads
        q = nn.Dense(self.dim_out, dtype=self.dtype, name="q")(x)
        k = nn.Dense(self.dim_out, dtype=self.dtype, name="k")(x)
        v = nn.Dense(self.dim_out, dtype=self.dtype, name="v")(x)

        def pool_conv(name, stride):
            kk = self.pool_kernel
            pad = [(kk[0] // 2,) * 2, (kk[1] // 2,) * 2, (kk[2] // 2,) * 2]
            return nn.Conv(self.dim_out, kk, strides=stride, padding=pad,
                           feature_group_count=self.dim_out, use_bias=False,
                           dtype=self.dtype, name=name)

        q, q_thw = _attention_pool(
            q, thw, self.q_stride,
            self.pool_kernel,
            pool_conv("pool_q", self.q_stride) if self.q_stride else None,
            self.cls_embed)
        k, kv_thw = _attention_pool(
            k, thw, self.kv_stride, self.pool_kernel,
            pool_conv("pool_k", self.kv_stride) if self.kv_stride else None,
            self.cls_embed)
        v, _ = _attention_pool(
            v, thw, self.kv_stride, self.pool_kernel,
            pool_conv("pool_v", self.kv_stride) if self.kv_stride else None,
            self.cls_embed)

        def split(t):
            return t.reshape(b, t.shape[1], heads, head_dim)

        qh, kh, vh = split(q), split(k), split(v)
        scale = 1.0 / math.sqrt(head_dim)
        logits = jnp.einsum("bthd,bshd->bhts", qh, kh,
                            preferred_element_type=jnp.float32) * scale
        probs = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
        out = jnp.einsum("bhts,bshd->bthd", probs, vh)
        out = out.reshape(b, out.shape[1], self.dim_out)
        out = nn.Dense(self.dim_out, dtype=self.dtype, name="proj")(out)
        return out, q_thw, q  # q returned for the pooled residual


class MultiScaleBlock(nn.Module):
    dim_out: int
    num_heads: int
    mlp_ratio: float = 4.0
    q_stride: Optional[Tuple[int, int, int]] = None
    kv_stride: Optional[Tuple[int, int, int]] = None
    drop_path: float = 0.0
    cls_embed: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, thw, deterministic: bool = True):
        shortcut = x
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        y, new_thw, _ = MultiScaleAttention(
            self.dim_out, self.num_heads, self.q_stride, self.kv_stride,
            cls_embed=self.cls_embed, dtype=self.dtype, name="attn",
        )(y, thw)
        # residual path max-pools the raw input with the q stride
        # (MViT pool_skip, video_model_builder.py MultiScaleBlock)
        if self.q_stride and any(s > 1 for s in self.q_stride):
            shortcut = _skip_max_pool(shortcut, thw, self.q_stride,
                                      self.cls_embed)
        if shortcut.shape[-1] != self.dim_out:
            shortcut = nn.Dense(self.dim_out, dtype=self.dtype,
                                name="proj_residual")(shortcut)
        if self.drop_path > 0:
            keep = 1.0 - self.drop_path
            if not deterministic:
                rngk = self.make_rng("dropout")
                mask = jax.random.bernoulli(rngk, keep, (x.shape[0], 1, 1))
                y = y * mask / keep
        x = shortcut + y
        z = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        z = nn.Dense(int(self.dim_out * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(z)
        z = nn.gelu(z)
        z = nn.Dense(self.dim_out, dtype=self.dtype, name="mlp_fc2")(z)
        return x + z, new_thw


class MViT(nn.Module):
    """MViT-B/16-style video transformer.

    Default stage schedule (PySlowFast MVIT-B 16x4): dim doubles and a
    spatial 2x2 q-pool at blocks 1, 3, 14; KV pooled 4x/2x/1x spatially
    per stage.
    """

    embed_dim: int = 96
    depth: int = 16
    num_heads: int = 1
    mlp_ratio: float = 4.0
    num_classes: Sequence[int] = (400,)
    cls_embed: bool = True
    dim_mul_blocks: Tuple[int, ...] = (1, 3, 14)
    head_mul_blocks: Tuple[int, ...] = (1, 3, 14)
    q_pool_blocks: Tuple[int, ...] = (1, 3, 14)
    dropout_rate: float = 0.5
    with_head: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 middle: bool = False):
        x, thw = PatchEmbed(self.embed_dim, dtype=self.dtype,
                            name="patch_embed")(x)
        b, n, _ = x.shape
        if self.cls_embed:
            cls = self.param("cls_token", nn.initializers.zeros,
                             (1, 1, self.embed_dim), jnp.float32)
            x = jnp.concatenate([jnp.tile(cls.astype(x.dtype), (b, 1, 1)), x],
                                axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, x.shape[1], self.embed_dim), jnp.float32)
        x = x + pos.astype(x.dtype)

        dim = self.embed_dim
        heads = self.num_heads
        kv_stride = [1, 8, 8]
        for i in range(self.depth):
            if i in self.dim_mul_blocks:
                dim *= 2
            if i in self.head_mul_blocks:
                heads *= 2
            q_stride = (1, 2, 2) if i in self.q_pool_blocks else None
            if i in self.q_pool_blocks:
                kv_stride = [1, max(1, kv_stride[1] // 2),
                             max(1, kv_stride[2] // 2)]
            x, thw = MultiScaleBlock(
                dim, heads, self.mlp_ratio, q_stride,
                tuple(kv_stride), drop_path=0.1 * i / max(self.depth - 1, 1),
                cls_embed=self.cls_embed, dtype=self.dtype, name=f"blocks_{i}",
            )(x, thw, deterministic=not train)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        feat = x[:, 0] if self.cls_embed else x.mean(axis=1)
        if middle or not self.with_head:
            return feat
        if self.dropout_rate > 0:
            feat = nn.Dropout(self.dropout_rate)(feat, deterministic=not train)
        outs = [nn.Dense(nc, dtype=self.dtype, name=f"head_projection_{i}")(feat)
                for i, nc in enumerate(self.num_classes)]
        return outs if len(outs) > 1 else outs[0]


class MultiTaskMViT(MViT):
    """Verb+noun MViT head (reference MultiTaskMViT, lta_models.py:96-106)."""

    num_classes: Sequence[int] = (115, 478)
