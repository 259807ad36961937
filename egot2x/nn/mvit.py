"""MViT: Multiscale Vision Transformer for video.

Behavioral reference: HOI/models/lta/video_model_builder.py:627-1408 —
``PatchEmbed`` (Conv3d (3,7,7)/(2,4,4) pad (1,3,3)), ``MultiScaleAttention``
(:917-1164: FUSED qkv Linear (bias per cfg), per-head shared depthwise
pool convs over head_dim channels in 'conv' mode, post-pool LayerNorms
norm_q/k/v), ``MultiScaleBlock`` (:1166-1255: attention at the block's
input dim, skip max-pool with kernel = stride+1, channel expansion in
the MLP OUTPUT with the residual taken as proj(norm2(x))), cls token +
absolute positional embedding, ``TransformerBasicHead``. Stage widths
follow ``round_width`` (:1344-1357). Config defaults mirror
HOI/configs/recognition/defaults.py:293-372 (MViT-B 16: EMBED_DIM 96,
NUM_HEADS 1, DEPTH 16, MLP_RATIO 4, QKV_BIAS True).

TPU notes: token counts are static per stage; the pooled attention's
depthwise conv pooling folds heads into the batch axis so one
(T,H,W)-windowed head_dim conv serves every head, and all matmuls keep
the head dim in lanes.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from egot2x.core.registry import MODEL_REGISTRY

Dtype = Any


def round_width(width, multiplier, min_width: int = 1, divisor: int = 1):
    """PySlowFast round_width (video_model_builder.py:1344-1357)."""
    if not multiplier:
        return width
    width *= multiplier
    min_width = min_width or divisor
    width_out = max(min_width, int(width + divisor / 2) // divisor * divisor)
    if width_out < 0.9 * width:
        width_out += divisor
    return int(width_out)


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


def _split_cls(x, cls_embed):
    """(B, H, L, C) → optional cls (B, H, 1, C) + grid tokens."""
    if cls_embed:
        return x[:, :, :1], x[:, :, 1:]
    return None, x


def _headed_pool(x, thw, conv, cls_embed):
    """Pool per-head token grids: x (B, H, L, hd) → conv over (T, H, W)
    with heads folded into batch (reference attention_pool,
    video_model_builder.py:1416-1450)."""
    if conv is None:
        return x, thw
    t, h, w = thw
    cls_tok, grid = _split_cls(x, cls_embed)
    b, nh, l, c = grid.shape
    grid = grid.reshape(b * nh, t, h, w, c)
    grid = conv(grid)
    nt, nht, nw = grid.shape[1:4]
    out = grid.reshape(b, nh, nt * nht * nw, c)
    if cls_tok is not None:
        out = jnp.concatenate([cls_tok, out], axis=2)
    return out, (nt, nht, nw)


class MultiScaleAttention(nn.Module):
    """Pooled attention at a fixed ``dim`` (video_model_builder.py:917-1164,
    mode='conv', pool_first=False)."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    kernel_q: Tuple[int, ...] = ()
    kernel_kv: Tuple[int, ...] = ()
    stride_q: Tuple[int, ...] = ()
    stride_kv: Tuple[int, ...] = ()
    cls_embed: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, thw: Tuple[int, int, int]):
        b, n, _ = x.shape
        heads = self.num_heads
        head_dim = self.dim // heads
        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias,
                       dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, heads, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (B, H, N, hd)

        def pool_conv(name, kernel, stride):
            # one shared depthwise conv of head_dim channels serves all
            # heads (reference dim_conv = head_dim in 'conv' mode)
            if not kernel:
                return None
            pad = [(kk // 2, kk // 2) for kk in kernel]
            return nn.Conv(head_dim, tuple(kernel), strides=tuple(stride),
                           padding=pad, feature_group_count=head_dim,
                           use_bias=False, dtype=self.dtype, name=name)

        def post_norm(name, active):
            return (nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=name)
                    if active else None)

        q, q_thw = _headed_pool(
            q, thw, pool_conv("pool_q", self.kernel_q, self.stride_q),
            self.cls_embed)
        norm_q = post_norm("norm_q", bool(self.kernel_q))
        if norm_q is not None:
            q = norm_q(q)
        k, _ = _headed_pool(
            k, thw, pool_conv("pool_k", self.kernel_kv, self.stride_kv),
            self.cls_embed)
        norm_k = post_norm("norm_k", bool(self.kernel_kv))
        if norm_k is not None:
            k = norm_k(k)
        v, _ = _headed_pool(
            v, thw, pool_conv("pool_v", self.kernel_kv, self.stride_kv),
            self.cls_embed)
        norm_v = post_norm("norm_v", bool(self.kernel_kv))
        if norm_v is not None:
            v = norm_v(v)

        scale = 1.0 / math.sqrt(head_dim)
        logits = jnp.einsum("bhtd,bhsd->bhts", q, k,
                            preferred_element_type=jnp.float32) * scale
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhts,bhsd->bhtd", probs, v)
        nq = out.shape[2]
        out = out.transpose(0, 2, 1, 3).reshape(b, nq, self.dim)
        out = nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
        return out, q_thw


def _skip_max_pool(x, thw, stride, cls_embed):
    """Residual-path max-pool: kernel = stride+1, padding = kernel//2
    (reference kernel_skip, video_model_builder.py:1201-1204)."""
    t, h, w = thw
    if cls_embed:
        cls_tok, x = x[:, :1], x[:, 1:]
    b, n, c = x.shape
    grid = x.reshape(b, t, h, w, c)
    kernel = [s + 1 if s > 1 else s for s in stride]
    pad = [(kk // 2, kk // 2) for kk in kernel]
    grid = jax.lax.reduce_window(
        grid, -jnp.inf, jax.lax.max,
        window_dimensions=(1, kernel[0], kernel[1], kernel[2], 1),
        window_strides=(1, stride[0], stride[1], stride[2], 1),
        padding=[(0, 0)] + pad + [(0, 0)],
    )
    out = grid.reshape(b, -1, c)
    if cls_embed:
        out = jnp.concatenate([cls_tok, out], axis=1)
    return out


class MultiScaleBlock(nn.Module):
    """Reference MultiScaleBlock (video_model_builder.py:1166-1255):
    attention runs at ``dim``; the channel change to ``dim_out`` happens
    in the MLP output, with the residual as proj(norm2(x))."""

    dim: int
    dim_out: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    kernel_q: Tuple[int, ...] = ()
    kernel_kv: Tuple[int, ...] = ()
    stride_q: Tuple[int, ...] = ()
    stride_kv: Tuple[int, ...] = ()
    drop_path: float = 0.0
    cls_embed: bool = True
    dtype: Dtype = jnp.float32

    def _drop_path(self, y, deterministic):
        if self.drop_path <= 0 or deterministic:
            return y
        keep = 1.0 - self.drop_path
        rngk = self.make_rng("dropout")
        mask = jax.random.bernoulli(rngk, keep, (y.shape[0], 1, 1))
        return y * mask / keep

    @nn.compact
    def __call__(self, x: jax.Array, thw, deterministic: bool = True):
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        y, new_thw = MultiScaleAttention(
            self.dim, self.num_heads, self.qkv_bias, self.kernel_q,
            self.kernel_kv, self.stride_q, self.stride_kv,
            cls_embed=self.cls_embed, dtype=self.dtype, name="attn",
        )(y, thw)
        shortcut = x
        if self.stride_q and any(s > 1 for s in self.stride_q):
            shortcut = _skip_max_pool(shortcut, thw, self.stride_q,
                                      self.cls_embed)
        x = shortcut + self._drop_path(y, deterministic)
        x_norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        z = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(x_norm)
        z = nn.gelu(z, approximate=False)
        z = nn.Dense(self.dim_out, dtype=self.dtype, name="mlp_fc2")(z)
        if self.dim != self.dim_out:
            # residual is proj of the NORMED x (reference :1248-1250)
            x = nn.Dense(self.dim_out, dtype=self.dtype, name="proj")(x_norm)
        return x + self._drop_path(z, deterministic), new_thw


@MODEL_REGISTRY.register(name="MViT")
class MViT(nn.Module):
    """MViT-B/16-style video transformer.

    Default stage schedule (PySlowFast MVIT-B 16x4): DIM_MUL/HEAD_MUL
    2.0 at blocks 1, 3, 14; spatial 2x2 q-pool there; KV stride starts
    (1, 8, 8) and halves spatially at each q-pool block; pool kernel
    (3, 3, 3) (POOL_KVQ_KERNEL).
    """

    embed_dim: int = 96
    depth: int = 16
    num_heads: int = 1
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    num_classes: Sequence[int] = (400,)
    cls_embed: bool = True
    num_frames: int = 16
    dim_mul_blocks: Tuple[int, ...] = (1, 3, 14)
    head_mul_blocks: Tuple[int, ...] = (1, 3, 14)
    q_pool_blocks: Tuple[int, ...] = (1, 3, 14)
    pool_kernel: Tuple[int, int, int] = (3, 3, 3)
    kv_stride_base: Tuple[int, int, int] = (1, 8, 8)
    drop_path_rate: float = 0.1
    dropout_rate: float = 0.5
    with_head: bool = True
    dtype: Dtype = jnp.float32

    def _select_pathway(self, x):
        """Reference forward (:858-868): from SlowFast pathways keep the
        16-frame stream (slow if T==num_frames, else subsample fast)."""
        if not isinstance(x, (list, tuple)):
            return x
        if len(x) > 1:
            if x[0].shape[1] == self.num_frames:
                return x[0]
            down = x[1].shape[1] // self.num_frames
            return x[1][:, ::down]
        return x[0]

    def _schedule(self):
        """Per-block (dim, dim_out, heads, q_stride, kv_stride) via
        round_width (reference :760-800)."""
        dim_mul = {i: 2.0 for i in self.dim_mul_blocks}
        head_mul = {i: 2.0 for i in self.head_mul_blocks}
        out = []
        embed_dim = self.embed_dim
        num_heads = self.num_heads
        kv_stride = list(self.kv_stride_base)
        for i in range(self.depth):
            num_heads = round_width(num_heads, head_mul.get(i))
            embed_dim = round_width(embed_dim, dim_mul.get(i),
                                    divisor=num_heads)
            dim_out = round_width(
                embed_dim, dim_mul.get(i + 1),
                divisor=round_width(num_heads, head_mul.get(i + 1)))
            if i in self.q_pool_blocks:
                q_stride = (1, 2, 2)
                kv_stride = [1, max(1, kv_stride[1] // 2),
                             max(1, kv_stride[2] // 2)]
            else:
                q_stride = ()
            ks = tuple(kv_stride)
            kv_active = any(s > 1 for s in ks)
            out.append((embed_dim, dim_out, num_heads, q_stride,
                        ks if kv_active else ()))
            # NOTE: the reference recurrence applies dim_mul[i] to
            # embed_dim at iteration i (:767-774); dim_out is lookahead
            # only — do NOT assign it back.
        return out

    @nn.compact
    def __call__(self, x, train: bool = False, middle: bool = False):
        x = self._select_pathway(x)
        if jnp.issubdtype(x.dtype, jnp.integer):
            # uint8 device feed (egot2x/data/lta.py ships raw frames):
            # Ego4D DATA.MEAN/STD normalize in the compute dtype. The
            # patch-embed conv carries a bias so the conv-weight fold
            # (nn/resnet3d.py _VideoStemConv) is not applied here; the
            # 4x-lighter transfer still holds and MViT is not the
            # flagship bench path.
            x = (x.astype(self.dtype) / 255.0 - 0.45) / 0.225
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

        for i, (dim, dim_out, heads, q_stride, kv_stride) in \
                enumerate(self._schedule()):
            x, thw = MultiScaleBlock(
                dim, dim_out, heads, self.mlp_ratio, self.qkv_bias,
                kernel_q=self.pool_kernel if q_stride else (),
                kernel_kv=self.pool_kernel if kv_stride else (),
                stride_q=q_stride, stride_kv=kv_stride,
                drop_path=self.drop_path_rate * i / max(self.depth - 1, 1),
                cls_embed=self.cls_embed, dtype=self.dtype,
                name=f"blocks_{i}",
            )(x, thw, deterministic=not train)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        feat = x[:, 0] if self.cls_embed else x.mean(axis=1)
        if middle or not self.with_head:
            return feat
        if self.dropout_rate > 0:
            feat = nn.Dropout(self.dropout_rate)(feat, deterministic=not train)
        outs = [nn.Dense(nc, dtype=self.dtype, name=f"head_projection_{i}")(feat)
                for i, nc in enumerate(self.num_classes)]
        return outs if len(outs) > 1 else outs[0]


@MODEL_REGISTRY.register(name="MultiTaskMViT")
class MultiTaskMViT(MViT):
    """Verb+noun MViT head (reference MultiTaskMViT, lta_models.py:96-106)."""

    num_classes: Sequence[int] = (115, 478)
