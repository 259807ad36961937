"""Shared transformer building blocks with PyTorch-compatible semantics.

The reference's translators are built on ``torch.nn.TransformerEncoder``
/ ``TransformerDecoder`` with the *post-LN* layer layout (torch default,
norm_first=False) and ReLU FFNs (e.g. HHI/models/ttm/
model_taskspecific.py:165-170, HHI/models/multitask/task_prompt_model.py:
60-75). For logit parity with reference checkpoints we reproduce:

  x = norm1(x + dropout(self_attn(x)))
  x = norm2(x + dropout(linear2(dropout(relu(linear1(x))))))

plus the reference's sinusoidal ``PositionalEncoding``
(HHI/models/ttm/model_taskspecific.py:9-28: pe added to the *time-major*
(T, B, D) input then dropout).

All modules here are batch-major (B, T, D) — time-major torch layouts
are converted at the model boundary. Compute dtype is configurable so
backbones can run bf16 on the MXU with f32 params.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from egot2x.ops.attention import dot_product_attention

Dtype = Any


def sinusoidal_positional_encoding(max_len: int, d_model: int, dtype=jnp.float32) -> jax.Array:
    """Classic transformer PE table (max_len, d_model)."""
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32) * (-math.log(10000.0) / d_model)
    )
    pe = jnp.zeros((max_len, d_model), dtype=jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div_term[: (d_model + 1) // 2]))
    return pe.astype(dtype)


class PositionalEncoding(nn.Module):
    """Add sinusoidal PE over the time axis of (B, T, D), then dropout."""

    d_model: int
    dropout: float = 0.1
    max_len: int = 5000

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        pe = sinusoidal_positional_encoding(self.max_len, self.d_model, x.dtype)
        x = x + pe[None, : x.shape[1]]
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class MultiHeadAttention(nn.Module):
    """Standard MHA matching ``torch.nn.MultiheadAttention`` (bias=True).

    ``dropout_rate`` drops attention *probabilities* when not
    deterministic — torch passes the layer dropout into
    nn.MultiheadAttention, a training-regularization effect the fused
    path skipped (ADVICE r1 #5). Eval parity is unaffected (dropout off).
    """

    d_model: int
    num_heads: int
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jax.Array,  # (B, T, D)
        key: jax.Array,  # (B, S, D)
        value: jax.Array,  # (B, S, D)
        mask: Optional[jax.Array] = None,  # (B, 1|H, T, S) True=keep
        is_causal: bool = False,
        deterministic: bool = True,
        return_weights: bool = False,
    ):
        assert self.d_model % self.num_heads == 0
        dh = self.d_model // self.num_heads
        dense = lambda name: nn.Dense(self.d_model, dtype=self.dtype, name=name)
        q = dense("q_proj")(query)
        k = dense("k_proj")(key)
        v = dense("v_proj")(value)
        b, t = q.shape[0], q.shape[1]
        s = k.shape[1]
        q = q.reshape(b, t, self.num_heads, dh)
        k = k.reshape(b, s, self.num_heads, dh)
        v = v.reshape(b, s, self.num_heads, dh)
        if self.dropout_rate > 0.0 and not deterministic:
            # explicit path: the fused kernel has no prob-dropout hook
            scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32))
            logits = jnp.einsum("bthd,bshd->bhts", q, k) * scale
            if mask is not None:
                logits = jnp.where(mask, logits, -jnp.inf)
            if is_causal:
                causal = jnp.tril(jnp.ones((t, s), dtype=bool))
                logits = jnp.where(causal[None, None], logits, -jnp.inf)
            probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            probs = nn.Dropout(self.dropout_rate)(probs,
                                                  deterministic=False)
            out = jnp.einsum("bhts,bshd->bthd", probs, v)
        else:
            out = dot_product_attention(q, k, v, mask=mask, is_causal=is_causal)
        out = out.reshape(b, t, self.d_model)
        out = nn.Dense(self.d_model, dtype=self.dtype, name="out_proj")(out)
        if return_weights:
            # Recompute probs only when explicitly requested (the reference's
            # CustomDecoderLayer keeps need_weights=True for inspection,
            # HHI/models/multitask/task_prompt_model.py:20-36).
            scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32))
            logits = jnp.einsum("bthd,bshd->bhts", q, k) * scale
            if mask is not None:
                logits = jnp.where(mask, logits, -jnp.inf)
            if is_causal:
                causal = jnp.tril(jnp.ones((t, s), dtype=bool))
                logits = jnp.where(causal[None, None], logits, -jnp.inf)
            weights = jax.nn.softmax(logits, axis=-1).mean(axis=1)  # (B, T, S)
            return out, weights
        return out


class TransformerEncoderLayer(nn.Module):
    """Post-LN encoder layer (torch ``nn.TransformerEncoderLayer`` default)."""

    d_model: int
    num_heads: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: Callable = nn.relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        attn = MultiHeadAttention(self.d_model, self.num_heads,
                                  dropout_rate=self.dropout,
                                  dtype=self.dtype, name="self_attn")(
            x, x, x, mask=mask, deterministic=deterministic
        )
        x = x + nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        h = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(x)
        h = self.activation(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(h)
        x = x + nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        return x


class TransformerEncoder(nn.Module):
    """Stack of post-LN encoder layers."""

    num_layers: int
    d_model: int
    num_heads: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                self.d_model,
                self.num_heads,
                self.dim_feedforward,
                self.dropout,
                dtype=self.dtype,
                name=f"layers_{i}",
            )(x, mask=mask, deterministic=deterministic)
        return x


class TransformerDecoderLayer(nn.Module):
    """Post-LN decoder layer; can return cross-attention weights.

    Mirrors the reference's ``CustomDecoderLayer``
    (HHI/models/multitask/task_prompt_model.py:20-36) which subclasses
    torch's decoder layer only to keep ``need_weights=True``.
    """

    d_model: int
    num_heads: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        tgt: jax.Array,  # (B, T, D)
        memory: jax.Array,  # (B, S, D)
        tgt_mask: Optional[jax.Array] = None,
        memory_mask: Optional[jax.Array] = None,
        is_causal: bool = True,
        deterministic: bool = True,
        return_weights: bool = False,
    ):
        sa = MultiHeadAttention(self.d_model, self.num_heads,
                                dropout_rate=self.dropout,
                                dtype=self.dtype, name="self_attn")(
            tgt, tgt, tgt, mask=tgt_mask, is_causal=is_causal,
            deterministic=deterministic
        )
        x = tgt + nn.Dropout(self.dropout)(sa, deterministic=deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        mha = MultiHeadAttention(
            self.d_model, self.num_heads, dropout_rate=self.dropout,
            dtype=self.dtype, name="multihead_attn"
        )
        if return_weights:
            ca, weights = mha(x, memory, memory, mask=memory_mask,
                              deterministic=deterministic,
                              return_weights=True)
        else:
            ca, weights = mha(x, memory, memory, mask=memory_mask,
                              deterministic=deterministic), None
        x = x + nn.Dropout(self.dropout)(ca, deterministic=deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(h)
        x = x + nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="norm3")(x)
        return (x, weights) if return_weights else x


class TransformerDecoder(nn.Module):
    num_layers: int
    d_model: int
    num_heads: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        tgt: jax.Array,
        memory: jax.Array,
        tgt_mask: Optional[jax.Array] = None,
        memory_mask: Optional[jax.Array] = None,
        is_causal: bool = True,
        deterministic: bool = True,
        return_weights: bool = False,
    ):
        weights = None
        x = tgt
        for i in range(self.num_layers):
            layer = TransformerDecoderLayer(
                self.d_model,
                self.num_heads,
                self.dim_feedforward,
                self.dropout,
                dtype=self.dtype,
                name=f"layers_{i}",
            )
            if return_weights:
                x, weights = layer(
                    x,
                    memory,
                    tgt_mask=tgt_mask,
                    memory_mask=memory_mask,
                    is_causal=is_causal,
                    deterministic=deterministic,
                    return_weights=True,
                )
            else:
                x = layer(
                    x,
                    memory,
                    tgt_mask=tgt_mask,
                    memory_mask=memory_mask,
                    is_causal=is_causal,
                    deterministic=deterministic,
                )
        return (x, weights) if return_weights else x


class MLP(nn.Module):
    """Simple MLP head: Linear → act → ... → Linear."""

    features: Tuple[int, ...]
    activation: Callable = nn.relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, f in enumerate(self.features):
            x = nn.Dense(f, dtype=self.dtype, name=f"fc{i}")(x)
            if i + 1 < len(self.features):
                x = self.activation(x)
        return x
