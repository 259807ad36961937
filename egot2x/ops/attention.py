"""Attention compute op with a TPU-fused path and a portable fallback.

The translator transformers in the reference run tiny sequences
(≤ ~450 tokens TTM, 48 tokens HOI — SURVEY.md §5 "long-context"), so a
flash-style streaming kernel is unnecessary; what matters on TPU is that
QK^T → softmax → PV stays fused in VMEM and feeds the MXU in one pass.
XLA already fuses this shape well; a Pallas kernel
(:mod:`egot2x.ops.pallas_attention`) is used for the larger
batched-backbone attention shapes when running on TPU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def dot_product_attention(
    q: jax.Array,  # (B, T, H, Dh)
    k: jax.Array,  # (B, S, H, Dh)
    v: jax.Array,  # (B, S, H, Dh)
    mask: Optional[jax.Array] = None,  # broadcastable to (B, H, T, S), True=keep
    is_causal: bool = False,
) -> jax.Array:
    """Multi-head scaled dot-product attention, (B, T, H, Dh) layout."""
    dh = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, dtype=jnp.float32))
    # (B, H, T, S) logits in f32 for numerically stable softmax.
    logits = jnp.einsum("bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if is_causal:
        t, s = logits.shape[-2], logits.shape[-1]
        causal = jnp.tril(jnp.ones((t, s), dtype=bool))
        logits = jnp.where(causal[None, None], logits, -jnp.inf)
    if mask is not None:
        logits = jnp.where(mask, logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1)
    # Rows that are fully masked produce NaN (softmax of all -inf); zero them.
    if mask is not None:
        probs = jnp.nan_to_num(probs)
    probs = probs.astype(v.dtype)
    return jnp.einsum("bhts,bshd->bthd", probs, v)
