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


FLASH_MIN_TOKENS = 2048  # q_len · k_len threshold for the Pallas path


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def dot_product_attention(
    q: jax.Array,  # (B, T, H, Dh)
    k: jax.Array,  # (B, S, H, Dh)
    v: jax.Array,  # (B, S, H, Dh)
    mask: Optional[jax.Array] = None,  # broadcastable to (B, H, T, S), True=keep
    is_causal: bool = False,
) -> jax.Array:
    """Multi-head scaled dot-product attention, (B, T, H, Dh) layout.

    Long unmasked sequences on TPU route to the Pallas flash kernel
    (egot2x.ops.pallas_attention); everything else uses the XLA path.
    """
    t, s = q.shape[1], k.shape[1]
    if (mask is None and not is_causal and _on_tpu()
            and t >= FLASH_MIN_TOKENS and s >= FLASH_MIN_TOKENS):
        from egot2x.ops.pallas_attention import flash_attention

        b, _, h, dh = q.shape
        fq = jnp.swapaxes(q, 1, 2).reshape(b * h, t, dh)
        fk = jnp.swapaxes(k, 1, 2).reshape(b * h, s, dh)
        fv = jnp.swapaxes(v, 1, 2).reshape(b * h, s, dh)
        out = flash_attention(fq, fk, fv)
        return jnp.swapaxes(out.reshape(b, h, t, dh), 1, 2)
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
