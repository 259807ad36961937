"""LSTM / BiLSTM via ``lax.scan`` with torch-compatible gate layout.

Behavioral reference: the reference's LAM/TTM models wrap
``torch.nn.LSTM(256, 256, bidirectional=True, num_layers=2)``
(HHI/models/lam/model.py:55-57, HHI/models/ttm/model.py:64-66). For
checkpoint-import parity we keep torch's gate ordering in the packed
weight matrices: gates = [input, forget, cell(g), output], computed as
``W_ih @ x + b_ih + W_hh @ h + b_hh``.

TPU notes: the scan body is two (B, D) @ (D, 4D) matmuls — MXU-friendly
when D is a multiple of 128 (256 here) — and XLA unrolls/pipes the scan.
Sequences in this codebase are short (7–150 frames) so a scan, not a
chunked kernel, is the right tool.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class LSTMLayer(nn.Module):
    """Single-direction LSTM layer over (B, T, D_in) → (B, T, hidden)."""

    hidden: int
    reverse: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, t, d = x.shape
        h4 = 4 * self.hidden
        # Packed weights in torch layout: (4H, D) and (4H, H), stored
        # transposed for right-multiplication.
        w_ih = self.param("w_ih", nn.initializers.lecun_normal(), (d, h4), jnp.float32)
        w_hh = self.param("w_hh", nn.initializers.lecun_normal(), (self.hidden, h4), jnp.float32)
        b_ih = self.param("b_ih", nn.initializers.zeros, (h4,), jnp.float32)
        b_hh = self.param("b_hh", nn.initializers.zeros, (h4,), jnp.float32)
        w_ih = w_ih.astype(self.dtype)
        w_hh = w_hh.astype(self.dtype)
        bias = (b_ih + b_hh).astype(self.dtype)

        # Hoist the input projection out of the scan: one big (B*T, D)@(D,4H)
        # matmul on the MXU instead of T small ones.
        x_proj = x.reshape(b * t, d) @ w_ih
        x_proj = (x_proj + bias).reshape(b, t, h4)

        def step(carry, xp):
            h, c = carry
            gates = xp + h @ w_hh
            i, f, g, o = jnp.split(gates, 4, axis=-1)  # torch gate order
            i = jax.nn.sigmoid(i)
            f = jax.nn.sigmoid(f)
            g = jnp.tanh(g)
            o = jax.nn.sigmoid(o)
            c = f * c + i * g
            h = o * jnp.tanh(c)
            return (h, c), h

        h0 = jnp.zeros((b, self.hidden), dtype=self.dtype)
        c0 = jnp.zeros((b, self.hidden), dtype=self.dtype)
        xs = jnp.swapaxes(x_proj, 0, 1)  # (T, B, 4H) time-major for scan
        (_, _), ys = jax.lax.scan(step, (h0, c0), xs, reverse=self.reverse)
        return jnp.swapaxes(ys, 0, 1)  # (B, T, H)


class BiLSTM(nn.Module):
    """Multi-layer bidirectional LSTM, output (B, T, 2*hidden)."""

    hidden: int
    num_layers: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for layer in range(self.num_layers):
            fwd = LSTMLayer(self.hidden, reverse=False, dtype=self.dtype,
                            name=f"l{layer}_fwd")(x)
            bwd = LSTMLayer(self.hidden, reverse=True, dtype=self.dtype,
                            name=f"l{layer}_bwd")(x)
            x = jnp.concatenate([fwd, bwd], axis=-1)
        return x
