"""SE-ResNet audio encoder with attentive-statistics pooling (ResNetSE).

Behavioral reference: HHI/models/ttm/resse.py:16-178 — log-mel frontend
(here factored into :mod:`egot2x.audio.melspec`, stop-gradiented like the
reference's ``torch.no_grad()`` block), stem conv→relu→BN (note the
reference's swapped relu/BN order, preserved for parity), four SE-block
stages (32/64/128/256, strides 1/2/2/2), channel-time flatten, ASP
attentive-stat pooling, fc → 512.

NHWC layout: mel-spectrogram input is (B, n_mels, T, 1); the flatten to
the reference's (B, C·H, T) channel ordering happens via an explicit
transpose so imported torch conv1d attention weights line up.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from egot2x.audio.melspec import resse_frontend

Dtype = Any


class SELayer(nn.Module):
    channels: int
    reduction: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, H, W, C)
        y = jnp.mean(x, axis=(1, 2))
        y = nn.Dense(self.channels // self.reduction, dtype=self.dtype, name="fc0")(y)
        y = nn.relu(y)
        y = nn.Dense(self.channels, dtype=self.dtype, name="fc1")(y)
        y = jax.nn.sigmoid(y)
        return x * y[:, None, None, :]


class SEBasicBlock(nn.Module):
    filters: int
    stride: int = 1
    reduction: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        residual = x
        # Reference order: conv1 → relu → bn1 (resse.py:146-148).
        y = nn.Conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(y)
        y = norm("bn1")(y)
        y = nn.Conv(self.filters, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = norm("bn2")(y)
        y = SELayer(self.filters, self.reduction, dtype=self.dtype, name="se")(y)
        if self.stride != 1 or x.shape[-1] != self.filters:
            residual = nn.Conv(self.filters, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            residual = norm("downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNetSE(nn.Module):
    """Raw-wave → 512-d utterance embedding."""

    num_filters: Sequence[int] = (32, 64, 128, 256)
    layers: Sequence[int] = (2, 2, 2, 2)
    n_mels: int = 64
    dim_feat: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, wave: jax.Array, train: bool = False,
                 mel: jax.Array | None = None) -> jax.Array:
        """wave (B, samples) → 512-d embedding; pass ``mel`` (B, n_mels, T)
        to bypass the on-device frontend (parity tests, precomputed
        features)."""
        if mel is None:
            # Frontend under stop_gradient (reference torch.no_grad,
            # resse.py:101).
            mel = jax.lax.stop_gradient(resse_frontend(wave))  # (B, n_mels, T)
        x = mel[..., None].astype(self.dtype)  # (B, n_mels, T, 1) NHWC

        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        x = nn.Conv(self.num_filters[0], (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=True, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(x)
        x = norm("bn1")(x)
        for stage, (f, blocks) in enumerate(zip(self.num_filters, self.layers)):
            for b in range(blocks):
                stride = 2 if stage > 0 and b == 0 else 1
                x = SEBasicBlock(f, stride, dtype=self.dtype,
                                 name=f"layer{stage + 1}_{b}")(x, train=train)
        # (B, H=n_mels/8, T', C) → torch channel-major flatten (B, C*H, T')
        b, h, t, c = x.shape
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, c * h, t)

        # ASP attention: conv1d k=1 ≡ dense over the channel axis per step.
        w = jnp.swapaxes(x, 1, 2)  # (B, T', C*H)
        w = nn.Dense(128, dtype=self.dtype, name="att_fc0")(w)
        w = nn.relu(w)
        w = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="att_bn")(w)
        w = nn.Dense(c * h, dtype=self.dtype, name="att_fc1")(w)
        w = jax.nn.softmax(jnp.swapaxes(w, 1, 2), axis=2)  # (B, C*H, T') over time

        mu = jnp.sum(x * w, axis=2)
        sg = jnp.sqrt(jnp.clip(jnp.sum((x ** 2) * w, axis=2) - mu ** 2, min=1e-5))
        feat = jnp.concatenate([mu, sg], axis=1)
        return nn.Dense(self.dim_feat, dtype=self.dtype, name="fc")(feat)
