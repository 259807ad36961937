"""TTM (talking-to-me) models.

Behavioral reference: HHI/models/ttm/model.py — ``BaselineLSTM``
(:58-120, video resnet18+BiLSTM last frame ⊕ ResNetSE audio → 1024→128→2)
and ``TTMBackbone`` (:20-55, ``middle=True`` → per-frame video tokens).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from egot2x.core.registry import MODEL_REGISTRY
from egot2x.nn.lstm import BiLSTM
from egot2x.nn.resnet2d import ResNet2D
from egot2x.nn.resnet_se import ResNetSE

Dtype = Any


class TTMTrunk(nn.Module):
    img_feature_dim: int = 256
    quant: bool = False  # int8 static-PTQ conv trunk (egot2x.nn.quant)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, video: jax.Array, audio: jax.Array, train: bool = False,
                 middle: bool = False, calibrate: bool = False, stem_in=None):
        n, t, h, w, c = video.shape
        frames = video.reshape(n * t, h, w, c)
        video_out = ResNet2D(num_classes=self.img_feature_dim, quant=self.quant,
                             dtype=self.dtype,
                             name="video_encoder")(frames, train=train,
                                                   calibrate=calibrate,
                                                   stem_in=stem_in)
        video_out = video_out.reshape(n, t, self.img_feature_dim)
        if middle:
            return video_out  # (N, T, 256) tokens for translators
        lstm_out = BiLSTM(self.img_feature_dim, num_layers=2, dtype=self.dtype,
                          name="lstm")(video_out)
        lstm_out = lstm_out[:, -1, :]  # LAST frame (ttm model.py:39, unlike LAM)
        audio_out = ResNetSE(dtype=self.dtype, name="audio_encoder")(audio, train=train)
        return lstm_out, audio_out


@MODEL_REGISTRY.register(name="TTMBaselineLSTM")
class TTMBaselineLSTM(nn.Module):
    """Audio-visual TTM classifier (reference BaselineLSTM in ttm/model.py)."""

    img_feature_dim: int = 256
    num_classes: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, video: jax.Array, audio: jax.Array,
                 train: bool = False) -> jax.Array:
        lstm_out, audio_out = TTMTrunk(self.img_feature_dim, dtype=self.dtype,
                                       name="trunk")(video, audio, train=train)
        x = jnp.concatenate([lstm_out, audio_out], axis=1)  # (N, 1024)
        x = nn.Dense(128, dtype=self.dtype, name="last_layer1")(x)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="last_layer2")(x)


class TTMBackbone(nn.Module):
    """Frozen TTM feature extractor for Stage-II translators."""

    img_feature_dim: int = 256
    quant: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, video: jax.Array, audio: jax.Array, middle: bool = False,
                 calibrate: bool = False, stem_in=None):
        return TTMTrunk(self.img_feature_dim, quant=self.quant,
                        dtype=self.dtype, name="trunk")(
            video, audio, train=False, middle=middle, calibrate=calibrate,
            stem_in=stem_in,
        )
