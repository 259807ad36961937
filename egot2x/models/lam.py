"""LAM (looking-at-me) models.

Behavioral reference: HHI/models/lam/model.py — ``BaselineLSTM``
(:49-97), ``LAMBackbone`` (:17-46), ``GazeLSTM`` (:99-136).

Input layout is TPU-native NTHWC: (N, T=7 frames, 224, 224, 3). The
per-frame ResNet-18 runs as one batched (N·T) conv stack — the dominant
FLOPs — followed by a 2-layer BiLSTM(256) and the middle-frame head.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from egot2x.core.registry import MODEL_REGISTRY
from egot2x.nn.lstm import BiLSTM
from egot2x.nn.resnet2d import ResNet2D

Dtype = Any


class LAMTrunk(nn.Module):
    """Shared resnet18-per-frame + BiLSTM trunk."""

    img_feature_dim: int = 256
    quant: bool = False  # int8 static-PTQ conv trunk (egot2x.nn.quant)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, video: jax.Array, train: bool = False, middle: bool = False,
                 calibrate: bool = False, stem_in=None):
        n, t, h, w, c = video.shape
        frames = video.reshape(n * t, h, w, c)
        feats = ResNet2D(num_classes=self.img_feature_dim, quant=self.quant,
                         dtype=self.dtype,
                         name="base_model")(frames, train=train,
                                            calibrate=calibrate,
                                            stem_in=stem_in)
        feats = feats.reshape(n, t, self.img_feature_dim)
        if middle:
            # Per-frame token sequence for EgoT2 translators
            # (reference LAMBackbone middle=True, model.py:31-32).
            return feats
        lstm_out = BiLSTM(self.img_feature_dim, num_layers=2, dtype=self.dtype,
                          name="lstm")(feats)
        return lstm_out[:, t // 2, :]  # middle frame, (N, 512)


@MODEL_REGISTRY.register(name="BaselineLSTM")
class BaselineLSTM(nn.Module):
    """LAM classifier: trunk → 512→128→2 (no activation between, model.py:75-76)."""

    img_feature_dim: int = 256
    num_classes: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, video: jax.Array, train: bool = False) -> jax.Array:
        feat = LAMTrunk(self.img_feature_dim, dtype=self.dtype, name="trunk")(
            video, train=train
        )
        x = nn.Dense(128, dtype=self.dtype, name="last_layer1")(feat)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="last_layer2")(x)


class LAMBackbone(nn.Module):
    """Frozen feature extractor for Stage-II translators.

    ``middle=True`` → (N, T, 256) per-frame tokens; else (N, 512)
    BiLSTM middle-frame feature (reference model.py:27-35).
    """

    img_feature_dim: int = 256
    quant: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, video: jax.Array, middle: bool = False,
                 calibrate: bool = False, stem_in=None):
        # Frozen semantics: always eval-mode BN (running stats).
        return LAMTrunk(self.img_feature_dim, quant=self.quant,
                        dtype=self.dtype, name="trunk")(
            video, train=False, middle=middle, calibrate=calibrate,
            stem_in=stem_in,
        )


@MODEL_REGISTRY.register(name="GazeLSTM")
class GazeLSTM(nn.Module):
    """Gaze360-style variant — same compute graph as BaselineLSTM with a
    pretrained base (reference model.py:99-136); weights differ, graph
    does not."""

    img_feature_dim: int = 256
    num_classes: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, video: jax.Array, train: bool = False) -> jax.Array:
        feat = LAMTrunk(self.img_feature_dim, dtype=self.dtype, name="trunk")(
            video, train=train
        )
        x = nn.Dense(128, dtype=self.dtype, name="last_layer1")(feat)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="last_layer2")(x)
