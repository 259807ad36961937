"""STA (short-term anticipation) models — vestigial in the reference
(carried over from Ego4D forecasting; unused by EgoT2 training), provided
for surface completeness.

Behavioral reference: HOI/models/lta/sta_models.py:18-309 —
``ResNetSTARoIHead`` (temporal-pool each pathway, RoIAlign the boxes,
spatial max-pool, concat pathways; verb head = Linear + softmax at eval,
ttc head = Linear + softplus) and ``ShortTermAnticipationSlowFast``
(SlowFast trunk + RoI head over detected boxes).
"""

from __future__ import annotations

from typing import Any, List

import jax
import jax.numpy as jnp
from flax import linen as nn

from egot2x.core.registry import MODEL_REGISTRY
from egot2x.nn.slowfast import SlowFast
from egot2x.ops.roi_align import roi_align

Dtype = Any


class ResNetSTARoIHead(nn.Module):
    num_verbs: int
    resolution: int = 7
    spatial_scale: float = 1.0 / 32.0
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pathways: List[jax.Array], boxes: jax.Array,
                 train: bool = False):
        """pathways: s5 feature maps (B, T, H, W, C); boxes (N, 5) in
        input-image coords. Returns (verb_logits (N, V), ttc (N, 1))."""
        pooled = []
        for p in pathways:
            feat = jnp.mean(p, axis=1)  # temporal average pool → (B, H, W, C)
            rois = roi_align(feat, boxes, self.resolution, self.spatial_scale)
            pooled.append(jnp.max(rois, axis=(1, 2)))  # spatial max → (N, C)
        x = jnp.concatenate(pooled, axis=-1)
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        verb = nn.Dense(self.num_verbs, dtype=self.dtype, name="verb_proj")(x)
        if not train:
            verb = jax.nn.softmax(verb, axis=-1)
        ttc = jax.nn.softplus(nn.Dense(1, dtype=self.dtype, name="ttc_proj")(x))
        return verb, ttc


@MODEL_REGISTRY.register(name="ShortTermAnticipationSlowFast")
class ShortTermAnticipationSlowFast(nn.Module):
    num_verbs: int = 115
    alpha: int = 8
    beta_inv: int = 8
    dropout_rate: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pathways: List[jax.Array], boxes: jax.Array,
                 train: bool = False):
        feats = SlowFast(alpha=self.alpha, beta_inv=self.beta_inv,
                         dtype=self.dtype, name="trunk")(pathways, train=train)
        return ResNetSTARoIHead(self.num_verbs, dropout_rate=self.dropout_rate,
                                dtype=self.dtype, name="head")(
            feats, boxes, train=train)
