"""AR (action recognition) and LTA (long-term anticipation) models.

Behavioral reference: HOI/models/lta/lta_models.py —
  * ``MultiTaskSlowFast`` (:31-63): SlowFast trunk + verb/noun
    MultiTaskHead.
  * Aggregators (:109-185): Concat / Mean / Transformer (PE dropout 0.2,
    post-LN encoder with final LayerNorm, take last clip's encoding).
  * ``MultiHeadDecoder`` (:188-210): Z = NUM_ACTIONS_TO_PREDICT copies
    of a (verbs+nouns) projection over the aggregated feature, split
    into [(B, Z, #verbs), (B, Z, #nouns)].
  * ``ForecastingEncoderDecoder`` (:213-306): backbone per input clip
    (NUM_INPUT_CLIPS=2) → aggregator → decoder; ``generate(x, k)``
    draws k Categorical samples (k=1 → argmax); ``middle=True`` returns
    the aggregated feature / clip tokens for the translators.

Pathway convention: inputs are [slow (B, N, T/α, H, W, 3),
fast (B, N, T, H, W, 3)] with N = number of input clips.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from egot2x.core.registry import MODEL_REGISTRY
from egot2x.nn.common import PositionalEncoding, TransformerEncoder
from egot2x.nn.slowfast import MultiTaskHead, SlowFast

Dtype = Any


@MODEL_REGISTRY.register(name="MultiTaskSlowFast")
class MultiTaskSlowFast(nn.Module):
    """AR model: verb+noun logits from a single clip."""

    num_classes: Sequence[int] = (115, 478)
    alpha: int = 8
    beta_inv: int = 8
    depth: int = 50  # RESNET.DEPTH (50 or 101)
    dropout_rate: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pathways: List[jax.Array], train: bool = False,
                 middle: bool = False):
        feats = SlowFast(alpha=self.alpha, beta_inv=self.beta_inv,
                         depth=self.depth, dtype=self.dtype,
                         name="trunk")(pathways, train=train)
        if middle:
            return feats  # [(B, T/α, 7, 7, 2048), (B, T, 7, 7, 256)]
        return MultiTaskHead(self.num_classes, self.dropout_rate,
                             dtype=self.dtype, name="head")(feats, train=train)


class SlowFastFeature(nn.Module):
    """SlowFast + single-feature head (backbone with NUM_CLASSES=[D],
    HEAD_ACT None — ForecastingEncoderDecoder.build_clip_backbone)."""

    feature_dim: int = 2048
    alpha: int = 8
    beta_inv: int = 8
    dropout_rate: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pathways: List[jax.Array], train: bool = False,
                 middle: bool = False):
        feats = SlowFast(alpha=self.alpha, beta_inv=self.beta_inv,
                         dtype=self.dtype, name="trunk")(pathways, train=train)
        if middle:
            return feats
        out = MultiTaskHead((self.feature_dim,), self.dropout_rate, act="none",
                            dtype=self.dtype, name="head")(feats, train=train)
        return out[0]  # (B, D)


class ConcatAggregator(nn.Module):
    @nn.compact
    def __call__(self, clip_feats: List[jax.Array], middle: bool = False,
                 deterministic: bool = True):
        x = jnp.stack(clip_feats, axis=1)
        return x.reshape(x.shape[0], -1)


class MeanAggregator(nn.Module):
    @nn.compact
    def __call__(self, clip_feats: List[jax.Array], middle: bool = False,
                 deterministic: bool = True):
        return jnp.stack(clip_feats, axis=1).mean(axis=1)


class TransformerAggregator(nn.Module):
    dim: int = 2048
    num_heads: int = 8
    num_layers: int = 6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, clip_feats: List[jax.Array], middle: bool = False,
                 deterministic: bool = True):
        x = jnp.stack(clip_feats, axis=1)  # (B, N, D)
        x = PositionalEncoding(self.dim, dropout=0.2, name="pos")(
            x, deterministic=deterministic)
        x = TransformerEncoder(self.num_layers, self.dim, self.num_heads,
                               dim_feedforward=2048, dtype=self.dtype,
                               name="encoder")(x, deterministic=deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="final_ln")(x)
        if middle:
            return x  # (B, N, D) clip tokens for translators
        return x[:, -1]  # last clip's encoding


AGGREGATORS = {
    "ConcatAggregator": ConcatAggregator,
    "MeanAggregator": MeanAggregator,
    "TransformerAggregator": TransformerAggregator,
}


class MultiHeadDecoder(nn.Module):
    """Z copies of verb+noun projections (lta_models.py:188-210)."""

    num_classes: Sequence[int] = (115, 478)
    num_actions: int = 20
    dropout_rate: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        total = sum(self.num_classes)
        logits = []
        for z in range(self.num_actions):
            logits.append(nn.Dense(total, dtype=self.dtype, name=f"head_{z}")(x))
        stacked = jnp.stack(logits, axis=1)  # (B, Z, verbs+nouns)
        verb = stacked[..., : self.num_classes[0]]
        noun = stacked[..., self.num_classes[0]:]
        return [verb, noun]



@MODEL_REGISTRY.register(name="ForecastingEncoderDecoder")
class ForecastingEncoderDecoder(nn.Module):
    """LTA model: per-clip backbone → aggregator → Z-action decoder."""

    num_classes: Sequence[int] = (115, 478)
    num_actions: int = 20
    feature_dim: int = 2048
    aggregator: str = "TransformerAggregator"
    alpha: int = 8
    beta_inv: int = 8
    dropout_rate: float = 0.5
    dtype: Dtype = jnp.float32

    def setup(self):
        self.backbone = SlowFastFeature(self.feature_dim, self.alpha,
                                        self.beta_inv, self.dropout_rate,
                                        dtype=self.dtype)
        agg_cls = AGGREGATORS[self.aggregator]
        if self.aggregator == "TransformerAggregator":
            self.clip_aggregator = agg_cls(dim=self.feature_dim, dtype=self.dtype)
        else:
            self.clip_aggregator = agg_cls()
        self.decoder = MultiHeadDecoder(self.num_classes, self.num_actions,
                                        self.dropout_rate, dtype=self.dtype)

    def encode_clips(self, pathways, train=False):
        """pathways: [slow (B, N, t, h, w, 3), fast (B, N, T, h, w, 3)]."""
        n_clips = pathways[0].shape[1]
        feats = []
        for i in range(n_clips):
            clip = [p[:, i] for p in pathways]
            feats.append(self.backbone(clip, train=train))
        return feats

    def __call__(self, pathways, tgts=None, train: bool = False,
                 middle: bool = False):
        feats = self.encode_clips(pathways, train=train)
        agg = self.clip_aggregator(feats, middle=middle,
                                   deterministic=not train)
        if middle:
            return agg
        return self.decoder(agg, train=train)

    def generate(self, pathways, k: int = 1, rng: Optional[jax.Array] = None):
        """k Categorical samples per head (k=1 → argmax), shape
        (B, k, Z) per head (lta_models.py:288-306)."""
        outs = self(pathways, train=False)
        results = []
        for hi, head_logits in enumerate(outs):
            if k > 1:
                assert rng is not None
                keys = jax.random.split(jax.random.fold_in(rng, hi), k)
                preds = [jax.random.categorical(key, head_logits, axis=-1)
                         for key in keys]
            else:
                preds = [jnp.argmax(head_logits, axis=-1)]
            results.append(jnp.stack(preds, axis=1))
        return results
