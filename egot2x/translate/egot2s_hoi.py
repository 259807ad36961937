"""EgoT2-s HOI translators: PNR/OSCC/AR/LTA cross-task token fusion.

Behavioral reference:
  * HOI/models/pnr/video_model_transfer_3task.py — PNR/OSCC-target
    3-task fusion: pnr tokens (B,16,8192→D) + oscc tokens (B,16,8192→D)
    + AR slow tokens (spatial-pooled (B,8,2048→D)) + AR fast tokens
    (adaptive-pool-to-8 (B,8,256→D)) = 48 tokens; shared LN + learned PE
    (randn); post-LN torch encoder (heads 8, ff = 2·D) with feature
    dropout (``TaskFusionMFTransformer3TaskDropout`` :213-258, the
    ts_pnr/ts_oscc model) or a pre-LN simple_vit encoder
    (``TaskFusionMFTransformer3Task`` :129-164); token mean → LN+Linear
    → 16 (keyframe) or 2 (state). Late-fusion and transfer baselines
    :67-125, :262-292.
  * HOI/models/lta/lta_models_transfer.py — AR-target 3-task fusion:
    same 48 tokens, two heads (verbs, nouns) (:100-160); transfer
    baselines Keyframe2Action/State2Action/FinetuneAction (:23-68).
  * HOI/models/lta/lta_models_lta_transfer.py — LTA-target fusion:
    ``TaskFusionMFTransformer2Task`` (:429-526, AR+LTA clip tokens,
    2·N tokens, MultiTaskHead Z-action decode + Categorical generate)
    and ``TaskFusionMFTransformerLTA4Task`` (:257-377, adds per-clip
    PNR/OSCC tokens meaned over T → 4·N tokens).

Freezing follows the structural split: backbone keys in HOI_FROZEN_KEYS
are stop-gradiented and excluded from the optimizer; the AR backbone's
*head* stays live (reference freeze_backbone_params keeps the head
trainable) by keeping it under a non-frozen key.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

import math

from egot2x.core.registry import MODEL_REGISTRY
from egot2x.models.ar_lta import SlowFastFeature, TransformerAggregator
from egot2x.models.pnr import KeyframeLocalizationResNet, StateChangeClsResNet
from egot2x.nn.common import (
    PositionalEncoding,
    TransformerDecoder,
    TransformerEncoder,
)
from egot2x.nn.simple_vit import SimpleViTEncoder
from egot2x.nn.slowfast import MultiTaskHead, SlowFast

Dtype = Any

HOI_FROZEN_KEYS = ("pnr_model", "oscc_model", "action_model", "lta_model")


def adaptive_avg_pool_time(x: jax.Array, out_t: int) -> jax.Array:
    """(B, T, D) → (B, out_t, D), torch AdaptiveAvgPool semantics."""
    b, t, d = x.shape
    if t == out_t:
        return x
    outs = []
    for i in range(out_t):
        s, e = int((i * t) // out_t), int(((i + 1) * t + out_t - 1) // out_t)
        outs.append(x[:, s:e].mean(axis=1))
    return jnp.stack(outs, axis=1)


class _HOIStreamMixin(nn.Module):
    """Backbone stream extraction shared by the HOI translators."""

    crop_size: int = 225
    alpha: int = 8
    beta_inv: int = 8
    nofreeze: bool = False
    quant: bool = False  # int8 static-PTQ backbone trunks (egot2x.nn.quant)
    dtype: Dtype = jnp.float32

    def _freeze(self, x):
        return x if self.nofreeze else jax.lax.stop_gradient(x)

    def _encode_clips_pnr(self, model, frames):
        """frames (B, N, T, S, S, 3) → (B, N, 8192) tokens meaned over T
        (reference encode_clips_pnr :340-347). Shared by the clip-wise
        translators; ``model`` is the class's frozen PNR/OSCC backbone."""
        n = frames.shape[1]
        feats = [self._freeze(model(frames[:, i], middle=True)).mean(axis=1)
                 for i in range(n)]
        return jnp.stack(feats, axis=1)

    def _encode_action_clips(self, pathways, train):
        """Per-clip frozen SlowFast + live action feature head →
        (B, N, D) clip tokens (reference encode_clips :321-337). Shared
        by every translator defining ``action_model``/``action_head``."""
        n = pathways[0].shape[1]
        feats = []
        for i in range(n):
            s5 = self.action_model([p[:, i] for p in pathways], train=False)
            s5 = [self._freeze(p) for p in s5]
            feats.append(self.action_head(s5, train=train)[0])
        return jnp.stack(feats, axis=1)

    def _pnr_tokens(self, frames, calibrate: bool = False):
        """(B, 16, 8192) per-frame tokens from the frozen PNR backbone."""
        return self._freeze(
            KeyframeLocalizationResNet(crop_size=self.crop_size,
                                       quant=self.quant, dtype=self.dtype,
                                       name="pnr_model")(
                frames, middle=True, calibrate=calibrate))

    def _oscc_tokens(self, frames, calibrate: bool = False):
        return self._freeze(
            StateChangeClsResNet(crop_size=self.crop_size, no_temp_pool=True,
                                 quant=self.quant, dtype=self.dtype,
                                 name="oscc_model")(
                frames, middle=True, calibrate=calibrate))

    def _action_token_streams(self, pathways, fast_out_t: int = 8,
                              calibrate: bool = False):
        """Frozen SlowFast s5 → slow tokens (B, T/α, 2048) and
        adaptive-pooled fast tokens (B, fast_out_t, 256)."""
        slow, fast = SlowFast(alpha=self.alpha, beta_inv=self.beta_inv,
                              quant=self.quant, dtype=self.dtype,
                              name="action_model")(
            pathways, train=False, calibrate=calibrate)
        slow_tok = self._freeze(jnp.mean(slow, axis=(2, 3)))
        fast_tok = self._freeze(
            adaptive_avg_pool_time(jnp.mean(fast, axis=(2, 3)), fast_out_t))
        return slow_tok, fast_tok


class _TokenFusionCore(nn.Module):
    """LN + learned PE + post-LN encoder + mean pool (HOI style: one
    shared LN before the PE, PE is a learned (1, L, D) parameter).

    ``norm_pooled=True`` re-applies the SAME ``ln`` to the pooled output:
    the reference builds ``linear_head = Sequential(self.ln, Linear)``
    so the pre-PE LayerNorm and the head LayerNorm are one module
    (video_model_transfer_3task.py:230-237, lta_models_transfer.py:125).
    """

    sequence_len: int
    feature_dim: int
    num_heads: int = 8
    num_layers: int = 3
    dropout: float = 0.1
    ff_multiplier: int = 2
    # explicit FF width override: the reference LTA translators leave
    # torch's dim_feedforward at its fixed default 2048
    # (lta_models_lta_transfer.py:445-448) — a multiplier cannot express
    # that at feature_dim 2048
    ff_dim: Optional[int] = None
    norm_pooled: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array, deterministic: bool = True):
        ln = nn.LayerNorm(dtype=self.dtype, name="ln")
        pe = self.param("pe", nn.initializers.normal(1.0),
                        (1, self.sequence_len, self.feature_dim), jnp.float32)
        x = ln(tokens) + pe
        x = TransformerEncoder(
            self.num_layers, self.feature_dim, self.num_heads,
            dim_feedforward=(self.ff_dim if self.ff_dim is not None
                             else self.feature_dim * self.ff_multiplier),
            dropout=self.dropout, dtype=self.dtype, name="transformer",
        )(x, deterministic=deterministic)
        pooled = x.mean(axis=1)
        return ln(pooled) if self.norm_pooled else pooled


@MODEL_REGISTRY.register(name="TaskFusionMFTransformer3TaskDropout")
class TaskFusionMFTransformer3TaskDropout(_HOIStreamMixin):
    """The ts_pnr / ts_oscc translator (48-token mid fusion + feature
    dropout). target='keyframe' → 16 logits, 'state' → 2."""

    target: str = "keyframe"
    feature_dim: int = 128
    num_layers: int = 1
    num_heads: int = 8
    feat_dropout: float = 0.5
    transformer_dropout: float = 0.1

    @nn.compact
    def __call__(self, frames, pathways, train: bool = False,
                 calibrate: bool = False):
        det = not train
        pnr = nn.Dense(self.feature_dim, dtype=self.dtype, name="proj1")(
            self._pnr_tokens(frames, calibrate=calibrate))
        oscc = nn.Dense(self.feature_dim, dtype=self.dtype, name="proj2")(
            self._oscc_tokens(frames, calibrate=calibrate))
        slow_tok, fast_tok = self._action_token_streams(pathways,
                                                        calibrate=calibrate)
        slow = nn.Dense(self.feature_dim, dtype=self.dtype, name="proj3_slow")(slow_tok)
        fast = nn.Dense(self.feature_dim, dtype=self.dtype, name="proj3_fast")(fast_tok)
        dp = nn.Dropout(self.feat_dropout)
        streams = [dp(s, deterministic=det) for s in (pnr, oscc, slow, fast)]
        tokens = jnp.concatenate(streams, axis=1)
        # norm_pooled ties the head LN to the core's pre-PE LN — the
        # reference shares one module (video_model_transfer_3task.py:230-237).
        pooled = _TokenFusionCore(
            tokens.shape[1], self.feature_dim, self.num_heads, self.num_layers,
            self.transformer_dropout, norm_pooled=True, dtype=self.dtype,
            name="core",
        )(tokens, deterministic=det)
        n_out = 16 if self.target == "keyframe" else 2
        return nn.Dense(n_out, dtype=self.dtype, name="head_fc")(pooled)


@MODEL_REGISTRY.register(name="ARTaskFusionMFTransformer3Task")
class ARTaskFusionMFTransformer3Task(_HOIStreamMixin):
    """AR-target 48-token fusion → verb+noun logits
    (lta_models_transfer.py TaskFusionMFTransformer3Task)."""

    num_classes: Sequence[int] = (115, 478)
    feature_dim: int = 256
    num_layers: int = 3
    num_heads: int = 8
    dropout: float = 0.1

    @nn.compact
    def __call__(self, pathways, frames, train: bool = False):
        det = not train
        pnr = nn.Dense(self.feature_dim, dtype=self.dtype, name="proj1")(
            self._pnr_tokens(frames))
        oscc = nn.Dense(self.feature_dim, dtype=self.dtype, name="proj2")(
            self._oscc_tokens(frames))
        slow_tok, fast_tok = self._action_token_streams(pathways)
        slow = nn.Dense(self.feature_dim, dtype=self.dtype, name="proj3_slow")(slow_tok)
        fast = nn.Dense(self.feature_dim, dtype=self.dtype, name="proj3_fast")(fast_tok)
        tokens = jnp.concatenate([pnr, oscc, slow, fast], axis=1)
        # Both verb/noun heads are Sequential(self.ln, Linear) in the
        # reference (lta_models_transfer.py:125-127) — shared with the
        # pre-PE LN, hence norm_pooled.
        pooled = _TokenFusionCore(
            tokens.shape[1], self.feature_dim, self.num_heads, self.num_layers,
            self.dropout, ff_multiplier=8, norm_pooled=True, dtype=self.dtype,
            name="core",
        )(tokens, deterministic=det)
        return [
            nn.Dense(self.num_classes[0], dtype=self.dtype, name="head_verb")(pooled),
            nn.Dense(self.num_classes[1], dtype=self.dtype, name="head_noun")(pooled),
        ]


class _LtaDecode(nn.Module):
    """MultiTaskHead Z-action decode shared by the LTA translators."""

    num_classes: Sequence[int] = (115, 478)
    num_actions: int = 20
    dropout_rate: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        total = sum(self.num_classes)
        logits = jnp.stack([
            nn.Dense(total, dtype=self.dtype, name=f"head_{z}")(x)
            for z in range(self.num_actions)
        ], axis=1)
        return [logits[..., : self.num_classes[0]],
                logits[..., self.num_classes[0]:]]


def _categorical_generate(outs, k, rng):
    results = []
    for hi, head_logits in enumerate(outs):
        if k > 1:
            keys = jax.random.split(jax.random.fold_in(rng, hi), k)
            preds = [jax.random.categorical(key, head_logits, axis=-1)
                     for key in keys]
        else:
            preds = [jnp.argmax(head_logits, axis=-1)]
        results.append(jnp.stack(preds, axis=1))
    return results


@MODEL_REGISTRY.register(name="TaskFusionMFTransformer2TaskLTA")
class TaskFusionMFTransformer2TaskLTA(_HOIStreamMixin):
    """LTA-target 2-task fusion: AR clip features + LTA aggregator clip
    tokens (2·N tokens) → Z-action decode (lta_models_lta_transfer.py:429-526).

    The AR backbone's feature head stays trainable (non-frozen key
    ``action_head``), matching freeze_backbone_params semantics."""

    num_classes: Sequence[int] = (115, 478)
    num_actions: int = 20
    num_input_clips: int = 2
    feature_dim: int = 2048
    lta_dim: int = 2048  # the LTA backbone/aggregator native width
    num_layers: int = 1
    num_heads: int = 8
    dropout: float = 0.1

    def setup(self):
        self.action_model = SlowFast(alpha=self.alpha, beta_inv=self.beta_inv,
                                     dtype=self.dtype)
        self.action_head = MultiTaskHead((self.feature_dim,), 0.5, act="none",
                                         dtype=self.dtype)
        self.lta_model = _FrozenLtaEncoder(self.lta_dim, self.alpha,
                                           self.beta_inv, dtype=self.dtype)
        # proj_lta is Identity at matching widths (reference :438-440)
        if self.feature_dim != self.lta_dim:
            self.proj_lta = nn.Dense(self.feature_dim, dtype=self.dtype)
        # torch-default FF width 2048 (lta_models_lta_transfer.py:445)
        self.core = _TokenFusionCore(
            self.num_input_clips * 2, self.feature_dim, self.num_heads,
            self.num_layers, self.dropout, ff_dim=2048, dtype=self.dtype)
        self.decoder = _LtaDecode(self.num_classes, self.num_actions,
                                  dtype=self.dtype)

    def __call__(self, pathways, tgts=None, train: bool = False):
        feat_action = self._encode_action_clips(pathways, train)
        feat_lta = self._freeze(self.lta_model(pathways))
        if self.feature_dim != self.lta_dim:
            feat_lta = self.proj_lta(feat_lta)
        tokens = jnp.concatenate([feat_action, feat_lta], axis=1)
        pooled = self.core(tokens, deterministic=not train)
        return self.decoder(pooled, train=train)

    def generate(self, pathways, k: int = 1, rng: Optional[jax.Array] = None):
        return _categorical_generate(self(pathways, train=False), k, rng)


class _FrozenLtaEncoder(nn.Module):
    """Frozen LTA backbone+aggregator producing clip tokens (B, N, D)."""

    feature_dim: int = 2048
    alpha: int = 8
    beta_inv: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pathways):
        n = pathways[0].shape[1]
        backbone = SlowFastFeature(self.feature_dim, self.alpha, self.beta_inv,
                                   dtype=self.dtype, name="backbone")
        feats = [backbone([p[:, i] for p in pathways], train=False)
                 for i in range(n)]
        return TransformerAggregator(dim=self.feature_dim, dtype=self.dtype,
                                     name="clip_aggregator")(
            feats, middle=True, deterministic=True)


@MODEL_REGISTRY.register(name="TaskFusionMFTransformerLTA4Task")
class TaskFusionMFTransformerLTA4Task(_HOIStreamMixin):
    """LTA-target 4-task fusion: per-clip PNR + OSCC tokens (meaned over
    T) + AR clip features + LTA clip tokens = 4·N tokens
    (lta_models_lta_transfer.py:257-377)."""

    num_classes: Sequence[int] = (115, 478)
    num_actions: int = 20
    num_input_clips: int = 2
    feature_dim: int = 2048
    lta_dim: int = 2048  # the LTA backbone/aggregator native width
    num_layers: int = 1
    num_heads: int = 8
    dropout: float = 0.1

    def setup(self):
        self.pnr_model = KeyframeLocalizationResNet(crop_size=self.crop_size,
                                                    dtype=self.dtype)
        self.oscc_model = StateChangeClsResNet(crop_size=self.crop_size,
                                               no_temp_pool=True, dtype=self.dtype)
        self.action_model = SlowFast(alpha=self.alpha, beta_inv=self.beta_inv,
                                     dtype=self.dtype)
        self.action_head = MultiTaskHead((self.feature_dim,), 0.5, act="none",
                                         dtype=self.dtype)
        # the LTA backbone/aggregator is always 2048-wide; the 4-task
        # translator ALWAYS projects its tokens (reference :271), unlike
        # the 2-task variant's Identity-at-2048
        self.lta_model = _FrozenLtaEncoder(self.lta_dim, self.alpha,
                                           self.beta_inv, dtype=self.dtype)
        self.proj_pnr = nn.Dense(self.feature_dim, dtype=self.dtype)
        self.proj_oscc = nn.Dense(self.feature_dim, dtype=self.dtype)
        self.proj_lta = nn.Dense(self.feature_dim, dtype=self.dtype)
        # torch-default FF width 2048 (lta_models_lta_transfer.py:273-275)
        self.core = _TokenFusionCore(
            self.num_input_clips * 4, self.feature_dim, self.num_heads,
            self.num_layers, self.dropout, ff_dim=2048, dtype=self.dtype)
        self.decoder = _LtaDecode(self.num_classes, self.num_actions,
                                  dtype=self.dtype)

    def __call__(self, pathways, frames_pnr, tgts=None, train: bool = False):
        feat_pnr = self.proj_pnr(self._encode_clips_pnr(self.pnr_model, frames_pnr))
        feat_oscc = self.proj_oscc(self._encode_clips_pnr(self.oscc_model, frames_pnr))
        feat_action = self._encode_action_clips(pathways, train)
        feat_lta = self.proj_lta(self._freeze(self.lta_model(pathways)))
        tokens = jnp.concatenate([feat_pnr, feat_oscc, feat_action, feat_lta], axis=1)
        pooled = self.core(tokens, deterministic=not train)
        return self.decoder(pooled, train=train)

    def generate(self, pathways, frames_pnr, k: int = 1,
                 rng: Optional[jax.Array] = None):
        return _categorical_generate(self(pathways, frames_pnr, train=False), k, rng)


# ---- transfer / late-fusion baselines ----------------------------------

@MODEL_REGISTRY.register(name="Action2State")
class Action2State(_HOIStreamMixin):
    """AR feature → OSCC logits (video_model_transfer_3task.py:262-275)."""

    feature_dim: int = 2048

    @nn.compact
    def __call__(self, frames, pathways, train: bool = False):
        slow, fast = SlowFast(alpha=self.alpha, beta_inv=self.beta_inv,
                              dtype=self.dtype, name="action_model")(
            pathways, train=False)
        feat = self._freeze(MultiTaskHead((self.feature_dim,), 0.5, act="none",
                                          dtype=self.dtype, name="action_head")(
            [slow, fast], train=train)[0])
        return nn.Dense(2, dtype=self.dtype, name="fc1")(nn.relu(feat))


@MODEL_REGISTRY.register(name="Action2Keyframe")
class Action2Keyframe(_HOIStreamMixin):
    feature_dim: int = 2048

    @nn.compact
    def __call__(self, frames, pathways, train: bool = False):
        slow, fast = SlowFast(alpha=self.alpha, beta_inv=self.beta_inv,
                              dtype=self.dtype, name="action_model")(
            pathways, train=False)
        feat = self._freeze(MultiTaskHead((self.feature_dim,), 0.5, act="none",
                                          dtype=self.dtype, name="action_head")(
            [slow, fast], train=train)[0])
        return nn.Dense(16, dtype=self.dtype, name="fc1")(nn.relu(feat))


class _DupFeatHead(nn.Module):
    """cat(feat, feat) → fc1(2·8192→512) → relu → fc2 (the reference's
    dimension-consistency trick, video_model_transfer.py:133-216)."""

    num_classes: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat):
        feat = jnp.concatenate([feat, feat], axis=1)
        out = nn.relu(nn.Dense(512, dtype=self.dtype, name="fc1")(feat))
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc2")(out)


@MODEL_REGISTRY.register(name="Keyframe2State")
class Keyframe2State(_HOIStreamMixin):
    """PNR tokens → OSCC logits (video_model_transfer.py:133-150)."""

    @nn.compact
    def __call__(self, frames, pathways=None, train: bool = False):
        tokens = self._pnr_tokens(frames).mean(axis=1)
        return _DupFeatHead(2, dtype=self.dtype, name="head")(tokens)


@MODEL_REGISTRY.register(name="State2Keyframe")
class State2Keyframe(_HOIStreamMixin):
    @nn.compact
    def __call__(self, frames, pathways=None, train: bool = False):
        tokens = self._oscc_tokens(frames).mean(axis=1)
        return _DupFeatHead(16, dtype=self.dtype, name="head")(tokens)


@MODEL_REGISTRY.register(name="FinetuneState")
class FinetuneState(_HOIStreamMixin):
    """Frozen OSCC features + trainable linear head (:175-193)."""

    @nn.compact
    def __call__(self, frames, pathways=None, train: bool = False):
        tokens = self._oscc_tokens(frames).mean(axis=1)
        return _DupFeatHead(2, dtype=self.dtype, name="head")(tokens)


@MODEL_REGISTRY.register(name="FinetuneKeyframe")
class FinetuneKeyframe(_HOIStreamMixin):
    @nn.compact
    def __call__(self, frames, pathways=None, train: bool = False):
        tokens = self._pnr_tokens(frames).mean(axis=1)
        return _DupFeatHead(16, dtype=self.dtype, name="head")(tokens)


@MODEL_REGISTRY.register(name="TaskFusionMFTransformer2TaskPnr")
class TaskFusionMFTransformer2TaskPnr(_HOIStreamMixin):
    """PNR+OSCC 32-token mid fusion (reference TaskFusionMFTransformer
    / TaskFusionMFTransformerDropout, video_model_transfer.py:45-107)."""

    target: str = "keyframe"
    feature_dim: int = 128
    num_layers: int = 1
    num_heads: int = 8
    feat_dropout: float = 0.5
    transformer_dropout: float = 0.1

    @nn.compact
    def __call__(self, frames, pathways=None, train: bool = False):
        det = not train
        dp = nn.Dropout(self.feat_dropout)
        pnr = dp(nn.Dense(self.feature_dim, dtype=self.dtype, name="proj1")(
            self._pnr_tokens(frames)), deterministic=det)
        oscc = dp(nn.Dense(self.feature_dim, dtype=self.dtype, name="proj2")(
            self._oscc_tokens(frames)), deterministic=det)
        tokens = jnp.concatenate([pnr, oscc], axis=1)
        pooled = _TokenFusionCore(
            tokens.shape[1], self.feature_dim, self.num_heads, self.num_layers,
            self.transformer_dropout, dtype=self.dtype, name="core",
        )(tokens, deterministic=det)
        n_out = 16 if self.target == "keyframe" else 2
        return nn.Dense(n_out, dtype=self.dtype, name="head_fc")(pooled)


@MODEL_REGISTRY.register(name="TaskFusionLFLinearPnr")
class TaskFusionLFLinearPnr(_HOIStreamMixin):
    """PNR+OSCC late fusion (video_model_transfer.py:109-130)."""

    target: str = "keyframe"

    @nn.compact
    def __call__(self, frames, pathways=None, train: bool = False):
        pnr = self._pnr_tokens(frames).mean(axis=1)
        oscc = self._oscc_tokens(frames).mean(axis=1)
        feat = jnp.concatenate([pnr, oscc], axis=1)
        out = nn.relu(nn.Dense(512, dtype=self.dtype, name="fc1")(feat))
        n_out = 16 if self.target == "keyframe" else 2
        return nn.Dense(n_out, dtype=self.dtype, name="fc2")(out)


@MODEL_REGISTRY.register(name="Keyframe2Action")
class Keyframe2Action(_HOIStreamMixin):
    num_classes: Sequence[int] = (115, 478)

    @nn.compact
    def __call__(self, pathways, frames, train: bool = False):
        x = self._pnr_tokens(frames).mean(axis=1)
        return [nn.Dense(self.num_classes[0], dtype=self.dtype, name="fc1")(x),
                nn.Dense(self.num_classes[1], dtype=self.dtype, name="fc2")(x)]


@MODEL_REGISTRY.register(name="State2Action")
class State2Action(_HOIStreamMixin):
    num_classes: Sequence[int] = (115, 478)

    @nn.compact
    def __call__(self, pathways, frames, train: bool = False):
        x = self._oscc_tokens(frames).mean(axis=1)
        return [nn.Dense(self.num_classes[0], dtype=self.dtype, name="fc1")(x),
                nn.Dense(self.num_classes[1], dtype=self.dtype, name="fc2")(x)]


# ---- PNR/OSCC-target 3-task variants (video_model_transfer_3task.py) ---

@MODEL_REGISTRY.register(name="TaskFusionMFTransformer3TaskPnr")
class TaskFusionMFTransformer3TaskPnr(_HOIStreamMixin):
    """48-token mid fusion through the pre-LN simple_vit encoder
    (video_model_transfer_3task.py TaskFusionMFTransformer3Task
    :129-164: dim 256, depth 3, heads 8, dim_head 128, mlp 512; no
    feature dropout; head = Sequential(self.ln, Linear) sharing the
    pre-PE LN)."""

    target: str = "keyframe"
    feature_dim: int = 256
    depth: int = 3
    num_heads: int = 8
    dim_head: int = 128
    mlp_dim: int = 512

    @nn.compact
    def __call__(self, frames, pathways, train: bool = False):
        pnr = nn.Dense(self.feature_dim, dtype=self.dtype, name="proj1")(
            self._pnr_tokens(frames))
        oscc = nn.Dense(self.feature_dim, dtype=self.dtype, name="proj2")(
            self._oscc_tokens(frames))
        slow_tok, fast_tok = self._action_token_streams(pathways)
        slow = nn.Dense(self.feature_dim, dtype=self.dtype, name="proj3_slow")(slow_tok)
        fast = nn.Dense(self.feature_dim, dtype=self.dtype, name="proj3_fast")(fast_tok)
        tokens = jnp.concatenate([pnr, oscc, slow, fast], axis=1)
        ln = nn.LayerNorm(dtype=self.dtype, name="ln")
        pe = self.param("pe", nn.initializers.normal(1.0),
                        (1, tokens.shape[1], self.feature_dim), jnp.float32)
        x = ln(tokens) + pe
        x = SimpleViTEncoder(self.feature_dim, self.depth, self.num_heads,
                             self.dim_head, self.mlp_dim, dtype=self.dtype,
                             name="transformer")(x)
        pooled = ln(x.mean(axis=1))  # shared-LN head (reference :237)
        n_out = 16 if self.target == "keyframe" else 2
        return nn.Dense(n_out, dtype=self.dtype, name="head_fc")(pooled)


@MODEL_REGISTRY.register(name="TaskFusionLFLinear3TaskPnr")
class TaskFusionLFLinear3TaskPnr(_HOIStreamMixin):
    """Late fusion over token means of all four streams at dim 512
    (video_model_transfer_3task.py TaskFusionLFLinear3Task :93-125:
    proj to 512, concat on the TOKEN axis, token mean, relu, fc)."""

    target: str = "keyframe"
    feature_dim: int = 512

    @nn.compact
    def __call__(self, frames, pathways, train: bool = False):
        pnr = nn.Dense(self.feature_dim, dtype=self.dtype, name="proj1")(
            self._pnr_tokens(frames))
        oscc = nn.Dense(self.feature_dim, dtype=self.dtype, name="proj2")(
            self._oscc_tokens(frames))
        slow_tok, fast_tok = self._action_token_streams(pathways)
        slow = nn.Dense(self.feature_dim, dtype=self.dtype, name="proj3_slow")(slow_tok)
        fast = nn.Dense(self.feature_dim, dtype=self.dtype, name="proj3_fast")(fast_tok)
        feat = jnp.concatenate([pnr, oscc, slow, fast], axis=1).mean(axis=1)
        n_out = 16 if self.target == "keyframe" else 2
        return nn.Dense(n_out, dtype=self.dtype, name="fc1")(nn.relu(feat))


@MODEL_REGISTRY.register(name="TaskFusionLFLinear3TaskSimple")
class TaskFusionLFLinear3TaskSimple(_HOIStreamMixin):
    """Late fusion with the AR feature head kept live
    (video_model_transfer_3task.py :65-90: pnr/oscc token means → proj D,
    AR head feature (with_head, TRANSLATION_INPUT_FEATURES out), concat
    3·D → relu → fc)."""

    target: str = "keyframe"
    feature_dim: int = 128

    @nn.compact
    def __call__(self, frames, pathways, train: bool = False):
        pnr = nn.Dense(self.feature_dim, dtype=self.dtype, name="proj1")(
            self._pnr_tokens(frames).mean(axis=1))
        oscc = nn.Dense(self.feature_dim, dtype=self.dtype, name="proj2")(
            self._oscc_tokens(frames).mean(axis=1))
        slow, fast = SlowFast(alpha=self.alpha, beta_inv=self.beta_inv,
                              dtype=self.dtype, name="action_model")(
            pathways, train=False)
        action = MultiTaskHead((self.feature_dim,), 0.5, act="none",
                               dtype=self.dtype, name="action_head")(
            [self._freeze(slow), self._freeze(fast)], train=train)[0]
        feat = jnp.concatenate([pnr, oscc, action], axis=1)
        n_out = 16 if self.target == "keyframe" else 2
        return nn.Dense(n_out, dtype=self.dtype, name="fc1")(nn.relu(feat))


@MODEL_REGISTRY.register(name="TaskFusionLFTransformer3TaskDropout")
class TaskFusionLFTransformer3TaskDropout(_HOIStreamMixin):
    """Late-fusion transformer over 3 stream tokens with feature dropout
    (video_model_transfer_3task.py :167-210: pnr/oscc token means +
    AR head feature, stack → 3 tokens, ln+pe, post-LN encoder ff=2·D,
    shared-LN head)."""

    target: str = "keyframe"
    feature_dim: int = 128
    num_layers: int = 1
    num_heads: int = 8
    feat_dropout: float = 0.5
    transformer_dropout: float = 0.1

    @nn.compact
    def __call__(self, frames, pathways, train: bool = False):
        det = not train
        dp = nn.Dropout(self.feat_dropout)
        pnr = dp(nn.Dense(self.feature_dim, dtype=self.dtype, name="proj1")(
            self._pnr_tokens(frames).mean(axis=1)), deterministic=det)
        oscc = dp(nn.Dense(self.feature_dim, dtype=self.dtype, name="proj2")(
            self._oscc_tokens(frames).mean(axis=1)), deterministic=det)
        slow, fast = SlowFast(alpha=self.alpha, beta_inv=self.beta_inv,
                              dtype=self.dtype, name="action_model")(
            pathways, train=False)
        action = MultiTaskHead((self.feature_dim,), 0.5, act="none",
                               dtype=self.dtype, name="action_head")(
            [self._freeze(slow), self._freeze(fast)], train=train)[0]
        action = dp(action, deterministic=det)
        tokens = jnp.stack([pnr, oscc, action], axis=1)  # (B, 3, D)
        pooled = _TokenFusionCore(
            3, self.feature_dim, self.num_heads, self.num_layers,
            self.transformer_dropout, norm_pooled=True, dtype=self.dtype,
            name="core",
        )(tokens, deterministic=det)
        n_out = 16 if self.target == "keyframe" else 2
        return nn.Dense(n_out, dtype=self.dtype, name="head_fc")(pooled)


# ---- AR-target transfer variants (lta_models_transfer.py) --------------

@MODEL_REGISTRY.register(name="FinetuneAction")
class FinetuneAction(_HOIStreamMixin):
    """Frozen SlowFast middle features → verb/noun heads
    (lta_models_transfer.py :52-70: slow pooled to (2,1,1) → 4096, fast
    pooled to (16,1,1) → 4096, concat 8192 → fc1/fc2)."""

    num_classes: Sequence[int] = (115, 478)

    @nn.compact
    def __call__(self, pathways, frames=None, train: bool = False):
        slow, fast = SlowFast(alpha=self.alpha, beta_inv=self.beta_inv,
                              dtype=self.dtype, name="action_model")(
            pathways, train=False)
        b = slow.shape[0]
        slow_tok = self._freeze(jnp.mean(slow, axis=(2, 3)))  # (B, Ts, 2048)
        fast_tok = self._freeze(jnp.mean(fast, axis=(2, 3)))  # (B, Tf, 256)
        # reference flattens the (B, C, T', 1, 1) pooled map with
        # reshape(bs, -1) — CHANNEL-major [c0t0, c0t1, ...], so swap
        # (T', C) -> (C, T') before flattening or fc weights would be
        # permuted vs reference checkpoints (lta_models_transfer.py:64-66)
        feat_slow = jnp.swapaxes(
            adaptive_avg_pool_time(slow_tok, 2), 1, 2).reshape(b, -1)
        feat_fast = jnp.swapaxes(
            adaptive_avg_pool_time(fast_tok, 16), 1, 2).reshape(b, -1)
        x = jnp.concatenate([feat_slow, feat_fast], axis=1)  # (B, 8192)
        return [nn.Dense(self.num_classes[0], dtype=self.dtype, name="fc1")(x),
                nn.Dense(self.num_classes[1], dtype=self.dtype, name="fc2")(x)]


@MODEL_REGISTRY.register(name="LTA2Action")
class LTA2Action(_HOIStreamMixin):
    """Frozen LTA encoder clip features → verb/noun heads
    (lta_models_transfer.py :148-173: (B, N, 2048) → flatten →
    fc(→1024) → relu → linear_head1/2)."""

    num_classes: Sequence[int] = (115, 478)
    num_input_clips: int = 2
    feature_dim: int = 1024

    @nn.compact
    def __call__(self, pathways, frames=None, train: bool = False):
        lta = _FrozenLtaEncoder(2048, self.alpha, self.beta_inv,
                                dtype=self.dtype, name="lta_model")
        x_lta = [p[:, : self.num_input_clips] for p in pathways]
        feat = self._freeze(lta(x_lta))  # (B, N, 2048)
        b = feat.shape[0]
        out = nn.relu(nn.Dense(self.feature_dim, dtype=self.dtype, name="fc")(
            feat.reshape(b, -1)))
        return [
            nn.Dense(self.num_classes[0], dtype=self.dtype, name="linear_head1")(out),
            nn.Dense(self.num_classes[1], dtype=self.dtype, name="linear_head2")(out),
        ]


@MODEL_REGISTRY.register(name="TaskFusionMFTransformer2TaskAR")
class TaskFusionMFTransformer2TaskAR(_HOIStreamMixin):
    """AR-target 2-task fusion: last-clip SlowFast slow/fast tokens +
    LTA clip tokens → 18-token encoder → shared-LN verb/noun heads
    (lta_models_transfer.py :176-236)."""

    num_classes: Sequence[int] = (115, 478)
    num_input_clips: int = 2
    feature_dim: int = 256
    num_layers: int = 3
    num_heads: int = 8
    dropout: float = 0.1

    @nn.compact
    def __call__(self, pathways, frames=None, train: bool = False):
        det = not train
        # last input clip drives the AR stream (reference x1[:, -1])
        clip = [p[:, -1] for p in pathways]
        slow, fast = SlowFast(alpha=self.alpha, beta_inv=self.beta_inv,
                              dtype=self.dtype, name="action_model")(
            clip, train=False)
        slow_tok = self._freeze(jnp.mean(slow, axis=(2, 3)))
        fast_tok = self._freeze(
            adaptive_avg_pool_time(jnp.mean(fast, axis=(2, 3)), 8))
        lta = _FrozenLtaEncoder(2048, self.alpha, self.beta_inv,
                                dtype=self.dtype, name="lta_model")
        x_lta = [p[:, : self.num_input_clips] for p in pathways]
        feat_lta = self._freeze(lta(x_lta))  # (B, N, 2048)
        tokens = jnp.concatenate([
            nn.Dense(self.feature_dim, dtype=self.dtype, name="proj_slow")(slow_tok),
            nn.Dense(self.feature_dim, dtype=self.dtype, name="proj_fast")(fast_tok),
            nn.Dense(self.feature_dim, dtype=self.dtype, name="proj_lta")(feat_lta),
        ], axis=1)  # (B, Ts+8+N, D)
        pooled = _TokenFusionCore(
            tokens.shape[1], self.feature_dim, self.num_heads, self.num_layers,
            self.dropout, norm_pooled=True, dtype=self.dtype, name="core",
        )(tokens, deterministic=det)
        return [
            nn.Dense(self.num_classes[0], dtype=self.dtype, name="head_verb")(pooled),
            nn.Dense(self.num_classes[1], dtype=self.dtype, name="head_noun")(pooled),
        ]


# ---- LTA-target transfer variants (lta_models_lta_transfer.py) ---------

@MODEL_REGISTRY.register(name="FinetuneLTA")
class FinetuneLTA(_HOIStreamMixin):
    """Frozen LTA encoder features → MultiTaskHead Z-action decode
    (lta_models_lta_transfer.py :381-427: (B, N, 2048) flattened →
    head over 2048·N)."""

    num_classes: Sequence[int] = (115, 478)
    num_actions: int = 20
    num_input_clips: int = 2

    def setup(self):
        self.lta_model = _FrozenLtaEncoder(2048, self.alpha, self.beta_inv,
                                           dtype=self.dtype)
        self.decoder = _LtaDecode(self.num_classes, self.num_actions,
                                  dtype=self.dtype)

    def __call__(self, pathways, tgts=None, train: bool = False):
        feat = self._freeze(self.lta_model(pathways))  # (B, N, 2048)
        return self.decoder(feat.reshape(feat.shape[0], -1), train=train)

    def generate(self, pathways, k: int = 1, rng: Optional[jax.Array] = None):
        return _categorical_generate(self(pathways, train=False), k, rng)


class _Clip2LTA(_HOIStreamMixin):
    """Shared body of Keyframe2LTA / State2LTA: per-clip frozen PNR-family
    tokens meaned over T → proj D → flatten N·D → MultiTaskHead decode
    (lta_models_lta_transfer.py :22-143)."""

    num_classes: Sequence[int] = (115, 478)
    num_actions: int = 20
    feature_dim: int = 128
    kind: str = "pnr"

    @nn.compact
    def __call__(self, pathways, frames_pnr, tgts=None, train: bool = False):
        if self.kind == "pnr":
            backbone = KeyframeLocalizationResNet(
                crop_size=self.crop_size, dtype=self.dtype, name="pnr_model")
        else:
            # Reference sets NO_TEMP_POOL=False here (:33), so each
            # clip's middle output is the single temporally-pooled token.
            backbone = StateChangeClsResNet(
                crop_size=self.crop_size, no_temp_pool=False,
                dtype=self.dtype, name="oscc_model")
        n = frames_pnr.shape[1]
        feats = [self._freeze(backbone(frames_pnr[:, i], middle=True)
                              ).mean(axis=1) for i in range(n)]
        x = nn.Dense(self.feature_dim, dtype=self.dtype, name="proj")(
            jnp.stack(feats, axis=1))  # (B, N, D)
        return _LtaDecode(self.num_classes, self.num_actions,
                          dtype=self.dtype, name="decoder")(
            x.reshape(x.shape[0], -1), train=train)

    def generate(self, pathways, frames_pnr, k: int = 1,
                 rng: Optional[jax.Array] = None):
        return _categorical_generate(self(pathways, frames_pnr, train=False),
                                     k, rng)


@MODEL_REGISTRY.register(name="Keyframe2LTA")
class Keyframe2LTA(_Clip2LTA):
    kind: str = "pnr"


@MODEL_REGISTRY.register(name="State2LTA")
class State2LTA(_Clip2LTA):
    kind: str = "oscc"


@MODEL_REGISTRY.register(name="TaskFusionLFLinear4Task")
class TaskFusionLFLinear4Task(_HOIStreamMixin):
    """LTA-target late fusion of all four HOI streams
    (lta_models_lta_transfer.py :145-254: per-clip pnr/oscc token means
    → proj D → mean over clips; AR feature head (D out) meaned; LTA
    tokens → proj D → meaned; concat 4·D → relu → fc(D) → relu →
    MultiTaskHead decode)."""

    num_classes: Sequence[int] = (115, 478)
    num_actions: int = 20
    feature_dim: int = 128

    def setup(self):
        self.pnr_model = KeyframeLocalizationResNet(crop_size=self.crop_size,
                                                    dtype=self.dtype)
        self.oscc_model = StateChangeClsResNet(crop_size=self.crop_size,
                                               no_temp_pool=False,
                                               dtype=self.dtype)
        self.action_model = SlowFast(alpha=self.alpha, beta_inv=self.beta_inv,
                                     dtype=self.dtype)
        self.action_head = MultiTaskHead((self.feature_dim,), 0.5, act="none",
                                         dtype=self.dtype)
        self.lta_model = _FrozenLtaEncoder(2048, self.alpha, self.beta_inv,
                                           dtype=self.dtype)
        self.proj_pnr = nn.Dense(self.feature_dim, dtype=self.dtype)
        self.proj_oscc = nn.Dense(self.feature_dim, dtype=self.dtype)
        self.proj_lta = nn.Dense(self.feature_dim, dtype=self.dtype)
        self.fc = nn.Dense(self.feature_dim, dtype=self.dtype)
        self.decoder = _LtaDecode(self.num_classes, self.num_actions,
                                  dtype=self.dtype)

    def __call__(self, pathways, frames_pnr, tgts=None, train: bool = False):
        feat_pnr = self.proj_pnr(
            self._encode_clips_pnr(self.pnr_model, frames_pnr)).mean(axis=1)
        feat_oscc = self.proj_oscc(
            self._encode_clips_pnr(self.oscc_model, frames_pnr)).mean(axis=1)
        feat_action = self._encode_action_clips(pathways, train).mean(axis=1)
        feat_lta = self.proj_lta(
            self._freeze(self.lta_model(pathways))).mean(axis=1)
        feat = jnp.concatenate(
            [feat_pnr, feat_oscc, feat_action, feat_lta], axis=1)
        out = nn.relu(self.fc(nn.relu(feat)))
        return self.decoder(out, train=train)

    def generate(self, pathways, frames_pnr, k: int = 1,
                 rng: Optional[jax.Array] = None):
        return _categorical_generate(self(pathways, frames_pnr, train=False),
                                     k, rng)


@MODEL_REGISTRY.register(name="TaskFusionMFTransformer2TaskSeqDecoder")
class TaskFusionMFTransformer2TaskSeqDecoder(_HOIStreamMixin):
    """LTA-target 2-task fusion with a seq-label decoder
    (lta_models_lta_transfer.py :531-659): AR feature-head clip tokens +
    frozen LTA clip tokens → ln+pe encoder; decoder embeds vocab tokens
    (√dim scale, causal mask) and predicts one verb / one noun token from
    the lta_verb / lta_noun prompts restricted to the vocab subsets."""

    vocab_size: int = 619
    verb_ids: Sequence[int] = ()
    noun_ids: Sequence[int] = ()
    verb_bos: int = 0
    noun_bos: int = 0
    num_classes: Sequence[int] = (115, 478)
    num_input_clips: int = 2
    feature_dim: int = 2048
    num_layers: int = 1
    num_heads: int = 8
    dropout: float = 0.1

    def setup(self):
        self.action_model = SlowFast(alpha=self.alpha, beta_inv=self.beta_inv,
                                     dtype=self.dtype)
        self.action_head = MultiTaskHead((self.feature_dim,), 0.5, act="none",
                                         dtype=self.dtype)
        self.lta_model = _FrozenLtaEncoder(2048, self.alpha, self.beta_inv,
                                           dtype=self.dtype)
        # identity when D==2048 (reference proj_lta pattern,
        # lta_models_lta_transfer.py:489-491)
        if self.feature_dim != 2048:
            self.proj_lta = nn.Dense(self.feature_dim, dtype=self.dtype)
        self.ln = nn.LayerNorm(dtype=self.dtype)
        self.pe = self.param("pe", nn.initializers.normal(1.0),
                             (1, self.num_input_clips * 2, self.feature_dim),
                             jnp.float32)
        self.pos_embed = PositionalEncoding(self.feature_dim, dropout=self.dropout,
                                            max_len=200)
        self.embedding = nn.Embed(self.vocab_size, self.feature_dim,
                                  dtype=self.dtype)
        self.transformer_encoder = TransformerEncoder(
            self.num_layers, self.feature_dim, self.num_heads,
            dim_feedforward=2048, dropout=self.dropout, dtype=self.dtype)
        self.transformer_decoder = TransformerDecoder(
            self.num_layers, self.feature_dim, self.num_heads,
            dim_feedforward=2048, dropout=self.dropout, dtype=self.dtype)
        self.fc = nn.Dense(self.vocab_size, dtype=self.dtype)

    def encode(self, pathways, train=False):
        feat_action = self._encode_action_clips(pathways, train)
        feat_lta = self._freeze(self.lta_model(pathways))
        if self.feature_dim != 2048:
            feat_lta = self.proj_lta(feat_lta)
        feat = jnp.concatenate([feat_action, feat_lta], axis=1)
        x = self.ln(feat) + self.pe
        return self.transformer_encoder(x, deterministic=not train)

    def decode(self, y, encoded, train=False):
        emb = self.embedding(y) * math.sqrt(self.feature_dim)
        emb = self.pos_embed(emb, deterministic=not train)
        out = self.transformer_decoder(emb, encoded, is_causal=True,
                                       deterministic=not train)
        return self.fc(out)

    def __call__(self, pathways, target, train: bool = False):
        encoded = self.encode(pathways, train=train)
        return self.decode(target, encoded, train=train)

    def predict(self, pathways):
        import numpy as np

        encoded = self.encode(pathways, train=False)
        b = encoded.shape[0]
        v_idx = jnp.asarray(np.asarray(self.verb_ids))
        n_idx = jnp.asarray(np.asarray(self.noun_ids))
        yv = jnp.full((b, 1), self.verb_bos, jnp.int32)
        yn = jnp.full((b, 1), self.noun_bos, jnp.int32)
        verb = self.decode(yv, encoded)[:, 0][:, v_idx][:, None, :]
        noun = self.decode(yn, encoded)[:, 0][:, n_idx][:, None, :]
        return [verb, noun]

    def generate(self, pathways, k: int = 1, rng: Optional[jax.Array] = None):
        return _categorical_generate(self.predict(pathways), k, rng)
