"""EgoT2-g: task-general prompt-conditioned encoder–decoder translators.

Behavioral reference:
  * HHI — ``TaskPromptTransformer`` (single-task encoding,
    HHI/models/multitask/task_prompt_model.py:39-177) and
    ``TaskTranslationPromptTransformer`` (:174-293, cross-task 3-stream
    encoding): frozen LAM/TTM/ASD backbones → per-stream LN + task
    embedding + sinusoidal PE → TransformerEncoder; decoder = embedding
    · √dim + PE → TransformerDecoder (CustomDecoderLayer) → fc(vocab);
    teacher-forced forward(video, video_asd, audio, audio_asd, target,
    task); greedy 1-step ``predict`` with the task token as BOS,
    slicing the last two vocab ids ('0','1').
    ASD is per-frame: the encoded 3T tokens regroup so each frame
    becomes a decode batch element with 3 memory tokens (:251-258).
  * HOI — ``TaskTranslationPromptTransformer6Task``
    (HOI/models/multitask/video_model_builder.py:278-383): non-LTA
    tasks encode the 48-token PNR/OSCC/AR streams (task_embed ids
    0/1/2); LTA tasks encode per-clip PNR/OSCC mean tokens + AR clip
    features + LTA aggregator tokens (2·4 tokens, task ids 0-3);
    2-step ``predict`` decodes verb then noun for action/lta.

Because decode length ≤ 4 and batch-major static shapes, the greedy
decode is a plain unrolled loop inside jit (SURVEY.md §7 hard parts).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from egot2x.core.registry import MODEL_REGISTRY
from egot2x.models.ar_lta import SlowFastFeature, TransformerAggregator
from egot2x.models.lam import LAMBackbone
from egot2x.models.pnr import KeyframeLocalizationResNet, StateChangeClsResNet
from egot2x.models.ttm import TTMBackbone
from egot2x.nn.common import (
    PositionalEncoding,
    TransformerDecoder,
    TransformerEncoder,
)
from egot2x.nn.slowfast import MultiTaskHead, SlowFast
from egot2x.nn.talknet import TalkNetModel
from egot2x.translate.egot2s_hoi import adaptive_avg_pool_time

Dtype = Any

HHI_G_FROZEN_KEYS = ("lam_model", "ttm_model", "asd_model")
HOI_G_FROZEN_KEYS = ("pnr_model", "oscc_model", "recognition_model", "lta_model")


class _PromptCore(nn.Module):
    """Shared encoder/decoder/embedding core."""

    vocab_size: int
    dim: int = 256
    num_heads: int = 4
    num_layers: int = 3
    n_tasks: int = 3
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    def setup(self):
        self.transformer_encoder = TransformerEncoder(
            self.num_layers, self.dim, self.num_heads, dim_feedforward=2048,
            dropout=self.dropout, dtype=self.dtype)
        self.transformer_decoder = TransformerDecoder(
            self.num_layers, self.dim, self.num_heads, dim_feedforward=2048,
            dropout=self.dropout, dtype=self.dtype)
        self.ln = nn.LayerNorm(dtype=self.dtype)
        self.task_embed = self.param(
            "task_embed", nn.initializers.normal(1.0),
            (1, self.n_tasks, self.dim), jnp.float32)
        self.pos_embed = PositionalEncoding(self.dim, dropout=0.1)
        self.embedding = nn.Embed(self.vocab_size, self.dim, dtype=self.dtype)
        self.fc = nn.Dense(self.vocab_size, dtype=self.dtype)

    def encode_prepare(self, x, task_id, deterministic=True):
        x = self.ln(x) + self.task_embed[:, task_id, :]
        return self.pos_embed(x, deterministic=deterministic)

    def run_encoder(self, tokens, deterministic=True):
        return self.transformer_encoder(tokens, deterministic=deterministic)

    def decode(self, y, encoded_x, deterministic=True):
        """y (B, S) int tokens → (B, S, vocab) logits."""
        emb = self.embedding(y) * math.sqrt(self.dim)
        emb = self.pos_embed(emb, deterministic=deterministic)
        out = self.transformer_decoder(emb, encoded_x, is_causal=True,
                                       deterministic=deterministic)
        return self.fc(out)


class _HHIPromptBase(nn.Module):
    vocab_size: int
    hidden_dim: int = 256
    num_heads: int = 4
    num_layers: int = 3
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    # vocab ids (fixed by build_hhi_vocab layout)
    TASK_IDS = {"lam": 3, "ttm": 2, "asd": 4}

    def setup(self):
        self.core = _PromptCore(self.vocab_size, self.hidden_dim,
                                self.num_heads, self.num_layers, 3,
                                self.dropout, dtype=self.dtype)
        self.proj_lam = nn.Dense(self.hidden_dim, dtype=self.dtype)
        self.proj_ttm = nn.Dense(self.hidden_dim, dtype=self.dtype)
        self.proj_asd = nn.Dense(self.hidden_dim, dtype=self.dtype)
        self.lam_model = LAMBackbone(dtype=self.dtype)
        self.ttm_model = TTMBackbone(dtype=self.dtype)
        self.asd_model = TalkNetModel(dtype=self.dtype)

    def _lam_tokens(self, video):
        return jax.lax.stop_gradient(self.lam_model(video, middle=True))

    def _ttm_tokens(self, video, audio):
        return jax.lax.stop_gradient(self.ttm_model(video, audio, middle=True))

    def _asd_tokens(self, video_asd, audio_asd):
        outs_av, _, _ = self.asd_model(audio_asd, video_asd, train=False,
                                       deterministic=True)
        return jax.lax.stop_gradient(outs_av)


@MODEL_REGISTRY.register(name="TaskTranslationPromptTransformer")
class TaskTranslationPromptTransformer(_HHIPromptBase):
    """HHI EgoT2-g: cross-task 3-stream encoding for every task."""

    def encode(self, video, video_asd, audio, audio_asd, task: str,
               deterministic=True):
        # uint8 feed: the LAM/TTM trunk stems fold the normalize into
        # their conv weights (nn/resnet2d.py _StemConv) — the fanned-out
        # RGB stream rides HBM as raw uint8
        if task == "lam":
            lam = self.proj_lam(self._lam_tokens(video))
            tokens = self.core.encode_prepare(lam, 0, deterministic)
        else:
            lam = self.core.encode_prepare(
                self.proj_lam(self._lam_tokens(video)), 0, deterministic)
            ttm = self.core.encode_prepare(
                self.proj_ttm(self._ttm_tokens(video, audio)), 1, deterministic)
            asd = self.core.encode_prepare(
                self.proj_asd(self._asd_tokens(video_asd, audio_asd)), 2,
                deterministic)
            tokens = jnp.concatenate([lam, ttm, asd], axis=1)  # (B, 3T, D)
        encoded = self.core.run_encoder(tokens, deterministic)
        if task == "asd":
            # regroup: each frame becomes a decode batch element with its
            # 3 per-task memory tokens (task_prompt_model.py:251-258)
            b, three_t, d = encoded.shape
            t = three_t // 3
            streams = [encoded[:, i * t:(i + 1) * t, :].reshape(b * t, d)
                       for i in range(3)]
            encoded = jnp.stack(streams, axis=1)  # (B*T, 3, D)
        return encoded

    def __call__(self, video, video_asd, audio, audio_asd, target, task: str,
                 train: bool = False):
        """Teacher-forced: target (B', S) → logits (B', S, vocab)."""
        det = not train
        encoded = self.encode(video, video_asd, audio, audio_asd, task, det)
        return self.core.decode(target, encoded, det)

    def predict(self, video, video_asd, audio, audio_asd, task: str):
        """Greedy 1-step: logits over the last two vocab ids ('0','1')."""
        encoded = self.encode(video, video_asd, audio, audio_asd, task, True)
        bos = jnp.full((encoded.shape[0], 1), self.TASK_IDS[task], jnp.int32)
        out = self.core.decode(bos, encoded, True)  # (B', 1, vocab)
        return out[:, 0, -2:]


@MODEL_REGISTRY.register(name="TaskPromptTransformer")
class TaskPromptTransformer(_HHIPromptBase):
    """HHI baseline: single-task-stream encoding (no cross-task fusion,
    reference Unified3Task path, task_prompt_model.py:39-177)."""

    def encode(self, video, video_asd, audio, audio_asd, task: str,
               deterministic=True):
        # uint8 feed: the LAM/TTM trunk stems fold the normalize into
        # their conv weights (nn/resnet2d.py _StemConv) — the fanned-out
        # RGB stream rides HBM as raw uint8
        if task == "lam":
            tokens = self.core.encode_prepare(
                self.proj_lam(self._lam_tokens(video)), 0, deterministic)
        elif task == "ttm":
            tokens = self.core.encode_prepare(
                self.proj_ttm(self._ttm_tokens(video, audio)), 1, deterministic)
        else:
            tokens = self.core.encode_prepare(
                self.proj_asd(self._asd_tokens(video_asd, audio_asd)), 2,
                deterministic)
        encoded = self.core.run_encoder(tokens, deterministic)
        if task == "asd":
            b, t, d = encoded.shape
            encoded = encoded.reshape(b * t, 1, d)
        return encoded

    def __call__(self, video, video_asd, audio, audio_asd, target, task: str,
                 train: bool = False):
        det = not train
        encoded = self.encode(video, video_asd, audio, audio_asd, task, det)
        return self.core.decode(target, encoded, det)

    def predict(self, video, video_asd, audio, audio_asd, task: str):
        encoded = self.encode(video, video_asd, audio, audio_asd, task, True)
        bos = jnp.full((encoded.shape[0], 1), self.TASK_IDS[task], jnp.int32)
        out = self.core.decode(bos, encoded, True)
        return out[:, 0, -2:]


@MODEL_REGISTRY.register(name="TaskTranslationPromptTransformer2Task")
class TaskTranslationPromptTransformer2Task(nn.Module):
    """Dedicated task12 prompt model: builds ONLY the PNR/OSCC backbones
    (reference HOI/models/multitask/video_model_builder_2task.py:51-166,
    used by Task12Translation, video_task_separate.py:298-306).

    The parameter tree carries exactly the reference's modules
    (pnr_model, oscc_model, proj_pnr, proj_oscc, 2-slot task_embed,
    encoder/decoder/embedding/fc/ln), so a reference 2task checkpoint
    maps shape-exact — unlike the 6-task model, which also constructs
    the unused SlowFast/LTA backbones. Signature-compatible with the
    6-task model (the pathways/task call args are accepted; encoding
    always fuses both streams, reference ``encode`` :128-139) so the
    Task layer drives either model unchanged.
    """

    vocab_size: int
    hidden_dim: int = 256
    num_heads: int = 4
    num_layers: int = 3
    dropout: float = 0.1
    crop_size: int = 225
    dtype: Dtype = jnp.float32

    # vocab ids fixed by build_hoi_vocab_task12 layout
    TASK_IDS = {"pnr": 0, "oscc": 1}

    def setup(self):
        self.core = _PromptCore(self.vocab_size, self.hidden_dim,
                                self.num_heads, self.num_layers, 2,
                                self.dropout, dtype=self.dtype)
        self.proj_pnr = nn.Dense(self.hidden_dim, dtype=self.dtype)
        self.proj_oscc = nn.Dense(self.hidden_dim, dtype=self.dtype)
        self.pnr_model = KeyframeLocalizationResNet(crop_size=self.crop_size,
                                                    dtype=self.dtype)
        self.oscc_model = StateChangeClsResNet(crop_size=self.crop_size,
                                               no_temp_pool=True,
                                               dtype=self.dtype)

    def encode(self, frames_pnr, pathways=None, task: str = "pnr",
               deterministic=True):
        pnr = jax.lax.stop_gradient(self.pnr_model(frames_pnr, middle=True))
        oscc = jax.lax.stop_gradient(self.oscc_model(frames_pnr, middle=True))
        x1 = self.core.encode_prepare(self.proj_pnr(pnr), 0, deterministic)
        x2 = self.core.encode_prepare(self.proj_oscc(oscc), 1, deterministic)
        return self.core.run_encoder(jnp.concatenate([x1, x2], axis=1),
                                     deterministic)

    def __call__(self, frames_pnr, pathways, target, task: str = "pnr",
                 train: bool = False):
        det = not train
        encoded = self.encode(frames_pnr, pathways, task, det)
        return self.core.decode(target, encoded, det)

    def predict(self, frames_pnr, pathways, task: str):
        encoded = self.encode(frames_pnr, pathways, task, True)
        bos = jnp.full((encoded.shape[0], 1), self.TASK_IDS[task], jnp.int32)
        return self.core.decode(bos, encoded, True)[:, 0]


@MODEL_REGISTRY.register(name="TaskTranslationPromptTransformerActionTask")
class TaskTranslationPromptTransformerActionTask(nn.Module):
    """Dedicated unify4taskaction prompt model: AR + LTA backbones only
    (reference HOI/models/multitask/video_model_builder_action.py:21-215,
    behind Unified4TaskTranslationAction, video_task_action.py:19-31).

    ``temporal=False`` — the base variant: action tasks encode the
    single with-head clip feature; LTA tasks concatenate per-clip
    action-head tokens with LTA aggregator tokens and add the learned
    (1, 4, D) ``pe`` (reference ``encode`` :146-162; the base variant
    uses the LTA tokens unprojected, so hidden_dim must equal the
    aggregator width).
    ``temporal=True`` — ``TaskTranslationPromptTransformerTemporal-
    ActionTask`` (:193-215): action tasks encode 2+2 pooled s5
    slow/fast tokens through dedicated projections; LTA tokens go
    through ``proj_lta`` and both streams get task embeddings + an
    extra LayerNorm.

    The AR trunk is frozen but its feature head stays live (reference
    freeze_backbone_params), hence the separate ``action_head``.
    """

    vocab_size: int
    hidden_dim: int = 256
    num_heads: int = 4
    num_layers: int = 3
    dropout: float = 0.1
    alpha: int = 8
    beta_inv: int = 8
    feature_dim: int = 2048  # LTA aggregator width
    temporal: bool = True
    dtype: Dtype = jnp.float32

    # vocab ids fixed by build_hoi_vocab layout
    TASK_IDS = {"action_verb": 2, "action_noun": 3, "lta_verb": 4,
                "lta_noun": 5}

    def setup(self):
        self.core = _PromptCore(self.vocab_size, self.hidden_dim,
                                self.num_heads, self.num_layers, 2,
                                self.dropout, dtype=self.dtype)
        self.pe = self.param("pe", nn.initializers.normal(1.0),
                             (1, 4, self.hidden_dim), jnp.float32)
        self.action_model = SlowFast(alpha=self.alpha, beta_inv=self.beta_inv,
                                     dtype=self.dtype)
        self.action_head = MultiTaskHead((self.hidden_dim,), 0.5, act="none",
                                         dtype=self.dtype)
        self.lta_backbone = SlowFastFeature(self.feature_dim, self.alpha,
                                            self.beta_inv, dtype=self.dtype)
        self.lta_aggregator = TransformerAggregator(dim=self.feature_dim,
                                                    dtype=self.dtype)
        if self.temporal:
            self.proj_action_slow = nn.Dense(self.hidden_dim, dtype=self.dtype)
            self.proj_action_fast = nn.Dense(self.hidden_dim, dtype=self.dtype)
            self.proj_lta = nn.Dense(self.hidden_dim, dtype=self.dtype)
        elif self.hidden_dim != self.feature_dim:
            raise ValueError(
                "base (non-temporal) ActionTask uses unprojected LTA tokens: "
                f"hidden_dim ({self.hidden_dim}) must equal feature_dim "
                f"({self.feature_dim}) — reference "
                "video_model_builder_action.py:150-156")

    def _fz(self, x):
        return jax.lax.stop_gradient(x)

    def _clip_action_feats(self, pathways, train):
        """Per-clip frozen SlowFast s5 + live head → (B, N, D)."""
        n = pathways[0].shape[1]
        feats = []
        for i in range(n):
            s5 = self.action_model([p[:, i] for p in pathways], train=False)
            feats.append(self.action_head([self._fz(p) for p in s5],
                                          train=train)[0])
        return jnp.stack(feats, axis=1)

    def encode(self, frames_pnr, pathways, task: str, deterministic=True):
        if "lta" in task:
            feat_action = self._clip_action_feats(pathways, not deterministic)
            n = pathways[0].shape[1]
            lta_feats = [self.lta_backbone([p[:, i] for p in pathways],
                                           train=False) for i in range(n)]
            feat_lta = self._fz(self.lta_aggregator(lta_feats, middle=True,
                                                    deterministic=True))
            if self.temporal:
                x1 = self.core.encode_prepare(feat_action, 0, deterministic)
                x2 = self.core.encode_prepare(self.proj_lta(feat_lta), 1,
                                              deterministic)
                tokens = self.core.ln(jnp.concatenate([x1, x2], axis=1))
            else:
                feat = jnp.concatenate([feat_action, feat_lta], axis=1)
                tokens = self.core.ln(feat) + self.pe[:, : feat.shape[1], :]
        else:
            if self.temporal:
                slow, fast = self.action_model(pathways, train=False)
                slow_tok = self.proj_action_slow(self._fz(
                    adaptive_avg_pool_time(jnp.mean(slow, axis=(2, 3)), 2)))
                fast_tok = self.proj_action_fast(self._fz(
                    adaptive_avg_pool_time(jnp.mean(fast, axis=(2, 3)), 2)))
                feat = jnp.concatenate([slow_tok, fast_tok], axis=1)
            else:
                s5 = self.action_model(pathways, train=False)
                feat = self.action_head([self._fz(p) for p in s5],
                                        train=not deterministic)[0][:, None, :]
            tokens = self.core.encode_prepare(feat, 0, deterministic)
        return self.core.run_encoder(tokens, deterministic)

    def __call__(self, frames_pnr, pathways, target, task: str,
                 train: bool = False):
        det = not train
        encoded = self.encode(frames_pnr, pathways, task, det)
        return self.core.decode(target, encoded, det)

    def predict(self, frames_pnr, pathways, task: str):
        encoded = self.encode(frames_pnr, pathways, task, True)
        b = encoded.shape[0]
        out = {}
        for sub in ("verb", "noun"):
            bos = jnp.full((b, 1), self.TASK_IDS[f"{task}_{sub}"], jnp.int32)
            out[sub] = self.core.decode(bos, encoded, True)[:, 0]
        return out


@MODEL_REGISTRY.register(name="TaskTranslationPromptTransformer6Task")
class TaskTranslationPromptTransformer6Task(nn.Module):
    """HOI EgoT2-g over pnr/oscc/action/lta with a 619-token vocab."""

    vocab_size: int
    hidden_dim: int = 256
    num_heads: int = 4
    num_layers: int = 3
    dropout: float = 0.1
    crop_size: int = 225
    alpha: int = 8
    beta_inv: int = 8
    feature_dim: int = 2048  # LTA aggregator width
    # BOS for the task12 joint-action decode: the reference prompts with
    # vocab['action'], which torchtext maps to <unk> since 'action' is
    # not in the vocab. Threaded from the task's vocab (default matches
    # build_hoi_vocab's "<unk>"=9) so a layout change can't silently
    # desynchronize train/predict BOS.
    joint_bos: int = 9
    dtype: Dtype = jnp.float32

    # vocab ids fixed by build_hoi_vocab layout
    TASK_IDS = {"pnr": 0, "oscc": 1, "action_verb": 2, "action_noun": 3,
                "lta_verb": 4, "lta_noun": 5}

    def setup(self):
        self.core = _PromptCore(self.vocab_size, self.hidden_dim,
                                self.num_heads, self.num_layers, 4,
                                self.dropout, dtype=self.dtype)
        self.proj_pnr = nn.Dense(self.hidden_dim, dtype=self.dtype)
        self.proj_oscc = nn.Dense(self.hidden_dim, dtype=self.dtype)
        self.proj_action_slow = nn.Dense(self.hidden_dim, dtype=self.dtype)
        self.proj_action_fast = nn.Dense(self.hidden_dim, dtype=self.dtype)
        self.proj_lta = nn.Dense(self.hidden_dim, dtype=self.dtype)
        self.pnr_model = KeyframeLocalizationResNet(crop_size=self.crop_size,
                                                    dtype=self.dtype)
        self.oscc_model = StateChangeClsResNet(crop_size=self.crop_size,
                                               no_temp_pool=True, dtype=self.dtype)
        self.recognition_model = SlowFast(alpha=self.alpha, beta_inv=self.beta_inv,
                                          dtype=self.dtype)
        self.recognition_head = MultiTaskHead((self.hidden_dim,), 0.5,
                                              act="none", dtype=self.dtype)
        self.lta_backbone = SlowFastFeature(self.feature_dim, self.alpha,
                                            self.beta_inv, dtype=self.dtype)
        self.lta_aggregator = TransformerAggregator(dim=self.feature_dim,
                                                    dtype=self.dtype)

    def _fz(self, x):
        return jax.lax.stop_gradient(x)

    def _encode_single(self, frames, pathways, deterministic):
        """48-token PNR/OSCC/AR encoding (non-LTA tasks)."""
        pnr = self._fz(self.pnr_model(frames, middle=True))
        oscc = self._fz(self.oscc_model(frames, middle=True))
        slow, fast = self.recognition_model(pathways, train=False)
        slow_tok = self._fz(jnp.mean(slow, axis=(2, 3)))
        fast_tok = self._fz(adaptive_avg_pool_time(jnp.mean(fast, axis=(2, 3)), 8))
        x1 = self.core.encode_prepare(self.proj_pnr(pnr), 0, deterministic)
        x2 = self.core.encode_prepare(self.proj_oscc(oscc), 1, deterministic)
        action = jnp.concatenate([self.proj_action_slow(slow_tok),
                                  self.proj_action_fast(fast_tok)], axis=1)
        x3 = self.core.encode_prepare(action, 2, deterministic)
        return jnp.concatenate([x1, x2, x3], axis=1)

    def _encode_lta(self, frames_pnr, pathways, deterministic):
        """2·4-token per-clip encoding (LTA tasks)."""
        n = frames_pnr.shape[1]
        feat_pnr = jnp.stack([
            self._fz(self.pnr_model(frames_pnr[:, i], middle=True)).mean(axis=1)
            for i in range(n)], axis=1)
        feat_oscc = jnp.stack([
            self._fz(self.oscc_model(frames_pnr[:, i], middle=True)).mean(axis=1)
            for i in range(n)], axis=1)
        feats_ac = []
        for i in range(n):
            s5 = self.recognition_model([p[:, i] for p in pathways], train=False)
            s5 = [self._fz(p) for p in s5]
            feats_ac.append(self.recognition_head(s5)[0])
        feat_action = jnp.stack(feats_ac, axis=1)
        lta_feats = [self.lta_backbone([p[:, i] for p in pathways], train=False)
                     for i in range(n)]
        feat_lta = self._fz(self.lta_aggregator(lta_feats, middle=True,
                                                deterministic=True))
        x1 = self.core.encode_prepare(self.proj_pnr(feat_pnr), 0, deterministic)
        x2 = self.core.encode_prepare(self.proj_oscc(feat_oscc), 1, deterministic)
        x3 = self.core.encode_prepare(feat_action, 2, deterministic)
        x4 = self.core.encode_prepare(self.proj_lta(feat_lta), 3, deterministic)
        return jnp.concatenate([x1, x2, x3, x4], axis=1)

    def encode(self, frames_pnr, pathways, task: str, deterministic=True):
        if "lta" in task:
            return self.core.run_encoder(
                self._encode_lta(frames_pnr, pathways, deterministic),
                deterministic)
        return self.core.run_encoder(
            self._encode_single(frames_pnr, pathways, deterministic),
            deterministic)

    def __call__(self, frames_pnr, pathways, target, task: str,
                 train: bool = False):
        det = not train
        encoded = self.encode(frames_pnr, pathways, task, det)
        return self.core.decode(target, encoded, det)

    def predict(self, frames_pnr, pathways, task: str):
        """Greedy decode. 'pnr'/'oscc': 1 step. 'action'/'lta': verb and
        noun branches (2 decodes), returns dict of first-step logits.
        'action_joint': 2-step greedy from the <unk> BOS (the reference
        unify3task prompts with vocab['action'], which torchtext maps to
        <unk> since 'action' is not in the vocab)."""
        encoded = self.encode(frames_pnr, pathways, task, True)
        b = encoded.shape[0]
        if task == "action_joint":
            bos = jnp.full((b, 1), self.joint_bos, jnp.int32)
            verb_logits = self.core.decode(bos, encoded, True)[:, 0]
            tok1 = jnp.argmax(verb_logits, axis=-1).astype(jnp.int32)
            y2 = jnp.concatenate([bos, tok1[:, None]], axis=1)
            noun_logits = self.core.decode(y2, encoded, True)[:, 1]
            return {"verb": verb_logits, "noun": noun_logits}
        if task in ("action", "lta"):
            out = {}
            for sub in ("verb", "noun"):
                bos = jnp.full((b, 1), self.TASK_IDS[f"{task}_{sub}"], jnp.int32)
                out[sub] = self.core.decode(bos, encoded, True)[:, 0]
            return out
        bos = jnp.full((b, 1), self.TASK_IDS[task], jnp.int32)
        return self.core.decode(bos, encoded, True)[:, 0]
