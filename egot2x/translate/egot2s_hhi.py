"""EgoT2-s HHI translators: cross-task token fusion over frozen backbones.

Behavioral reference: HHI/models/ttm/model_taskspecific.py and
HHI/models/asd/model_taskspecific.py —

  * ``TaskFusionMFTransformer2Task`` (:155-194): LAM+TTM per-frame token
    streams → per-stream Linear(256→dim) projection → shared LayerNorm +
    learned task embedding (1, n_tasks, dim) + sinusoidal PE restarting
    per stream → concat on the token axis → post-LN TransformerEncoder →
    token mean → LN+Linear→2.
  * ``TaskFusionMFTransformer3Task`` (TTM, :198-245): adds the frozen
    TalkNet stream (per-frame AV features, (B, T1, 256)).
  * ASD variant (asd/model_taskspecific.py:110-160): same fusion but the
    output is the first T_asd tokens (ASD stream is concatenated FIRST)
    reshaped to (B·T, dim) for the frame-level lossAV head; exposes
    ``output_dim``.
  * Baselines: ``FinetuneTTM``/``LAM2TTM``/``ASD2TTM`` (MLP on a mean
    backbone token, :39-97), ``TaskFusionLFLinear3Task`` late fusion
    (:101-128), ``FinetuneASD``/``LAM2ASD``/``TTM2ASD``
    (asd/model_taskspecific.py:59-107).

Freezing: the reference uses requires_grad=False + ``torch.no_grad()``;
here backbone features are ``stop_gradient``-ed and backbones always run
with eval-mode BN, while the structural trainable/frozen param split
(egot2x.train.state.split_params on FROZEN_KEYS) keeps the optimizer off
backbone weights entirely.

TPU notes: the three backbones are independent — XLA schedules their
convs back-to-back on the MXU within one jit; the translator itself is
tiny (dim 128-256, ≤450 tokens) and fuses into a handful of kernels.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from egot2x.core.registry import MODEL_REGISTRY
from egot2x.models.lam import LAMBackbone
from egot2x.models.ttm import TTMBackbone
from egot2x.nn.common import PositionalEncoding, TransformerEncoder
from egot2x.nn.talknet import TalkNetModel

Dtype = Any

# top-level param keys treated as frozen by the task layer
FROZEN_KEYS = ("lam_model", "ttm_model", "asd_model")


class _FusionBase(nn.Module):
    """Shared pieces: backbones + encode_prepare."""

    hidden_dim: int = 256
    num_heads: int = 4
    num_layers: int = 3
    dropout: float = 0.1
    nofreeze: bool = False
    quant: bool = False  # int8 static-PTQ resnet trunks (egot2x.nn.quant)
    # rematerialize backbone activations in the backward pass (nofreeze
    # full-train only — frozen training stop_gradients the trunks and
    # never differentiates them). Trades one extra trunk forward for
    # dropping the trunk activation residuals: b64/T30 full-train OOMs
    # HBM by ~0.6 GB without it (docs/PROFILE.md round 4)
    remat: bool = False
    # fuse the LAM + TTM-video resnet18 stems into ONE (7,7,3,128) conv at
    # int8 inference — the two trunks consume the same frames, and one
    # fused stem writes its int8 map at full (32, 128) lane density
    # instead of two half-dense 64-channel maps (egot2x.nn.fused_stem;
    # measured −2.8% on the dual trunk, tools/exp_grouped_trunk.py).
    # Deployment-only: ignored at init/train/calibration, parameters and
    # checkpoints keep the two-trunk layout.
    fuse_stems: bool = False
    dtype: Dtype = jnp.float32

    def _fused_rgb_stems(self, video, train, calibrate):
        """(stem_lam, stem_ttm) ``stem_in`` pairs, or (None, None) when
        the fused path does not apply (non-quant, training, calibration,
        init, or missing bound variables)."""
        if not (self.fuse_stems and self.quant and not train
                and not calibrate and not self.nofreeze
                and not self.is_initializing()
                and self.has_variable("params", "lam_model")
                and self.has_variable("quant", "lam_model")):
            return None, None
        from egot2x.nn.fused_stem import fused_rgb_stem, stem_tree

        lam = [self.get_variable(col, "lam_model")["trunk"]["base_model"]
               for col in ("params", "batch_stats", "quant")]
        ttm = [self.get_variable(col, "ttm_model")["trunk"]["video_encoder"]
               for col in ("params", "batch_stats", "quant")]
        n, t = video.shape[0], video.shape[1]
        frames = video.reshape((n * t,) + video.shape[2:])
        return tuple(fused_rgb_stem(
            frames, [stem_tree(*lam), stem_tree(*ttm)], dtype=self.dtype))

    def _bb(self, cls, static_argnums):
        """Backbone class, nn.remat-wrapped under remat+nofreeze.
        static_argnums = positions of the bool flag args (self = 0);
        remat call sites must pass those flags POSITIONALLY."""
        if self.remat and self.nofreeze:
            return nn.remat(cls, static_argnums=static_argnums)
        return cls

    def _asd_tokens(self, video_asd, audio_asd, deterministic=True,
                    calibrate=False):
        """Frozen TalkNet per-frame AV features (B, T, 256)."""
        asd = self._bb(TalkNetModel, (3, 4, 5))(
            quant=self.quant, dtype=self.dtype, name="asd_model")
        outs_av, _, _ = asd(audio_asd, video_asd, False, deterministic,
                            calibrate)
        return outs_av

    def _maybe_freeze(self, x):
        return x if self.nofreeze else jax.lax.stop_gradient(x)


def _encode_prepare(x, ln, task_embed, task_id, pos_embed, deterministic):
    """LN + task embedding + per-stream PE (reference encode_prepare)."""
    x = ln(x) + task_embed[:, task_id, :]
    return pos_embed(x, deterministic=deterministic)


class _MFTransformerCore(nn.Module):
    """Projection + task-embed + PE + encoder, shared by all MF variants."""

    n_tasks: int
    hidden_dim: int
    num_heads: int
    num_layers: int
    dropout: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, streams, deterministic: bool = True):
        """streams: list of (name, task_id, (B, T_i, 256)) in concat
        order. task_id indexes ``task_embed`` and is FIXED per stream
        (ttm=0, lam=1, asd=2 in the reference), independent of concat
        position — the ASD-target variant concatenates asd FIRST while
        keeping its task embedding at index 2
        (asd/model_taskspecific.py:149-155)."""
        ln = nn.LayerNorm(dtype=self.dtype, name="ln")
        task_embed = self.param(
            "task_embed", nn.initializers.normal(1.0),
            (1, self.n_tasks, self.hidden_dim), jnp.float32,
        )
        pos = PositionalEncoding(self.hidden_dim, dropout=0.1, max_len=1000,
                                 name="pos_embed")
        prepared = []
        for name, task_id, x in streams:
            proj = nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"proj_{name}")(x)
            prepared.append(
                _encode_prepare(proj, ln, task_embed, task_id, pos, deterministic)
            )
        feat = jnp.concatenate(prepared, axis=1)  # (B, ΣT, dim)
        out = TransformerEncoder(
            num_layers=self.num_layers, d_model=self.hidden_dim,
            num_heads=self.num_heads, dim_feedforward=2048,
            dropout=self.dropout, dtype=self.dtype, name="transformer_encoder",
        )(feat, deterministic=deterministic)
        return out


@MODEL_REGISTRY.register(name="TaskFusionMFTransformer2Task")
class TaskFusionMFTransformer2Task(_FusionBase):
    """LAM + TTM token fusion → TTM logits (model_taskspecific.py:155-194)."""

    @nn.compact
    def __call__(self, video, audio, train: bool = False,
                 deterministic: Optional[bool] = None):
        deterministic = not train if deterministic is None else deterministic
        # uint8 feed: no normalize here — each trunk's stem conv folds
        # the ToTensor+Normalize affine into its weights (exact,
        # nn/resnet2d.py _StemConv), so the fanned-out RGB stream is
        # read from HBM as raw uint8 by both trunks with no
        # materialized normalized copy
        lam_out = self._maybe_freeze(
            self._bb(LAMBackbone, (2,))(dtype=self.dtype, name="lam_model")(
                video, True))
        ttm_out = self._maybe_freeze(
            self._bb(TTMBackbone, (3,))(dtype=self.dtype, name="ttm_model")(
                video, audio, True))
        out = _MFTransformerCore(
            2, self.hidden_dim, self.num_heads, self.num_layers, self.dropout,
            dtype=self.dtype, name="core",
        )([("ttm", 0, ttm_out), ("lam", 1, lam_out)],
          deterministic=deterministic)
        pooled = out.mean(axis=1)
        pooled = nn.LayerNorm(dtype=self.dtype, name="head_ln")(pooled)
        return nn.Dense(2, dtype=self.dtype, name="head_fc")(pooled)


@MODEL_REGISTRY.register(name="TaskFusionMFTransformer3Task")
class TaskFusionMFTransformer3Task(_FusionBase):
    """LAM + TTM + ASD token fusion → TTM logits (:198-245).

    Stream order ttm, lam, asd — matching the reference concat
    (x1=ttm, x2=lam, x3=asd, :241)."""

    @nn.compact
    def __call__(self, video, video_asd, audio, audio_asd, train: bool = False,
                 deterministic: Optional[bool] = None,
                 calibrate: bool = False):
        deterministic = not train if deterministic is None else deterministic
        # raw-uint8 RGB stream: trunk stems fold the normalize (2Task note)
        asd_out = self._maybe_freeze(
            self._asd_tokens(video_asd, audio_asd, deterministic=True,
                             calibrate=calibrate))
        stem_lam, stem_ttm = self._fused_rgb_stems(video, train, calibrate)
        lam_out = self._maybe_freeze(
            self._bb(LAMBackbone, (2, 3))(
                quant=self.quant, dtype=self.dtype, name="lam_model")(
                video, True, calibrate, stem_in=stem_lam))
        ttm_out = self._maybe_freeze(
            self._bb(TTMBackbone, (3, 4))(
                quant=self.quant, dtype=self.dtype, name="ttm_model")(
                video, audio, True, calibrate, stem_in=stem_ttm))
        out = _MFTransformerCore(
            3, self.hidden_dim, self.num_heads, self.num_layers, self.dropout,
            dtype=self.dtype, name="core",
        )([("ttm", 0, ttm_out), ("lam", 1, lam_out), ("asd", 2, asd_out)],
          deterministic=deterministic)
        pooled = out.mean(axis=1)
        pooled = nn.LayerNorm(dtype=self.dtype, name="head_ln")(pooled)
        return nn.Dense(2, dtype=self.dtype, name="head_fc")(pooled)


@MODEL_REGISTRY.register(name="TaskFusionMFTransformer3TaskASD")
class TaskFusionMFTransformer3TaskASD(_FusionBase):
    """ASD-as-target fusion: returns per-frame features (B·T_asd, dim)
    for the frame-level lossAV head (asd/model_taskspecific.py:110-160).
    ASD stream concatenated FIRST; output = first T_asd tokens."""

    @nn.compact
    def __call__(self, video, video_asd, audio, audio_asd, train: bool = False,
                 deterministic: Optional[bool] = None):
        deterministic = not train if deterministic is None else deterministic
        # raw-uint8 RGB stream: trunk stems fold the normalize (2Task note)
        asd_out = self._maybe_freeze(
            self._asd_tokens(video_asd, audio_asd, deterministic=True))
        lam_out = self._maybe_freeze(
            self._bb(LAMBackbone, (2,))(dtype=self.dtype, name="lam_model")(
                video, True))
        ttm_out = self._maybe_freeze(
            self._bb(TTMBackbone, (3,))(dtype=self.dtype, name="ttm_model")(
                video, audio, True))
        n, t_asd = asd_out.shape[0], asd_out.shape[1]
        out = _MFTransformerCore(
            3, self.hidden_dim, self.num_heads, self.num_layers, self.dropout,
            dtype=self.dtype, name="core",
        )([("asd", 2, asd_out), ("ttm", 0, ttm_out), ("lam", 1, lam_out)],
          deterministic=deterministic)
        return out[:, :t_asd, :].reshape(n * t_asd, self.hidden_dim)

    @property
    def output_dim(self):
        return self.hidden_dim


class _MLPHead(nn.Module):
    hidden_dim: int
    hidden_dim2: int
    out: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(nn.Dense(self.hidden_dim2, dtype=self.dtype, name="fc2")(x))
        return nn.Dense(self.out, dtype=self.dtype, name="fc3")(x)


@MODEL_REGISTRY.register(name="FinetuneTTM")
class FinetuneTTM(_FusionBase):
    hidden_dim2: int = 512

    @nn.compact
    def __call__(self, video, video_asd, audio, audio_asd, train: bool = False,
                 deterministic: Optional[bool] = None):
        ttm_out = jax.lax.stop_gradient(
            TTMBackbone(dtype=self.dtype, name="ttm_model")(video, audio, middle=True)
        ).mean(axis=1)
        return _MLPHead(self.hidden_dim, self.hidden_dim2, dtype=self.dtype,
                        name="head")(ttm_out)


@MODEL_REGISTRY.register(name="LAM2TTM")
class LAM2TTM(_FusionBase):
    hidden_dim2: int = 512

    @nn.compact
    def __call__(self, video, video_asd, audio, audio_asd, train: bool = False,
                 deterministic: Optional[bool] = None):
        lam_out = jax.lax.stop_gradient(
            LAMBackbone(dtype=self.dtype, name="lam_model")(video, middle=True)
        ).mean(axis=1)
        return _MLPHead(self.hidden_dim, self.hidden_dim2, dtype=self.dtype,
                        name="head")(lam_out)


@MODEL_REGISTRY.register(name="ASD2TTM")
class ASD2TTM(_FusionBase):
    hidden_dim2: int = 512

    @nn.compact
    def __call__(self, video, video_asd, audio, audio_asd, train: bool = False,
                 deterministic: Optional[bool] = None):
        asd_out = jax.lax.stop_gradient(
            self._asd_tokens(video_asd, audio_asd)
        ).mean(axis=1)
        return _MLPHead(self.hidden_dim, self.hidden_dim2, dtype=self.dtype,
                        name="head")(asd_out)


@MODEL_REGISTRY.register(name="TaskFusionLFLinear3Task")
class TaskFusionLFLinear3Task(_FusionBase):
    """Late fusion: mean backbone tokens → proj → concat → LN → MLP
    (model_taskspecific.py:101-128)."""

    hidden_dim2: int = 512

    @nn.compact
    def __call__(self, video, video_asd, audio, audio_asd, train: bool = False,
                 deterministic: Optional[bool] = None):
        # raw-uint8 RGB stream: trunk stems fold the normalize (2Task note)
        asd_out = jax.lax.stop_gradient(
            self._asd_tokens(video_asd, audio_asd)).mean(axis=1)
        lam_out = jax.lax.stop_gradient(
            LAMBackbone(dtype=self.dtype, name="lam_model")(video, middle=True)
        ).mean(axis=1)
        ttm_out = jax.lax.stop_gradient(
            TTMBackbone(dtype=self.dtype, name="ttm_model")(video, audio, middle=True)
        ).mean(axis=1)
        feat = jnp.concatenate([
            nn.Dense(self.hidden_dim, dtype=self.dtype, name="proj_ttm")(ttm_out),
            nn.Dense(self.hidden_dim, dtype=self.dtype, name="proj_lam")(lam_out),
            nn.Dense(self.hidden_dim, dtype=self.dtype, name="proj_asd")(asd_out),
        ], axis=1)
        feat = nn.LayerNorm(dtype=self.dtype, name="ln")(feat)
        out = nn.Dense(self.hidden_dim2, dtype=self.dtype, name="fc1")(feat)
        return nn.Dense(2, dtype=self.dtype, name="fc2")(nn.relu(out))


@MODEL_REGISTRY.register(name="FinetuneASD")
class FinetuneASD(_FusionBase):
    """Frame-level features from frozen TalkNet (asd/model_taskspecific.py:59-76)."""

    @nn.compact
    def __call__(self, video, video_asd, audio, audio_asd, train: bool = False,
                 deterministic: Optional[bool] = None):
        outs = jax.lax.stop_gradient(self._asd_tokens(video_asd, audio_asd))
        n, t, _ = outs.shape
        out = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(outs))
        return out.reshape(n * t, self.hidden_dim)


@MODEL_REGISTRY.register(name="LAM2ASD")
class LAM2ASD(_FusionBase):
    @nn.compact
    def __call__(self, video, video_asd, audio, audio_asd, train: bool = False,
                 deterministic: Optional[bool] = None):
        lam_out = jax.lax.stop_gradient(
            LAMBackbone(dtype=self.dtype, name="lam_model")(video, middle=True))
        n, t, _ = lam_out.shape
        out = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(lam_out))
        return out.reshape(n * t, self.hidden_dim)


@MODEL_REGISTRY.register(name="TTM2ASD")
class TTM2ASD(_FusionBase):
    @nn.compact
    def __call__(self, video, video_asd, audio, audio_asd, train: bool = False,
                 deterministic: Optional[bool] = None):
        ttm_out = jax.lax.stop_gradient(
            TTMBackbone(dtype=self.dtype, name="ttm_model")(video, audio, middle=True))
        n, t, _ = ttm_out.shape
        out = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(ttm_out))
        return out.reshape(n * t, self.hidden_dim)
