"""PNR/OSCC Stage-I models.

Behavioral reference: HOI/models/pnr/video_model_builder.py:303-492 —
``KeyframeLocalizationResNet`` (slow_layer5 trunk + per-frame head,
``middle=True`` → (B, 16, 8192) tokens), ``StateChangeClsResNet``
(temporal-pooled 2-class head with the NO_TEMP_POOL switch),
``DualHeadResNet`` (both heads), ``KeyframeCnnLSTM`` (resnet50 + BiLSTM
regressor).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from egot2x.core.registry import MODEL_REGISTRY
from egot2x.nn.lstm import BiLSTM
from egot2x.nn.resnet2d import ResNet2D
from egot2x.nn.resnet3d import (
    POOL1,
    KeyframeLocalizationHead,
    ResNet3D,
)

# nonlocal_cfg on the Stage-I models: per-stage Nonlocal wiring from
# nn.resnet3d.resolve_nonlocal (reference NONLOCAL.* config group,
# HOI/configs/pnr/defaults.py:259-276)

Dtype = Any


def _head_spatial_pool(crop_size: int, arch: str) -> int:
    return crop_size // 32 // POOL1[arch][1]


@MODEL_REGISTRY.register(name="KeyframeLocalizationResNet")
class KeyframeLocalizationResNet(nn.Module):
    """16 per-frame keyframe logits; middle=True → per-frame tokens."""

    arch: str = "slow_layer5"
    depth: int = 50
    crop_size: int = 225
    num_classes: int = 1  # per-frame logit; (B, T) after squeeze
    dropout_rate: float = 0.5
    remat: bool = False
    nonlocal_cfg: Any = None
    quant: bool = False  # int8 static-PTQ stage convs (egot2x.nn.quant)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, frames, train: bool = False, middle: bool = False,
                 calibrate: bool = False):
        # input_norm=None: the PNR pipeline feeds RAW [0,255] pixels
        # (reference FixedSegLabelledDataset has no Normalize); a uint8
        # feed is cast only, never ImageNet/Ego4D-normalized
        y = ResNet3D(arch=self.arch, depth=self.depth, remat=self.remat,
                     input_norm=None, nonlocal_cfg=self.nonlocal_cfg,
                     quant=self.quant, dtype=self.dtype,
                     name="trunk")(frames, train=train, calibrate=calibrate)
        return KeyframeLocalizationHead(
            num_classes=self.num_classes,
            spatial_pool=_head_spatial_pool(self.crop_size, self.arch),
            temporal_pool=1,
            dropout_rate=self.dropout_rate,
            act="none",
            dtype=self.dtype,
            name="head",
        )(y, train=train, middle=middle)


@MODEL_REGISTRY.register(name="StateChangeClsResNet")
class StateChangeClsResNet(nn.Module):
    """2-class state-change head; NO_TEMP_POOL keeps per-frame tokens."""

    arch: str = "slow_layer5"
    depth: int = 50
    crop_size: int = 225
    num_frames: int = 16
    num_classes: int = 2
    # False → full temporal pool, (B, 2) logits (the Stage-I classifier
    # path); True → per-frame tokens, used via middle=True by the
    # translators (reference NO_TEMP_POOL in ts_oscc.yaml)
    no_temp_pool: bool = False
    dropout_rate: float = 0.5
    remat: bool = False
    nonlocal_cfg: Any = None
    quant: bool = False  # int8 static-PTQ stage convs (egot2x.nn.quant)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, frames, train: bool = False, middle: bool = False,
                 calibrate: bool = False):
        # input_norm=None: the PNR pipeline feeds RAW [0,255] pixels
        # (reference FixedSegLabelledDataset has no Normalize); a uint8
        # feed is cast only, never ImageNet/Ego4D-normalized
        y = ResNet3D(arch=self.arch, depth=self.depth, remat=self.remat,
                     input_norm=None, nonlocal_cfg=self.nonlocal_cfg,
                     quant=self.quant, dtype=self.dtype,
                     name="trunk")(frames, train=train, calibrate=calibrate)
        t_pool = 1 if self.no_temp_pool else y.shape[1]
        out = KeyframeLocalizationHead(
            num_classes=self.num_classes,
            spatial_pool=_head_spatial_pool(self.crop_size, self.arch),
            temporal_pool=t_pool,
            dropout_rate=self.dropout_rate,
            act="none",
            dtype=self.dtype,
            name="head",
        )(y, train=train, middle=middle)
        if middle:
            return out  # (B, T', 8192) tokens
        if not self.no_temp_pool:
            out = out[:, 0, :]  # single temporal position after full pool
        else:
            out = out.mean(axis=1)  # logits averaged over frames
        return out  # (B, 2)


@MODEL_REGISTRY.register(name="DualHeadResNet")
class DualHeadResNet(nn.Module):
    """Keyframe + state-change heads on a shared trunk (:383-437)."""

    arch: str = "slow_layer5"
    depth: int = 50
    crop_size: int = 225
    num_frames: int = 16
    dropout_rate: float = 0.5
    nonlocal_cfg: Any = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, frames, train: bool = False):
        y = ResNet3D(arch=self.arch, depth=self.depth, input_norm=None,
                     nonlocal_cfg=self.nonlocal_cfg,
                     dtype=self.dtype, name="trunk")(frames, train=train)
        sp = _head_spatial_pool(self.crop_size, self.arch)
        keyframe = KeyframeLocalizationHead(
            num_classes=1, spatial_pool=sp, temporal_pool=1,
            dropout_rate=self.dropout_rate, dtype=self.dtype,
            name="keyframe_head",
        )(y, train=train)
        state = KeyframeLocalizationHead(
            num_classes=2, spatial_pool=sp, temporal_pool=y.shape[1],
            dropout_rate=self.dropout_rate, dtype=self.dtype,
            name="state_head",
        )(y, train=train)
        return keyframe[..., 0], state[:, 0, :]  # (B, T), (B, 2)


@MODEL_REGISTRY.register(name="KeyframeCnnLSTM")
class KeyframeCnnLSTM(nn.Module):
    """resnet50-per-frame + BiLSTM → sigmoid per-frame keyframe score
    (video_model_builder.py:455-487)."""

    hidden_size: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, frames, train: bool = False):
        b, t, h, w, c = frames.shape
        feats = ResNet2D(stage_sizes=(3, 4, 6, 3), dtype=self.dtype,
                         name="backbone")(
            frames.reshape(b * t, h, w, c), train=train, features_only=True
        )
        # resnet50 bottleneck width: our ResNet2D basic blocks give 512;
        # project to 2048-equivalent via the LSTM input dense
        feats = feats.reshape(b, t, -1)
        y = BiLSTM(self.hidden_size, num_layers=1, dtype=self.dtype,
                   name="lstm")(feats)
        out = nn.Dense(1, dtype=self.dtype, name="regressor")(y)[..., 0]
        return jax.nn.sigmoid(out)
