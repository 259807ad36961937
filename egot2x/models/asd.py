"""ASD (active speaker detection) models.

``talkNetModel`` is the registered backbone (reference
HHI/models/asd/talkNetModel.py:16). ``TalkNetWithHeads`` folds in the
reference's loss-module linear heads — ``lossAV.FC: 256→2``,
``lossA.FC``/``lossV.FC``: 128→2 (HHI/tasks/asd/loss.py:11-55) — so the
heads are ordinary trainable params and the task layer computes plain
weighted CE on the returned logits.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from egot2x.core.registry import MODEL_REGISTRY
from egot2x.nn.talknet import TalkNetModel

Dtype = Any


@MODEL_REGISTRY.register(name="talkNetModel")
class TalkNetBackbone(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, mfcc, faces, train: bool = False, deterministic: bool = True):
        return TalkNetModel(dtype=self.dtype, name="talknet")(
            mfcc, faces, train=train, deterministic=deterministic
        )


@MODEL_REGISTRY.register(name="TalkNetWithHeads")
class TalkNetWithHeads(nn.Module):
    """Backbone + the three per-frame 2-class heads.

    Returns dict with logits_av/logits_a/logits_v, each (B, T, 2).
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, mfcc, faces, train: bool = False, deterministic: bool = True):
        outs_av, outs_a, outs_v = TalkNetModel(dtype=self.dtype, name="talknet")(
            mfcc, faces, train=train, deterministic=deterministic
        )
        return {
            "logits_av": nn.Dense(2, dtype=self.dtype, name="fc_av")(outs_av),
            "logits_a": nn.Dense(2, dtype=self.dtype, name="fc_a")(outs_a),
            "logits_v": nn.Dense(2, dtype=self.dtype, name="fc_v")(outs_v),
        }
