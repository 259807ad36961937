"""2-D ResNet-18 frame encoder (NHWC, channels-last — the TPU-native layout).

Behavioral reference: HHI/models/lam/resnet.py:101-160,190-196 — a
torchvision-style ResNet-18 whose head is ``fc: 512→1000`` followed by an
extra ``fc2: 1000→num_classes``; LAM/TTM backbones replace ``fc2`` with a
1000→256 projection and feed the 256-d per-frame feature to a BiLSTM.

Design notes (TPU-first, not a translation):
  * NHWC everywhere; conv kernels are HWIO so XLA tiles them straight
    onto the MXU. Torch OIHW checkpoints are transposed on import
    (egot2x/core/torch_import.py).
  * BatchNorm carries a ``batch_stats`` collection; frozen backbones run
    with ``use_running_average=True`` which matches the reference's
    ``.eval()``-frozen-submodule semantics (SURVEY.md §7 hard parts).
  * Compute dtype is parameterized: bf16 activations on TPU, f32 BN
    statistics.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class BasicBlock2D(nn.Module):
    filters: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        identity = x
        y = nn.Conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = norm("bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), strides=(1, 1), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = norm("bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.filters:
            identity = nn.Conv(self.filters, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            identity = norm("downsample_bn")(identity)
        return nn.relu(y + identity)


class ResNet2D(nn.Module):
    """ResNet-18/34-style 2D encoder with the reference's fc/fc2 head.

    ``forward_features`` (pooled 512-d) is used by backbones that bypass
    the classifier head.
    """

    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    num_classes: int = 3  # reference default fc2: 1000→3
    fc2_features: int = 1000
    width: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 features_only: bool = False) -> jax.Array:
        # Stem: 7x7/2 conv + BN + relu + 3x3/2 maxpool.
        y = nn.Conv(self.width, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for stage, blocks in enumerate(self.stage_sizes):
            filters = self.width * (2 ** stage)
            for b in range(blocks):
                stride = 2 if stage > 0 and b == 0 else 1
                y = BasicBlock2D(filters, stride, dtype=self.dtype,
                                 name=f"layer{stage + 1}_{b}")(y, train=train)
        y = jnp.mean(y, axis=(1, 2))  # global average pool → (B, 512)
        if features_only:
            return y
        y = nn.Dense(self.fc2_features, dtype=self.dtype, name="fc")(y)
        y = nn.Dense(self.num_classes, dtype=self.dtype, name="fc2")(y)
        return y


def resnet18(num_classes: int = 256, dtype=jnp.float32) -> ResNet2D:
    """ResNet-18 with fc2 → ``num_classes`` (users set 256 for backbones,
    reference HHI/models/lam/model.py:52-54)."""
    return ResNet2D(stage_sizes=(2, 2, 2, 2), num_classes=num_classes, dtype=dtype)
