"""Two-pathway SlowFast network in NTHWC.

Behavioral reference: HOI/models/lta/video_model_builder.py:87-408 —
slow pathway (α-strided frames, wide channels) and fast pathway (all
frames, β_inv× thinner) with ``FuseFastToSlow`` lateral convs
(kernel (fusion_k,1,1), stride (α,1,1), channels d_f→2·d_f) after
s1/s2/s3/s4; ``middle=True`` returns the two s5 feature maps
[(B, T/α, 7, 7, 2048), (B, T, 7, 7, 256)] consumed by the translators.

Inputs follow the reference's pathway convention: a list
[slow (B, T/α, H, W, 3), fast (B, T, H, W, 3)] produced by the data
transforms (UniformTemporalSubsampleRepeated).
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from egot2x.nn.resnet3d import MODEL_STAGE_DEPTH, ResStage, VideoStem, _bn

Dtype = Any


class FuseFastToSlow(nn.Module):
    fusion_ratio: int = 2
    fusion_kernel: int = 5
    alpha: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, slow, fast, train: bool = False):
        k = self.fusion_kernel
        d = fast.shape[-1]
        fuse = nn.Conv(d * self.fusion_ratio, (k, 1, 1),
                       strides=(self.alpha, 1, 1),
                       padding=[(k // 2, k // 2), (0, 0), (0, 0)],
                       use_bias=False, dtype=self.dtype, name="conv_f2s")(fast)
        fuse = nn.relu(_bn(train, self.dtype, "bn")(fuse))
        return jnp.concatenate([slow, fuse], axis=-1), fast


class SlowFast(nn.Module):
    """Trunk; returns [slow_s5, fast_s5] feature maps (NTHWC)."""

    depth: int = 50
    width_per_group: int = 64
    beta_inv: int = 8
    alpha: int = 8
    fusion_ratio: int = 2
    fusion_kernel: int = 5
    spatial_strides: Tuple[int, int, int, int] = (1, 2, 2, 2)
    num_block_temp_kernel: Tuple[int, int, int, int] = (3, 4, 6, 3)
    # int8 static-PTQ stage convs (QuantConv3D); stems and the thin
    # lateral fuse convs stay float
    quant: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pathways: List[jax.Array], train: bool = False,
                 calibrate: bool = False):
        slow_in, fast_in = pathways
        d2, d3, d4, d5 = MODEL_STAGE_DEPTH[self.depth]
        w = self.width_per_group
        b_inv = self.beta_inv
        dim_inner = w
        # slowfast temporal kernels: conv1 + res2..5, [slow, fast] each
        # (reference _TEMPORAL_KERNEL_BASIS["slowfast"])
        tk = [[[1], [5]], [[1], [3]], [[1], [3]], [[3], [3]], [[3], [3]]]
        fuse = lambda name: FuseFastToSlow(
            self.fusion_ratio, self.fusion_kernel, self.alpha,
            dtype=self.dtype, name=name)

        slow = VideoStem(w, tk[0][0][0], dtype=self.dtype, name="s1_slow")(
            slow_in, train=train)
        fast = VideoStem(w // b_inv, tk[0][1][0], dtype=self.dtype,
                         name="s1_fast")(fast_in, train=train)
        slow, fast = fuse("s1_fuse")(slow, fast, train=train)

        stage_dims = [
            (w * 4, dim_inner, d2, self.num_block_temp_kernel[0], self.spatial_strides[0]),
            (w * 8, dim_inner * 2, d3, self.num_block_temp_kernel[1], self.spatial_strides[1]),
            (w * 16, dim_inner * 4, d4, self.num_block_temp_kernel[2], self.spatial_strides[2]),
            (w * 32, dim_inner * 8, d5, self.num_block_temp_kernel[3], self.spatial_strides[3]),
        ]
        for si, (dim_out, inner, blocks, nbtk, stride) in enumerate(stage_dims, start=2):
            slow = ResStage(dim_out, inner, blocks, tk[si - 1][0], nbtk, stride,
                            quant=self.quant, dtype=self.dtype,
                            name=f"s{si}_slow")(slow, train=train,
                                                calibrate=calibrate)
            fast = ResStage(dim_out // b_inv, inner // b_inv, blocks,
                            tk[si - 1][1], nbtk, stride,
                            quant=self.quant, dtype=self.dtype,
                            name=f"s{si}_fast")(fast, train=train,
                                                calibrate=calibrate)
            if si < 5:
                slow, fast = fuse(f"s{si}_fuse")(slow, fast, train=train)
        return [slow, fast]


class MultiTaskHead(nn.Module):
    """Global-pool both pathways, concat, one projection per head
    (reference head_helper.py:218-290). pool=None ⇒ adaptive (1,1,1)."""

    num_classes: Sequence[int]
    dropout_rate: float = 0.5
    act: str = "softmax"
    test_noact: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pathways: List[jax.Array], train: bool = False):
        pooled = [jnp.mean(p, axis=(1, 2, 3)) for p in pathways]
        x = jnp.concatenate(pooled, axis=-1)
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        outs = []
        for i, n in enumerate(self.num_classes):
            y = nn.Dense(n, dtype=self.dtype, name=f"projection_{i}")(x)
            if not train and self.act == "softmax" and not self.test_noact:
                y = jax.nn.softmax(y, axis=-1)
            outs.append(y)
        return outs
