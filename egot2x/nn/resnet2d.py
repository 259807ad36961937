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

# ImageNet statistics, mirroring the host-side ToTensor+Normalize
# (egot2x/data/lam.py normalize_frames; HHI/utils/lam/utils.py:16-21)
_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_u8_frames(x: jax.Array, dtype=jnp.float32) -> jax.Array:
    """In-jit ToTensor + ImageNet Normalize for integer RGB frames.

    No-op on float input (already host-normalized). This is the
    reference expression (HHI/utils/lam/utils.py:16-21) and the parity
    oracle for the uint8 feed (tests/test_u8_input.py).
    """
    if not jnp.issubdtype(x.dtype, jnp.integer):
        return x
    mean = jnp.asarray(_IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(_IMAGENET_STD, jnp.float32)
    return ((x.astype(jnp.float32) / 255.0 - mean) / std).astype(dtype)


def stem_norm_mode() -> str:
    """How stems consume RAW integer frames (the uint8 device feed):

    * ``affine`` (default): cast + normalize in the compute dtype right
      before the stem conv. XLA CSEs the identical expression across
      the two RGB trunks, so the frames materialize ONCE in bf16 (half
      the f32 feed's bytes). Measured fastest on v5e — the two-stem
      experiment (tools/exp_two_stem_u8.py, b160): 61.7 ms vs 65.3 (f32
      feed) vs 72.8 (fold) — because XLA:TPU does not fuse the u8→bf16
      convert into the conv's input read, so the fold pays a private
      convert per trunk PLUS the border-correction map add.
    * ``fold``: fold the affine into the conv weights + a batch-1
      border-correction conv (round-3 design, kept for measurement and
      for hardware where the convert does fuse).

    Read at trace time from ``EGOT2X_STEM_NORM``.
    """
    import os

    return os.environ.get("EGOT2X_STEM_NORM", "affine")


class BasicBlock2D(nn.Module):
    filters: int
    stride: int = 1
    quant: bool = False  # int8 static-PTQ convs (egot2x.nn.quant)
    dtype: Dtype = jnp.float32

    def _conv(self, features, kernel, stride, name):
        if self.quant:
            from egot2x.nn.quant import QuantConv

            return QuantConv(features, kernel, strides=(stride, stride),
                             padding=[(kernel[0] // 2,) * 2,
                                      (kernel[1] // 2,) * 2],
                             dtype=self.dtype, name=name)
        conv = nn.Conv(features, kernel, strides=(stride, stride),
                       padding=[(kernel[0] // 2,) * 2, (kernel[1] // 2,) * 2],
                       use_bias=False, dtype=self.dtype, name=name)
        return lambda x, calibrate=False, in_scale=None: conv(x)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 calibrate: bool = False,
                 in_scale: jax.Array = None,
                 quant_out: bool = False):
        """``in_scale``: scale of an ALREADY-int8 ``x`` (quantized
        upstream); the convs consume it directly and the residual
        dequantizes in the add epilogue. ``quant_out``: emit the block
        output as int8 with this block's calibrated ``out_act_max`` —
        returns ``(int8, scale)`` so stage blocks chain int8 HBM
        traffic end to end (measured 31.8 → 24.1 ms for the two layer1
        blocks at b128, tools/exp_requant_chain.py)."""
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        pre_quantized = x.dtype == jnp.int8
        identity = x
        y = self._conv(self.filters, (3, 3), self.stride, "conv1")(
            x, calibrate=calibrate, in_scale=in_scale)
        y = norm("bn1")(y)
        y = nn.relu(y)
        y = self._conv(self.filters, (3, 3), 1, "conv2")(y, calibrate=calibrate)
        y = norm("bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.filters:
            identity = self._conv(self.filters, (1, 1), self.stride,
                                  "downsample_conv")(x, calibrate=calibrate,
                                                     in_scale=in_scale)
            identity = norm("downsample_bn")(identity)
        elif pre_quantized:
            # dequant fuses into the residual-add epilogue; reads the
            # int8 x (half the bytes of the float it replaced)
            identity = (x.astype(jnp.float32) * in_scale).astype(self.dtype)
        out = nn.relu(y + identity)
        if self.quant and quant_out:
            from egot2x.nn.quant import quantize_static

            out_max = self.variable("quant", "out_act_max",
                                    lambda: jnp.zeros((), jnp.float32))
            if calibrate or self.is_initializing():
                if not self.is_initializing():
                    out_max.value = jnp.maximum(
                        out_max.value,
                        jnp.max(jnp.abs(out)).astype(jnp.float32))
                return out, None
            return quantize_static(out, out_max.value)
        return out, None


def _s2d_stem_conv(x: jax.Array, kernel: jax.Array, dtype) -> jax.Array:
    """Space-to-depth 7×7/2 stem conv: mathematically identical to
    conv(x, kernel, stride 2, pad 3) but reshapes the input into 2×2
    pixel blocks (3→12 channels) and the kernel to 4×4×12, quadrupling
    MXU lane utilization on the 3-channel stem — the standard TPU
    small-channel-stem transform. The parameter stays the original
    (7, 7, 3, 64) kernel, so checkpoints are unaffected."""
    b, h, w, c = x.shape
    out = kernel.shape[-1]
    # pad input: left 3 (orig); right enough to cover k=8 and land on an
    # even padded size (extra zeros never reach a valid window)
    pr_h = 5 + (h + 8) % 2
    pr_w = 5 + (w + 8) % 2
    xp = jnp.pad(x, ((0, 0), (3, pr_h), (3, pr_w), (0, 0)))
    hp, wp = xp.shape[1] // 2, xp.shape[2] // 2
    xs = xp.reshape(b, hp, 2, wp, 2, c)
    xs = jnp.transpose(xs, (0, 1, 3, 2, 4, 5)).reshape(b, hp, wp, 4 * c)
    kp = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))  # 7→8, zeros
    k2 = kp.reshape(4, 2, 4, 2, c, out)
    k2 = jnp.transpose(k2, (0, 2, 1, 3, 4, 5)).reshape(4, 4, 4 * c, out)
    y = jax.lax.conv_general_dilated(
        xs.astype(dtype), k2.astype(dtype), window_strides=(1, 1),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y[:, : (h + 1) // 2, : (w + 1) // 2, :]


class _StemConv(nn.Module):
    """7×7/2 stem conv with the same param layout as ``nn.Conv``
    (kernel under this module's scope), optionally running through the
    space-to-depth transform.

    ``fold_norm``: consume RAW integer pixels by folding the
    ToTensor+ImageNet-Normalize affine into the conv. Exact:
    ``x_norm = x·a + b`` per channel (``a = 1/(255σ)``, ``b = −μ/σ``)
    and conv is linear, so ``conv(x_norm, W) = conv(x, W·a) + M`` where
    ``M = conv(b·1_image, W)`` — a (1, H/2, W/2, width) constant map
    whose borders carry the zero-padding correction (interior is the
    constant ``b·ΣW``; border windows overlap the padding, where the
    normalized input would be 0, not b). M is one batch-1 conv: free at
    trace time when weights are jit constants (the bench), ~1/B of the
    stem otherwise. The payoff is HBM/link traffic: no materialized
    normalized tensor anywhere — the stem reads the uint8 frames
    directly at 1/4 the bytes, even when the same video fans out to
    two trunks (the flagship translator)."""

    width: int
    fused: bool
    fold_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, x.shape[-1], self.width), jnp.float32)
        if self.fused:
            conv = lambda v, k: _s2d_stem_conv(v, k, self.dtype)
        else:
            conv = lambda v, k: jax.lax.conv_general_dilated(
                v.astype(self.dtype), k.astype(self.dtype),
                window_strides=(2, 2), padding=[(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.fold_norm:
            if stem_norm_mode() == "affine":
                return conv(normalize_u8_frames(x, self.dtype), kernel)
            mean = jnp.asarray(_IMAGENET_MEAN, jnp.float32)
            std = jnp.asarray(_IMAGENET_STD, jnp.float32)
            k_eff = kernel / (255.0 * std)[None, None, :, None]
            bias_img = jnp.broadcast_to(-mean / std,
                                        (1,) + x.shape[1:3] + (x.shape[-1],))
            return conv(x, k_eff) + conv(bias_img, kernel)
        return conv(x, kernel)


class ResNet2D(nn.Module):
    """ResNet-18/34-style 2D encoder with the reference's fc/fc2 head.

    ``forward_features`` (pooled 512-d) is used by backbones that bypass
    the classifier head. ``fused_stem`` applies the space-to-depth stem
    transform (same parameters, same math); measured neutral on v5e —
    XLA already pads/transforms small-channel stems — so it defaults
    off and remains available for hardware where XLA does not.
    """

    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    num_classes: int = 3  # reference default fc2: 1000→3
    fc2_features: int = 1000
    width: int = 64
    fused_stem: bool = False
    quant: bool = False  # int8 static-PTQ convs (egot2x.nn.quant)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 features_only: bool = False,
                 calibrate: bool = False,
                 stem_in=None) -> jax.Array:
        # ``stem_in``: (int8 pooled stem map (N, H/4, W/4, width), scalar
        # scale) computed EXTERNALLY — the fused dual-stem deployment path
        # (egot2x.nn.fused_stem): two trunks consuming the same frames run
        # one (7,7,3,2·width) stem conv so the int8 map writes at full
        # (32, 128) lane density. Inference-only; this trunk's own stem
        # parameters are simply not referenced.
        if stem_in is not None:
            assert self.quant and not train and not calibrate \
                and not self.is_initializing(), \
                "stem_in is an int8-inference-only fast path"
            y, in_scale = stem_in
        else:
            y, in_scale = self._stem(x, train, calibrate)
        n_stages = len(self.stage_sizes)
        for stage, blocks in enumerate(self.stage_sizes):
            filters = self.width * (2 ** stage)
            for b in range(blocks):
                stride = 2 if stage > 0 and b == 0 else 1
                # chain int8 between blocks: every block consumes the
                # previous block's int8 output; only the last block
                # (feeding the float global-avg-pool head) emits bf16
                last = stage == n_stages - 1 and b == blocks - 1
                y, in_scale = BasicBlock2D(filters, stride, quant=self.quant,
                                           dtype=self.dtype,
                                           name=f"layer{stage + 1}_{b}")(
                    y, train=train, calibrate=calibrate, in_scale=in_scale,
                    quant_out=self.quant and not last)
        y = jnp.mean(y, axis=(1, 2))  # global average pool → (B, 512)
        if features_only:
            return y
        y = nn.Dense(self.fc2_features, dtype=self.dtype, name="fc")(y)
        y = nn.Dense(self.num_classes, dtype=self.dtype, name="fc2")(y)
        return y

    def _stem(self, x, train, calibrate):
        # Stem: 7x7/2 conv + BN + relu + 3x3/2 maxpool. The stem stays
        # FLOAT even under quant: with C_in=3 the contraction depth (147)
        # starves the int8 MXU and measured int8 is not faster there —
        # the win comes from the 64-512 channel stage convs. Integer
        # (raw uint8) input is normalized per stem_norm_mode(): the
        # default in-jit bf16 affine (CSE-shared across trunks) or the
        # norm-folded conv weights (see _StemConv).
        y = _StemConv(self.width, self.fused_stem,
                      fold_norm=jnp.issubdtype(x.dtype, jnp.integer),
                      dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        # Under quant inference, quantize BEFORE the 3x3/2 maxpool: the
        # pool then moves int8 (half the HBM traffic of bf16 — this is
        # the stem's dominant cost at 112x112x64) and layer1's first
        # conv consumes the int8 directly. Exact: max commutes with the
        # monotonic quantizer, and the pre-pool max equals the post-pool
        # max, so one calibrated scale serves both sides (measured
        # −5.7 ms/trunk at b128, tools/exp_stem_fold.py).
        in_scale = None
        if self.quant:
            from egot2x.nn.quant import max_pool_int8, quantize_static

            stem_max = self.variable("quant", "stem_act_max",
                                     lambda: jnp.zeros((), jnp.float32))
            if calibrate or self.is_initializing():
                if not self.is_initializing():
                    stem_max.value = jnp.maximum(
                        stem_max.value,
                        jnp.max(jnp.abs(y)).astype(jnp.float32))
                y = nn.max_pool(y, (3, 3), strides=(2, 2),
                                padding=[(1, 1), (1, 1)])
            else:
                y, in_scale = quantize_static(y, stem_max.value)
                y = max_pool_int8(y, (3, 3), (2, 2), [(1, 1), (1, 1)])
        else:
            y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        return y, in_scale


def resnet18(num_classes: int = 256, dtype=jnp.float32) -> ResNet2D:
    """ResNet-18 with fc2 → ``num_classes`` (users set 256 for backbones,
    reference HHI/models/lam/model.py:52-54)."""
    return ResNet2D(stage_sizes=(2, 2, 2, 2), num_classes=num_classes, dtype=dtype)


class ResNetCAM(nn.Module):
    """CAM variant (reference HHI/models/lam/resnet.py:162-196): same
    trunk as :class:`ResNet2D` but exposes the pre-pool feature map for
    class-activation mapping; head is fc1(512→1000) + fc2(1000→3)."""

    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    num_classes: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 return_feature_map: bool = False):
        y = _StemConv(64, False, dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for stage, blocks in enumerate(self.stage_sizes):
            filters = 64 * (2 ** stage)
            for b in range(blocks):
                stride = 2 if stage > 0 and b == 0 else 1
                y, _ = BasicBlock2D(filters, stride, dtype=self.dtype,
                                    name=f"layer{stage + 1}_{b}")(y, train=train)
        if return_feature_map:
            return y  # (B, H/32, W/32, 512) for CAM
        y = jnp.mean(y, axis=(1, 2))
        y = nn.Dense(1000, dtype=self.dtype, name="fc1")(y)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc2")(y)
