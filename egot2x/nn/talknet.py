"""TalkNet audio-visual active-speaker model.

Behavioral reference: HHI/models/asd/ — ``talkNetModel``
(talkNetModel.py:16-73), ``visualFrontend``/``visualTCN``/
``visualConv1D``/``GlobalLayerNorm`` (visualEncoder.py:17-178),
``audioEncoder`` SE-ResNet (audioEncoder.py:11-114), ``attentionLayer``
(attentionLayer.py:12-42).

Pipeline: grayscale 112×112 lip crops → Conv3D(5,7,7) stem + AVSR-style
ResNet-18 → 512/frame → depthwise-separable TCN → 128/frame; MFCC
(B, 4T, 13) → SE-ResNet (time ↓4×) → 128/frame; A↔V cross-attention
(d=128, 8 heads) → concat → AV self-attention (d=256).

Deviation from the reference, by design: the reference reshapes the
whole batch into one depth axis before the 3D stem
(talkNetModel.py:39-41 + visualEncoder.py:126-136), so its temporal
conv leaks across sample boundaries within a batch. Here the stem runs
per sample (B, T, H, W, 1) with same-padding — no cross-sample leakage,
and XLA batches it on the MXU.

BN in this stack uses the AVSR settings momentum 0.01 / eps 1e-3
(visualEncoder.py:30).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from egot2x.nn.common import MultiHeadAttention

Dtype = Any


def _bn(train: bool, dtype, name: str, momentum: float = 0.99, eps: float = 1e-3):
    return nn.BatchNorm(use_running_average=not train, momentum=momentum,
                        epsilon=eps, dtype=dtype, name=name)


class AVSRResNetLayer(nn.Module):
    """Two-block residual layer (visualEncoder.py:17-59)."""

    filters: int
    stride: int
    quant: bool = False  # int8 static-PTQ convs (egot2x.nn.quant)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 calibrate: bool = False,
                 in_scale: jax.Array = None,
                 quant_out: bool = False):
        """``in_scale``: scale of an ALREADY-int8 ``x``. ``quant_out``:
        emit the layer output as int8 with a calibrated max and return
        ``(int8, scale)`` so the four AVSR layers chain int8 HBM traffic
        (the inter-layer maps are (B·T, 28, 28, C) — hundreds of MB at
        the bench batch); mirrors nn/resnet2d.py block chaining."""
        if self.quant:
            from egot2x.nn.quant import QuantConv

            def conv(f, s, name, k=(3, 3)):
                qc = QuantConv(f, k, strides=(s, s),
                               padding=[(k[0] // 2,) * 2, (k[1] // 2,) * 2],
                               dtype=self.dtype, name=name)
                return lambda t, scale=None: qc(t, calibrate=calibrate,
                                                in_scale=scale)
        else:
            def conv(f, s, name, k=(3, 3)):
                c = nn.Conv(f, k, strides=(s, s),
                            padding=[(k[0] // 2,) * 2, (k[1] // 2,) * 2],
                            use_bias=False, dtype=self.dtype, name=name)
                return lambda t, scale=None: c(t)
        y = nn.relu(_bn(train, self.dtype, "bn1a")(
            conv(self.filters, self.stride, "conv1a")(x, in_scale)))
        y = conv(self.filters, 1, "conv2a")(y)
        if self.stride == 1:
            # dequant fuses into the residual-add epilogue when the
            # layer input arrived pre-quantized (int8 stem pool)
            residual = ((x.astype(jnp.float32) * in_scale).astype(self.dtype)
                        if x.dtype == jnp.int8 else x)
        else:
            # QuantConv under quant so a chained int8 x feeds the 1x1
            # projection directly (param layout identical to nn.Conv)
            residual = conv(self.filters, self.stride, "downsample",
                            k=(1, 1))(x, in_scale)
        y = y + residual
        intermediate = y
        y = nn.relu(_bn(train, self.dtype, "outbna")(y))
        z = nn.relu(_bn(train, self.dtype, "bn1b")(conv(self.filters, 1, "conv1b")(y)))
        z = conv(self.filters, 1, "conv2b")(z)
        z = z + intermediate
        out = nn.relu(_bn(train, self.dtype, "outbnb")(z))
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


class _Stem3DConv(nn.Module):
    """5x7x7/(1,2,2) stem conv with the same param layout as ``nn.Conv``
    but a space-to-depth execution path for inference: C_in=1 starves
    the MXU sublanes (measured 8.3 TF/s at the bench shapes), while the
    h2xw4-packed equivalent — (5,4,3,8,128) kernel on (T, H/2, W/4, 8)
    input, the two output-w phases packed into channels — runs 1.7x
    faster and lets the following maxpool consume the packed phases
    without an unpack transpose (tools/exp_stem_pack.py). Mathematically
    identical (kernel re-indexing only); the parameter stays
    (5, 7, 7, 1, 64) so checkpoint import is unchanged."""

    width: int = 64
    dtype: Dtype = jnp.float32

    def _run(self, x: jax.Array, kernel: jax.Array,
             packed: bool) -> jax.Array:
        if not packed:
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype), (1, 2, 2),
                [(2, 2), (3, 3), (3, 3)],
                dimension_numbers=("NTHWC", "THWIO", "NTHWC"))
        from egot2x.ops.pallas_stem import _IDX2D, _MASK2D

        b, t, h, w, _ = x.shape
        # input: px-pad 4 (covers the stem's pad 3), s2d h2xw4
        xp = jnp.pad(x[..., 0], ((0, 0), (0, 0), (4, 4), (4, 4)))
        hp, wp = h + 8, w + 8
        xs = xp.reshape(b, t, hp // 2, 2, wp // 4, 4)
        xs = jnp.transpose(xs, (0, 1, 2, 4, 3, 5)).reshape(
            b, t, hp // 2, wp // 4, 8)
        # kernel: (5,7,7,1,F) -> (5,4,3,8,2F) by tap re-indexing
        kf = kernel.reshape(5, 49, self.width)
        g = kf[:, jnp.asarray(_IDX2D)] * jnp.asarray(_MASK2D)[..., None]
        kp = g.reshape(5, 4, 3, 8, 2 * self.width)
        y = jax.lax.conv_general_dilated(
            xs.astype(self.dtype), kp.astype(self.dtype), (1, 1, 1),
            [(2, 2), (0, 0), (0, 0)],
            dimension_numbers=("NTHWC", "THWIO", "NTHWC"))
        return y[:, :, : h // 2]  # (B, T, H/2, W/4, 2F)

    @nn.compact
    def __call__(self, x: jax.Array, packed: bool = False,
                 fold_norm=None) -> jax.Array:
        """x (B, T, H, W, 1). Unpacked: (B, T, H/2, W/2, 64).
        Packed: (B, T, H/2, W/4, 128) with w-phases in channels.

        ``fold_norm=(a, b)``: consume raw integer pixels by folding the
        scalar normalization ``x·a + b`` into the conv (exact, conv is
        linear): ``conv(x·a + b·1_img, K) = conv(x, K·a) + b·conv(1_img,
        K)`` — the second term is a batch-1 constant map carrying the
        zero-padding border correction (in both T and H/W). Raw uint8
        then rides HBM at half the bf16 bytes with no normalized
        intermediate."""
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (5, 7, 7, 1, self.width), jnp.float32)
        if fold_norm is None:
            return self._run(x, kernel, packed)
        a, b = fold_norm
        ones = jnp.ones((1,) + x.shape[1:], jnp.float32)
        return self._run(x, kernel * a, packed) + b * self._run(
            ones, kernel, packed)


def _packed_phase_pool(y: jax.Array) -> jax.Array:
    """maxpool 3x3/2 pad 1 on a w-phase-packed map (N, H, W/2, 2C) ->
    (N, H/2, W/2, C); the stride-2 w-window consumes the two phases:
    out px col m = max(A[m], B[m], B[m-1]). int8-safe: quantizing
    BEFORE this pool halves its HBM traffic (max commutes with the
    monotonic quantizer)."""
    if y.dtype == jnp.int8:
        neg, pad_val = jnp.int8(-128), -128
    else:
        # a CONCRETE python -inf, not a large-finite sentinel and not a
        # jnp constant: JAX only dispatches to the differentiable
        # reduce_window_max when the init is recognizably the max
        # identity, and under jit tracing a jnp.asarray(-inf) becomes a
        # traced constant the pattern-match cannot see — binding the
        # generic reduce_window_p, which has no autodiff rule. nofreeze
        # training differentiates through this pool (the frozen-eval
        # TalkNet graph with live gradients).
        neg, pad_val = -jnp.inf, -jnp.inf
    c = y.shape[-1] // 2
    yh = jax.lax.reduce_window(
        y, neg, jax.lax.max, (1, 3, 1, 1), (1, 2, 1, 1),
        [(0, 0), (1, 1), (0, 0), (0, 0)])
    a, b = yh[..., :c], yh[..., c:]
    b_prev = jnp.pad(b, ((0, 0), (0, 0), (1, 0), (0, 0)),
                     constant_values=pad_val)[:, :, :-1]
    return jnp.maximum(jnp.maximum(a, b), b_prev)


class VisualFrontend(nn.Module):
    """(B, T, 112, 112) gray in [0, 255] → (B, T, 512)."""

    quant: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 calibrate: bool = False) -> jax.Array:
        b, t, h, w = x.shape
        # TalkNet input normalization (talkNetModel.py:41). Integer (raw
        # uint8) input is handled per stem_norm_mode(): the default
        # in-jit affine in the compute dtype, or the norm-folded stem
        # conv (_Stem3DConv fold_norm). Float input keeps the explicit
        # normalize, computed in the compute dtype.
        from egot2x.nn.resnet2d import stem_norm_mode

        fold = None
        if (jnp.issubdtype(x.dtype, jnp.integer)
                and stem_norm_mode() == "fold"):
            fold = (1.0 / (255.0 * 0.1688), -0.4161 / 0.1688)
            x = x.astype(self.dtype)
        else:
            x = x.astype(self.dtype)
            x = (x / 255.0 - 0.4161) / 0.1688
        x = x[..., None]  # (B, T, H, W, 1) NTHWC
        bt = b * t
        stem = _Stem3DConv(64, dtype=self.dtype, name="frontend3d_conv")
        bn = _bn(train, self.dtype, "frontend3d_bn")
        in_scale = None
        stem_max = (self.variable("quant", "stem_act_max",
                                  lambda: jnp.zeros((), jnp.float32))
                    if self.quant else None)
        if train:
            # training keeps the px layout: BN batch stats must be per
            # real channel, not per (phase, channel) pair
            y = stem(x, packed=False, fold_norm=fold)
            y = nn.relu(bn(y))
            y = y.reshape(bt, *y.shape[2:])
            y = nn.max_pool(y, (3, 3), strides=(2, 2),
                            padding=[(1, 1), (1, 1)])
        else:
            # inference: packed stem; eval-BN is per-channel affine, so
            # it applies on the phase-packed layout via jnp.tile inside
            # flax BatchNorm broadcasting — run BN on a (…, 2, 64) view
            y = stem(x, packed=True, fold_norm=fold)  # (B, T, 56, 28, 128)
            yv = y.reshape(*y.shape[:-1], 2, 64)
            yv = nn.relu(bn(yv))
            y = yv.reshape(*y.shape)
            y = y.reshape(bt, *y.shape[2:])
            # quant inference: int8 BEFORE the phase pool (half traffic;
            # exact — see _packed_phase_pool) feeding layer1 directly
            if self.quant:
                from egot2x.nn.quant import quantize_static

                if calibrate:
                    stem_max.value = jnp.maximum(
                        stem_max.value,
                        jnp.max(jnp.abs(y)).astype(jnp.float32))
                elif not self.is_initializing():
                    y, in_scale = quantize_static(y, stem_max.value)
            y = _packed_phase_pool(y)           # (BT, 28, 28, 64)
        layers = [(64, 1), (128, 2), (256, 2), (512, 2)]
        for i, (f, s) in enumerate(layers):
            # chain int8 between layers; the last layer feeds the float
            # global-mean head, so it emits bf16
            y, in_scale = AVSRResNetLayer(f, s, quant=self.quant,
                                          dtype=self.dtype,
                                          name=f"layer{i + 1}")(
                y, train=train, calibrate=calibrate, in_scale=in_scale,
                quant_out=self.quant and i < len(layers) - 1)
        # AvgPool2d(4,4) stride 1 on a 4x4 map == global mean
        y = jnp.mean(y, axis=(1, 2))
        return y.reshape(b, t, 512)


class GlobalLayerNorm(nn.Module):
    """gLN over (T, C) jointly with per-channel affine (visualEncoder.py:91-106)."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, T, C)
        gamma = self.param("gamma", nn.initializers.ones, (self.channels,), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (self.channels,), jnp.float32)
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=(1, 2), keepdims=True)
        return gamma * (x - mean) / jnp.sqrt(var + 1e-8) + beta


class DSConv1d(nn.Module):
    """Residual depthwise-separable temporal conv block (visualEncoder.py:139-153)."""

    channels: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:  # (B, T, C)
        y = nn.relu(x)
        y = _bn(train, self.dtype, "bn", momentum=0.9, eps=1e-5)(y)
        y = nn.Conv(self.channels, (3,), padding=[(1, 1)], use_bias=False,
                    feature_group_count=self.channels, dtype=self.dtype,
                    name="depthwise")(y)
        alpha = self.param("prelu_alpha", nn.initializers.constant(0.25), (1,), jnp.float32)
        y = jnp.where(y >= 0, y, alpha * y)
        y = GlobalLayerNorm(self.channels, dtype=self.dtype, name="gln")(y)
        y = nn.Conv(self.channels, (1,), use_bias=False, dtype=self.dtype,
                    name="pointwise")(y)
        return y + x


class VisualTCN(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        for i in range(5):
            x = DSConv1d(512, dtype=self.dtype, name=f"block{i}")(x, train=train)
        return x


class VisualConv1D(nn.Module):
    """512 → 128 temporal conv head (visualEncoder.py:168-178)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y = nn.Conv(256, (5,), padding=[(2, 2)], dtype=self.dtype, name="conv5")(x)
        y = _bn(train, self.dtype, "bn", momentum=0.9, eps=1e-5)(y)
        y = nn.relu(y)
        return nn.Conv(128, (1,), dtype=self.dtype, name="conv1")(y)


class AudioSEBlock(nn.Module):
    filters: int
    stride: tuple = (1, 1)
    reduction: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        bn = lambda name: _bn(train, self.dtype, name, momentum=0.9, eps=1e-5)
        residual = x
        y = nn.Conv(self.filters, (3, 3), strides=self.stride, padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(y)
        y = bn("bn1")(y)
        y = nn.Conv(self.filters, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = bn("bn2")(y)
        # SE
        se = jnp.mean(y, axis=(1, 2))
        se = nn.relu(nn.Dense(self.filters // self.reduction, dtype=self.dtype, name="se_fc0")(se))
        se = jax.nn.sigmoid(nn.Dense(self.filters, dtype=self.dtype, name="se_fc1")(se))
        y = y * se[:, None, None, :]
        if self.stride != (1, 1) or x.shape[-1] != self.filters:
            residual = nn.Conv(self.filters, (1, 1), strides=self.stride, use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(x)
            residual = bn("downsample_bn")(residual)
        return nn.relu(y + residual)


class AudioEncoder(nn.Module):
    """(B, 4T, 13) MFCC → (B, T, 128) (audioEncoder.py:60-114).

    Input layout: reference feeds (B, 1, 13, 4T) NCHW with freq as H; in
    NHWC we use (B, 13, 4T, 1) — stem stride (2,1) over (freq, time),
    stages 2/3 stride (2,2) give the ÷4 temporal rate; mean over freq.
    """

    layers: tuple = (3, 4, 6, 3)
    num_filters: tuple = (16, 32, 64, 128)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, mfcc: jax.Array, train: bool = False) -> jax.Array:
        x = jnp.swapaxes(mfcc, 1, 2)[..., None].astype(self.dtype)  # (B, 13, 4T, 1)
        x = nn.Conv(self.num_filters[0], (7, 7), strides=(2, 1), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = _bn(train, self.dtype, "bn1", momentum=0.9, eps=1e-5)(x)
        x = nn.relu(x)
        strides = [(1, 1), (2, 2), (2, 2), (1, 1)]
        for li, (f, n, s) in enumerate(zip(self.num_filters, self.layers, strides)):
            for b in range(n):
                x = AudioSEBlock(f, s if b == 0 else (1, 1), dtype=self.dtype,
                                 name=f"layer{li + 1}_{b}")(x, train=train)
        x = jnp.mean(x, axis=1)  # mean over freq → (B, T, C)
        return x


class CrossAttentionLayer(nn.Module):
    """Post-LN block: MHA(tar, src, src) + FFN(4×) (attentionLayer.py:12-42).

    The attention residual lands on SRC (attentionLayer.py:36
    ``src = src + dropout(attn(query=tar, key=src, value=src))``) — the
    query stream only steers; the output stays aligned to src. For
    ``self_av`` src == tar so either wiring is identical; for the cross
    A↔V layers the distinction is real (caught by the full-flagship
    golden, tests/test_torch_import_egot2s_ttm.py)."""

    d_model: int
    num_heads: int
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, src: jax.Array, tar: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        attn = MultiHeadAttention(self.d_model, self.num_heads,
                                  dropout_rate=self.dropout, dtype=self.dtype,
                                  name="self_attn")(
            tar, src, src, deterministic=deterministic)
        x = src + nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        h = nn.Dense(self.d_model * 4, dtype=self.dtype, name="linear1")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(h)
        x = x + nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(dtype=self.dtype, name="norm2")(x)


class TalkNetModel(nn.Module):
    """Full TalkNet backbone. Returns per-frame features:
    outsAV (B, T, 256), outsA (B, T, 128), outsV (B, T, 128)."""

    quant: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        self.visual_frontend = VisualFrontend(quant=self.quant,
                                              dtype=self.dtype)
        self.visual_tcn = VisualTCN(dtype=self.dtype)
        self.visual_conv1d = VisualConv1D(dtype=self.dtype)
        self.audio_encoder = AudioEncoder(dtype=self.dtype)
        self.cross_a2v = CrossAttentionLayer(128, 8, dtype=self.dtype)
        self.cross_v2a = CrossAttentionLayer(128, 8, dtype=self.dtype)
        self.self_av = CrossAttentionLayer(256, 8, dtype=self.dtype)

    def forward_visual_frontend(self, faces, train=False, deterministic=True,
                                calibrate=False):
        x = self.visual_frontend(faces, train=train, calibrate=calibrate)
        x = self.visual_tcn(x, train=train)
        return self.visual_conv1d(x, train=train)

    def forward_audio_frontend(self, mfcc, train=False):
        return self.audio_encoder(mfcc, train=train)

    def forward_cross_attention(self, audio_embed, visual_embed, deterministic=True):
        a_c = self.cross_a2v(src=audio_embed, tar=visual_embed, deterministic=deterministic)
        v_c = self.cross_v2a(src=visual_embed, tar=audio_embed, deterministic=deterministic)
        # reference: crossA2V(src=x1=audio, tar=x2=visual) returns the
        # *audio-attended* stream aligned to x1_c naming (talkNetModel.py:55-58)
        return a_c, v_c

    def __call__(self, mfcc, faces, train=False, deterministic=True,
                 calibrate=False):
        audio_embed = self.forward_audio_frontend(mfcc, train=train)
        visual_embed = self.forward_visual_frontend(faces, train=train,
                                                    deterministic=deterministic,
                                                    calibrate=calibrate)
        # align time lengths (audio T = 4T//4 may differ by 1 from video T)
        t = min(audio_embed.shape[1], visual_embed.shape[1])
        audio_embed = audio_embed[:, :t]
        visual_embed = visual_embed[:, :t]
        x1, x2 = self.forward_cross_attention(audio_embed, visual_embed,
                                              deterministic=deterministic)
        outs_av = self.self_av(src=jnp.concatenate([x1, x2], axis=2),
                               tar=jnp.concatenate([x1, x2], axis=2),
                               deterministic=deterministic)
        return outs_av, x1, x2
