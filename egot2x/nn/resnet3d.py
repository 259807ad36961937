"""PySlowFast-style 3D ResNet (single pathway) in NTHWC.

Behavioral reference: HOI/models/pnr/video_model_builder.py:18-299 —
temporal-kernel tables per ARCH (c2d / i3d / slow / slow_layer3-5,
:22-88), bottleneck transform stages (resnet_helper.py), stem with
spatial maxpool (stem_helper.py), and the PNR heads
(head_helper.py:293-381).

Shape walk for the reference ts_pnr config (CROP_SIZE 225, slow_layer5):
225 → stem conv /2 → 113 → stem maxpool /2 → 57 → s3 /2 → 29 → s4 /2 →
15 → s5 /2 → 8; keyframe head avg-pools (1,7,7) stride 1 → 2×2 spatial,
flattened with 2048 channels to the reference's 8192-d per-frame tokens.

TPU notes: NTHWC keeps channels in the lane dimension for the MXU; all
convs are static-shape; bf16-friendly via the dtype arg.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

MODEL_STAGE_DEPTH = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}

# conv1 + res2..res5 temporal kernels per architecture
# (reference video_model_builder.py:22-88)
TEMPORAL_KERNEL_BASIS = {
    "c2d": [[1], [1], [1], [1], [1]],
    "c2d_nopool": [[1], [1], [1], [1], [1]],
    "i3d": [[5], [3], [3, 1], [3, 1], [1, 3]],
    "i3d_nopool": [[5], [3], [3, 1], [3, 1], [1, 3]],
    "slow": [[1], [1], [1], [3], [3]],
    "slow_layer3": [[1], [1], [3], [3], [3]],
    "slow_layer4": [[1], [3], [3], [3], [3]],
    "slow_layer5": [[3], [3], [3], [3], [3]],
}

# post-res2 temporal pool per architecture (reference _POOL1)
POOL1 = {
    "c2d": (2, 1, 1),
    "c2d_nopool": (1, 1, 1),
    "i3d": (2, 1, 1),
    "i3d_nopool": (1, 1, 1),
    "slow": (1, 1, 1),
    "slow_layer3": (1, 1, 1),
    "slow_layer4": (1, 1, 1),
    "slow_layer5": (1, 1, 1),
}


def _bn(train, dtype, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, name=name)


class Nonlocal(nn.Module):
    """Non-local block (Wang et al. 2018) in NTHWC.

    Behavioral reference: HOI/models/lta/nonlocal_helper.py:13-145 —
    theta/phi/g 1×1×1 convs (dim → dim_inner, bias on), optional
    max-pool on the phi/g branch, affinity normalized by softmax
    (scaled by dim_inner^-0.5) or dot_product (divided by the pooled
    position count), out conv back to dim, zero-init BN, residual add.

    TPU note: the THW×THW affinity is one big batched matmul per clip —
    einsum keeps it on the MXU with channels in the contraction.
    """

    dim_inner: int
    pool_size: Any = None  # (t, h, w) max-pool on phi/g, or None
    instantiation: str = "dot_product"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, h, w, c = x.shape
        theta = nn.Conv(self.dim_inner, (1, 1, 1), dtype=self.dtype,
                        name="conv_theta")(x)
        xp = x
        if self.pool_size is not None and any(s > 1 for s in self.pool_size):
            ps = tuple(self.pool_size)
            xp = nn.max_pool(x, ps, strides=ps)
        phi = nn.Conv(self.dim_inner, (1, 1, 1), dtype=self.dtype,
                      name="conv_phi")(xp)
        g = nn.Conv(self.dim_inner, (1, 1, 1), dtype=self.dtype,
                    name="conv_g")(xp)
        theta = theta.reshape(b, t * h * w, self.dim_inner)
        phi = phi.reshape(b, -1, self.dim_inner)
        g = g.reshape(b, -1, self.dim_inner)
        aff = jnp.einsum("bqc,bpc->bqp", theta, phi)
        if self.instantiation == "softmax":
            aff = jax.nn.softmax(
                aff.astype(jnp.float32) * self.dim_inner ** -0.5, axis=2
            ).astype(theta.dtype)
        elif self.instantiation == "dot_product":
            aff = aff / aff.shape[2]
        else:
            raise NotImplementedError(
                f"Unknown nonlocal instantiation {self.instantiation}")
        y = jnp.einsum("bqp,bpc->bqc", aff, g).reshape(
            b, t, h, w, self.dim_inner)
        y = nn.Conv(c, (1, 1, 1), dtype=self.dtype, name="conv_out")(y)
        # zero_init_final_norm=True (reference default): the block starts
        # as identity
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         scale_init=nn.initializers.zeros, name="bn")(y)
        return x + y


def resolve_nonlocal(location, group=None, pool=None,
                     instantiation="dot_product", pathway=0):
    """Reference NONLOCAL.{LOCATION,GROUP,POOL,INSTANTIATION} lists →
    the per-stage ``nonlocal_cfg`` tuple ResNet3D consumes, or None when
    no stage enables a block. ``location`` is the reference per-stage ×
    per-pathway nesting ([[[]], [[]], [[]], [[]]] default)."""
    if location is None:
        return None
    sel = lambda stage: tuple(stage[pathway]) if stage and isinstance(
        stage[0], (list, tuple)) else tuple(stage)
    inds = tuple(sel(s) for s in location)
    if not any(inds):
        return None
    grp = tuple((s[pathway] if isinstance(s, (list, tuple)) else s)
                for s in (group or [1] * 4))
    pl = tuple(tuple(p) for p in (pool or [[1, 2, 2]] * 4))
    return (inds, grp, pl, instantiation)


class BottleneckTransform(nn.Module):
    """Tx1x1 → 1x3x3(stride) → 1x1x1 bottleneck (resnet_helper.py).

    ``quant=True`` swaps the three convs for int8 static-PTQ
    :class:`~egot2x.nn.quant.QuantConv3D` (same param layout; the
    ``quant`` collection carries the calibrated activation scales)."""

    dim_out: int
    dim_inner: int
    temp_kernel: int
    stride: int
    dilation: int = 1
    quant: bool = False
    dtype: Dtype = jnp.float32

    def _conv(self, features, kernel, strides, padding, dilation, name):
        if self.quant:
            from egot2x.nn.quant import QuantConv3D

            return QuantConv3D(features, kernel, strides=strides,
                               padding=padding, kernel_dilation=dilation,
                               dtype=self.dtype, name=name)
        conv = nn.Conv(features, kernel, strides=strides, padding=padding,
                       kernel_dilation=dilation, use_bias=False,
                       dtype=self.dtype, name=name)
        return lambda x, calibrate=False: conv(x)

    @nn.compact
    def __call__(self, x, train: bool = False, calibrate: bool = False):
        t = self.temp_kernel
        y = self._conv(self.dim_inner, (t, 1, 1), (1, 1, 1),
                       [(t // 2, t // 2), (0, 0), (0, 0)], None,
                       "a")(x, calibrate=calibrate)
        y = nn.relu(_bn(train, self.dtype, "a_bn")(y))
        d = self.dilation
        y = self._conv(self.dim_inner, (1, 3, 3),
                       (1, self.stride, self.stride),
                       [(0, 0), (d, d), (d, d)], (1, d, d),
                       "b")(y, calibrate=calibrate)
        y = nn.relu(_bn(train, self.dtype, "b_bn")(y))
        y = self._conv(self.dim_out, (1, 1, 1), (1, 1, 1),
                       [(0, 0), (0, 0), (0, 0)], None,
                       "c")(y, calibrate=calibrate)
        # final BN zero-init gamma is the reference ZERO_INIT_FINAL_BN
        return _bn(train, self.dtype, "c_bn")(y)


class ResBlock(nn.Module):
    dim_out: int
    dim_inner: int
    temp_kernel: int
    stride: int
    dilation: int = 1
    quant: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, calibrate: bool = False):
        shortcut = x
        if x.shape[-1] != self.dim_out or self.stride > 1:
            if self.quant:
                from egot2x.nn.quant import QuantConv3D

                shortcut = QuantConv3D(
                    self.dim_out, (1, 1, 1),
                    strides=(1, self.stride, self.stride),
                    padding=[(0, 0)] * 3, dtype=self.dtype,
                    name="branch1")(x, calibrate=calibrate)
            else:
                shortcut = nn.Conv(self.dim_out, (1, 1, 1),
                                   strides=(1, self.stride, self.stride),
                                   use_bias=False, dtype=self.dtype,
                                   name="branch1")(x)
            shortcut = _bn(train, self.dtype, "branch1_bn")(shortcut)
        y = BottleneckTransform(self.dim_out, self.dim_inner, self.temp_kernel,
                                self.stride, self.dilation, quant=self.quant,
                                dtype=self.dtype,
                                name="branch2")(x, train=train,
                                                calibrate=calibrate)
        return nn.relu(shortcut + y)


class ResStage(nn.Module):
    dim_out: int
    dim_inner: int
    num_blocks: int
    temp_kernel_sizes: Sequence[int]
    num_block_temp_kernel: int
    stride: int
    dilation: int = 1
    # nonlocal wiring (reference resnet_helper.py:511-548): a Nonlocal
    # block after each block index in nonlocal_inds; group>1 folds T
    # into batch before it
    nonlocal_inds: Sequence[int] = ()
    nonlocal_group: int = 1
    nonlocal_pool: Any = None
    nonlocal_instantiation: str = "dot_product"
    quant: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, calibrate: bool = False):
        # temporal kernel pattern: cycle temp_kernel_sizes over the first
        # num_block_temp_kernel blocks, 1 elsewhere (resnet_helper semantics)
        pattern = (list(self.temp_kernel_sizes)
                   * ((self.num_blocks // len(self.temp_kernel_sizes)) + 1))
        for i in range(self.num_blocks):
            tk = pattern[i] if i < self.num_block_temp_kernel else 1
            x = ResBlock(self.dim_out, self.dim_inner, tk,
                         self.stride if i == 0 else 1, self.dilation,
                         quant=self.quant,
                         dtype=self.dtype, name=f"block{i}")(
                x, train=train, calibrate=calibrate)
            if i in self.nonlocal_inds:
                nln = Nonlocal(self.dim_out // 2, self.nonlocal_pool,
                               self.nonlocal_instantiation, dtype=self.dtype,
                               name=f"nonlocal{i}")
                grp = self.nonlocal_group
                if grp > 1:
                    b, t = x.shape[0], x.shape[1]
                    x = x.reshape(b * grp, t // grp, *x.shape[2:])
                    x = nln(x, train=train)
                    x = x.reshape(b, t, *x.shape[2:])
                else:
                    x = nln(x, train=train)
        return x


class _VideoStemConv(nn.Module):
    """Conv(t,7,7)/(1,2,2) with the same param layout as ``nn.Conv``
    (param ``kernel`` under this module's scope, no bias) plus the
    norm-folding path: for raw integer pixels, the affine
    ``x_norm = x·a + b`` rides the conv (exact, conv is linear):
    ``conv(x·a + b·1_img, K) = conv(x, K·a) + b·conv(1_img, K)`` — the
    second term is a batch-1 constant map carrying the zero-padding
    border correction. Mirrors nn/resnet2d.py ``_StemConv``; the frames
    then ride HBM and the host link as uint8 (1/4 the f32 bytes) with
    no normalized intermediate."""

    width: int
    temp_kernel: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, fold=None):
        t = self.temp_kernel
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (t, 7, 7, x.shape[-1], self.width), jnp.float32)
        run = lambda v, k: jax.lax.conv_general_dilated(
            v.astype(self.dtype), k.astype(self.dtype),
            window_strides=(1, 2, 2),
            padding=[(t // 2, t // 2), (3, 3), (3, 3)],
            dimension_numbers=("NTHWC", "THWIO", "NTHWC"))
        if fold is None:
            return run(x, kernel)
        a, b = fold
        ones = jnp.ones((1,) + x.shape[1:], jnp.float32)
        return run(x, kernel * a) + b * run(ones, kernel)


class VideoStem(nn.Module):
    """Conv(t,7,7)/(1,2,2) + BN + relu + maxpool(1,3,3)/(1,2,2).

    ``input_norm``: the ``(x/255 − mean)/std`` convention this stem
    folds into its conv when handed RAW integer frames (the uint8
    device feed). Default is the Ego4D/PySlowFast scalar statistics
    (DATA.MEAN 0.45 / DATA.STD 0.225 — egot2x/data/lta.py
    normalize_clip); ``None`` means integer input is only cast — the
    raw-[0,255] convention of the PNR family (the reference PNR
    pipeline feeds unnormalized pixels). Float input is always
    consumed as-is (already host-normalized)."""

    width: int
    temp_kernel: int
    input_norm: Any = (0.45, 0.225)  # (mean, std) or None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from egot2x.nn.resnet2d import stem_norm_mode

        fold = None
        if jnp.issubdtype(x.dtype, jnp.integer) and self.input_norm is not None:
            mean, std = self.input_norm
            if stem_norm_mode() == "affine":
                x = ((x.astype(jnp.float32) / 255.0 - mean)
                     / std).astype(self.dtype)
            else:
                fold = (1.0 / (255.0 * std), -mean / std)
        y = _VideoStemConv(self.width, self.temp_kernel, dtype=self.dtype,
                           name="conv")(x, fold=fold)
        y = nn.relu(_bn(train, self.dtype, "bn")(y))
        b, tt = y.shape[0], y.shape[1]
        y = y.reshape(b * tt, *y.shape[2:])
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        return y.reshape(b, tt, *y.shape[1:])


class ResNet3D(nn.Module):
    """Single-pathway trunk: (B, T, H, W, C) → (B, T', H', W', 2048).

    ``remat=True`` rematerializes each residual stage in the backward
    pass (jax.checkpoint), trading ~30% extra forward FLOPs for the
    activation memory of the 3D conv stack — the lever for larger
    Stage-I training batches in HBM."""

    arch: str = "slow_layer5"
    depth: int = 50
    num_groups: int = 1
    width_per_group: int = 64
    spatial_strides: Tuple[int, int, int, int] = (1, 2, 2, 2)
    num_block_temp_kernel: Tuple[int, int, int, int] = (3, 4, 6, 3)
    remat: bool = False
    # uint8-feed convention folded into the stem (see VideoStem); the
    # PNR family overrides with None (raw [0,255] pixels)
    input_norm: Any = (0.45, 0.225)
    # per-stage nonlocal config from resolve_nonlocal():
    # ((inds,)*4, (group,)*4, (pool,)*4, instantiation) or None
    nonlocal_cfg: Any = None
    # int8 static-PTQ stage convs (QuantConv3D); the stem stays float
    # (C_in=3 starves the int8 MXU — same finding as the 2-D trunks)
    quant: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, calibrate: bool = False):
        d2, d3, d4, d5 = MODEL_STAGE_DEPTH[self.depth]
        w = self.width_per_group
        dim_inner = self.num_groups * w
        tk = TEMPORAL_KERNEL_BASIS[self.arch]
        stage_cls = nn.remat(ResStage, static_argnums=(2, 3)) if self.remat             else ResStage
        nl = self.nonlocal_cfg or (((),) * 4, (1,) * 4,
                                   (None,) * 4, "dot_product")
        nl_kw = lambda i: dict(nonlocal_inds=nl[0][i], nonlocal_group=nl[1][i],
                               nonlocal_pool=nl[2][i],
                               nonlocal_instantiation=nl[3],
                               quant=self.quant)
        y = VideoStem(w, tk[0][0], input_norm=self.input_norm,
                      dtype=self.dtype, name="s1")(x, train=train)
        y = stage_cls(w * 4, dim_inner, d2, tk[1], self.num_block_temp_kernel[0],
                      self.spatial_strides[0], dtype=self.dtype, name="s2",
                      **nl_kw(0))(y, train, calibrate)
        pt = POOL1[self.arch][0]
        if pt > 1:  # temporal pool after res2 (c2d/i3d)
            b = y.shape[0]
            y = nn.max_pool(y, (pt, 1, 1), strides=(pt, 1, 1))
        y = stage_cls(w * 8, dim_inner * 2, d3, tk[2], self.num_block_temp_kernel[1],
                      self.spatial_strides[1], dtype=self.dtype, name="s3",
                      **nl_kw(1))(y, train, calibrate)
        y = stage_cls(w * 16, dim_inner * 4, d4, tk[3], self.num_block_temp_kernel[2],
                      self.spatial_strides[2], dtype=self.dtype, name="s4",
                      **nl_kw(2))(y, train, calibrate)
        y = stage_cls(w * 32, dim_inner * 8, d5, tk[4], self.num_block_temp_kernel[3],
                      self.spatial_strides[3], dtype=self.dtype, name="s5",
                      **nl_kw(3))(y, train, calibrate)
        return y


class KeyframeLocalizationHead(nn.Module):
    """Per-frame head (head_helper.py:293-381).

    AvgPool(1, k, k) stride 1 → flatten (C·H'·W') per frame → dropout →
    Linear → act at eval. Returns (B, T, num_classes); ``middle=True``
    returns the flattened per-frame tokens (B, T, C·H'·W') — the 8192-d
    translator tokens in the reference config.
    """

    num_classes: int
    spatial_pool: int  # CROP_SIZE // 32 // pool1_spatial
    temporal_pool: int = 1
    dropout_rate: float = 0.0
    act: str = "none"  # none | softmax (applied at eval only)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, middle: bool = False):
        b, t, h, w, c = x.shape
        k, tp = self.spatial_pool, self.temporal_pool
        # AvgPool3d((tp, k, k), stride=1)
        x = jax.lax.reduce_window(
            x, 0.0, jax.lax.add,
            window_dimensions=(1, tp, k, k, 1),
            window_strides=(1, 1, 1, 1, 1),
            padding="VALID",
        ) / float(tp * k * k)
        bt, tt, hh, ww, cc = x.shape
        # torch flatten is channel-major (C, H, W) per frame
        x = jnp.transpose(x, (0, 1, 4, 2, 3)).reshape(b, tt, cc * hh * ww)
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        if middle:
            return x
        x = nn.Dense(self.num_classes, dtype=self.dtype, name="projection")(x)
        if not train and self.act == "softmax":
            x = jax.nn.softmax(x, axis=1 if self.num_classes == 1 else -1)
        return x


class ResNetBasicHead(nn.Module):
    """Global-pool classification head (PySlowFast basic head)."""

    num_classes: int
    dropout_rate: float = 0.5
    act: str = "softmax"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = jnp.mean(x, axis=(1, 2, 3))  # global T, H, W pool → (B, C)
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        x = nn.Dense(self.num_classes, dtype=self.dtype, name="projection")(x)
        if not train and self.act == "softmax":
            x = jax.nn.softmax(x, axis=-1)
        return x
