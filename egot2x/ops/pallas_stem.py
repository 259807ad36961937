"""Fused stem kernel: packed conv + BN + ReLU + 3x3/2 maxpool in one pass.

Motivation (tools/exp_stem_pack*.py on v5e, batch 64):
  * resnet18 conv1 (7x7/2, C_in=3) + pool: 22.1 ms/trunk, ~27 TF/s — the
    C_in=3 conv starves the MXU sublanes AND the 112x112x64 pre-pool
    map round-trips HBM (~3.1 GB write + 3.1 GB read per trunk);
  * TalkNet 3D stem (5x7x7, C_in=1) + pool: 18.9 ms at 8.3 TF/s.

This kernel removes both bottlenecks:
  * the input is space-to-depth packed (h2xw4 => C_in 8x, the two
    output-w phases pack C_out 64->128), so the conv is a dense
    (M, K=kh*kw*C) x (K, 128) MXU matmul with full lane/sublane use
    (K zero-pads to a 128 multiple; TalkNet's 5 temporal taps pack as
    5x more input channels);
  * BN (folded scale/bias), ReLU and the 3x3/2 maxpool run in VMEM on
    the conv tile, so only the pooled (H/2, W/2, 64) map is ever
    written to HBM.

The packing math is verified bit-exactly against
``lax.conv_general_dilated`` in tools/exp_stem_pack2.py and
tests/test_pallas_stem.py. No reference counterpart (the reference is
plain torch conv2d/conv3d); this is TPU-native performance work.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


# ---------------------------------------------------------------------------
# host-side packing (pure layout transforms; parameters stay unpacked)
# ---------------------------------------------------------------------------

def pack_stem_kernel(k: np.ndarray) -> np.ndarray:
    """(7, 7, C, F) px kernel -> (4, 3, 8C, 2F) h2w4-packed kernel.

    Index law: packed tap (d, g) channel (e*4+f)*C+ci, lane p*F+co holds
    k[2d-1+e, 4g+f-1-2p, ci, co] where (e, f) are the intra-cell pixel
    phases and p the packed output-w phase (zero outside the 7x7)."""
    kh, kw, c, f_out = k.shape
    assert (kh, kw) == (7, 7)
    kp = np.zeros((4, 3, 8 * c, 2 * f_out), np.asarray(k).dtype)
    for d in range(4):
        for e in range(2):
            h = 2 * d - 1 + e
            if not 0 <= h < 7:
                continue
            for g in range(3):
                for f in range(4):
                    for p in range(2):
                        w = 4 * g + f - 1 - 2 * p
                        if 0 <= w < 7:
                            ci = (e * 4 + f) * c
                            kp[d, g, ci:ci + c,
                               p * f_out:(p + 1) * f_out] = k[h, w]
    return kp


def pack_stem_kernel_3d(k3d: np.ndarray) -> np.ndarray:
    """(5, 7, 7, 1, F) -> (4, 3, 40, 2F): temporal tap dt occupies packed
    channels [dt*8, dt*8+8) (matches the t-shift concat in
    :func:`s2d_input_3d`)."""
    kt = k3d.shape[0]
    assert kt == 5 and k3d.shape[3] == 1
    taps = [pack_stem_kernel(k3d[dt]) for dt in range(kt)]
    return np.concatenate(taps, axis=2)


def flatten_packed_kernel(kp, k_pad: int) -> jnp.ndarray:
    """(4, 3, C, F) -> (k_pad, F) with K = 4*3*C zero-padded to k_pad
    (a 128 multiple keeps the MXU contraction dense)."""
    kh, kw, c, f_out = kp.shape
    flat = jnp.asarray(kp).reshape(kh * kw * c, f_out)
    return jnp.pad(flat, ((0, k_pad - flat.shape[0]), (0, 0)))


def s2d_input(x: jax.Array) -> jax.Array:
    """(N, H, W, C) px -> (N, H/2+4, W/4+2, 8C) packed, px-padded by 4
    (covers the stems' px pad of 3; the extra zeros never reach a valid
    window)."""
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)))
    hp, wp = h + 8, w + 8
    xs = xp.reshape(n, hp // 2, 2, wp // 4, 4, c)
    xs = jnp.transpose(xs, (0, 1, 3, 2, 4, 5))
    return xs.reshape(n, hp // 2, wp // 4, 8 * c)


def s2d_input_3d(x: jax.Array) -> jax.Array:
    """(B, T, H, W) single-channel clip -> (B*T, H/2+4, W/4+2, 40): h2w4
    packing plus the 5 temporal taps stacked on channels (tap dt at
    channels [dt*8, dt*8+8), matching :func:`pack_stem_kernel_3d`)."""
    b, t, h, w = x.shape
    xs = s2d_input(x.reshape(b * t, h, w, 1))
    xs = xs.reshape(b, t, *xs.shape[1:])
    xt = jnp.pad(xs, ((0, 0), (2, 2), (0, 0), (0, 0), (0, 0)))
    xc = jnp.concatenate([xt[:, dt:dt + t] for dt in range(5)], axis=-1)
    return xc.reshape(b * t, *xc.shape[2:])


def _pack_index_2d() -> Tuple[np.ndarray, np.ndarray]:
    """Gather index/mask for trace-time packing: idx[d, g, e, f, p] into
    the 49 flattened 7x7 taps; mask zeroes out-of-kernel offsets."""
    idx = np.zeros((4, 3, 2, 4, 2), np.int32)
    mask = np.zeros((4, 3, 2, 4, 2), np.float32)
    for d in range(4):
        for e in range(2):
            h = 2 * d - 1 + e
            for g in range(3):
                for f in range(4):
                    for p in range(2):
                        w = 4 * g + f - 1 - 2 * p
                        if 0 <= h < 7 and 0 <= w < 7:
                            idx[d, g, e, f, p] = h * 7 + w
                            mask[d, g, e, f, p] = 1.0
    return idx, mask


_IDX2D, _MASK2D = _pack_index_2d()


def pack_stem_kernel_traceable(k: jax.Array, k_pad: int,
                               dtype) -> jax.Array:
    """jnp twin of pack_stem_kernel+flatten for in-graph use: (7,7,C,F)
    param -> (k_pad, 2F). XLA folds the gather at compile time."""
    c, f_out = k.shape[2], k.shape[3]
    kf = k.reshape(49, c, f_out)
    g = kf[jnp.asarray(_IDX2D)] * jnp.asarray(_MASK2D)[..., None, None]
    # (d, g, e, f, p, C, F) -> K order (d, g, e, f, C), lanes (p, F)
    g = jnp.transpose(g, (0, 1, 2, 3, 5, 4, 6)).reshape(12 * 8 * c,
                                                        2 * f_out)
    return jnp.pad(g, ((0, k_pad - g.shape[0]), (0, 0))).astype(dtype)


def pack_stem_kernel_3d_traceable(k3d: jax.Array, k_pad: int,
                                  dtype) -> jax.Array:
    """(5,7,7,1,F) -> (k_pad, 2F); K order (d, g, dt, e, f) matching
    :func:`s2d_input_3d`'s channel layout (tap dt at channels dt*8..)."""
    f_out = k3d.shape[-1]
    kf = k3d.reshape(5, 49, f_out)
    g = kf[:, jnp.asarray(_IDX2D)] * jnp.asarray(_MASK2D)[..., None]
    # (dt, d, g, e, f, p, F) -> (d, g, dt, e, f, p, F)
    g = jnp.transpose(g, (1, 2, 0, 3, 4, 5, 6)).reshape(12 * 40, 2 * f_out)
    return jnp.pad(g, ((0, k_pad - g.shape[0]), (0, 0))).astype(dtype)


def stem_tile_h(conv_h: int) -> int:
    for t in (16, 8, 4, 2, 1):
        if conv_h % t == 0:
            return t
    return 1


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _stem_kernel(x_ref, w_ref, sb_ref, out_ref, conv_scr, patch_scr, *,
                 conv_h: int, conv_w: int, c_in: int, tile_h: int,
                 k_pad: int, out_dtype):
    """One image per grid step.

    x_ref    (1, conv_h+4, conv_w+2, c_in)  packed input
    w_ref    (k_pad, 128)                   packed+flattened kernel
    sb_ref   (2, 128)                       folded BN scale / bias (f32)
    out_ref  (1, conv_h//2, conv_w, 64)     pooled output
    conv_scr (conv_h, conv_w, 128)          post-BN/ReLU conv map (VMEM)
    patch_scr(tile_h, conv_w, k_pad)        im2col tile (VMEM)
    """
    n_tiles = conv_h // tile_h
    k_real = 12 * c_in

    @pl.when(pl.program_id(0) == 0)
    def _zero_pad_cols():
        # K zero-padding: written once, never touched again
        patch_scr[:, :, k_real:] = jnp.zeros(
            (tile_h, conv_w, k_pad - k_real), patch_scr.dtype)

    scale = sb_ref[0, :]
    bias = sb_ref[1, :]

    def tile_body(t, _):
        i0 = t * tile_h
        # im2col: 12 shifted copies (dh in 0..3, dw in 0..2)
        for dh in range(4):
            for dw in range(3):
                base = (dh * 3 + dw) * c_in
                patch_scr[:, :, base:base + c_in] = x_ref[
                    0, pl.ds(i0 + dh, tile_h), pl.ds(dw, conv_w), :]
        a = patch_scr[:, :, :].reshape(tile_h * conv_w, k_pad)
        acc = jnp.dot(a, w_ref[:, :], preferred_element_type=jnp.float32)
        y = jnp.maximum(acc * scale[None, :] + bias[None, :], 0.0)
        conv_scr[pl.ds(i0, tile_h), :, :] = y.reshape(
            tile_h, conv_w, 128).astype(conv_scr.dtype)
        return 0

    jax.lax.fori_loop(0, n_tiles, tile_body, 0)

    # maxpool 3x3/2 pad 1 over the px map, consuming the packed phases.
    c = conv_scr[:, :, :]
    # h: out j = max(rows 2j-1, 2j, 2j+1); pad row -1 / conv_h..+1
    cp = jnp.concatenate([
        jnp.full((1, conv_w, 128), NEG, c.dtype), c,
        jnp.full((1, conv_w, 128), NEG, c.dtype)], axis=0)  # conv_h+2
    cpe = cp.reshape((conv_h + 2) // 2, 2, conv_w, 128)
    e = cpe[:, 0]                       # rows 2j-1  (j in [0, h/2+1))
    o = cpe[:, 1]                       # rows 2j
    hp = jnp.maximum(jnp.maximum(e[:-1], o[:-1]), e[1:])  # (conv_h//2, ...)
    # w: phases; out px col m = max(A[m], B[m], B[m-1])
    a_ph = hp[:, :, :64]
    b_ph = hp[:, :, 64:]
    # out px col m = max(A[m], B[m], B[m-1]); the B[m-1] shift is done
    # with offset slice STORES (Mosaic rejects both concatenate and
    # dynamic_rotate on offset-carrying sublane layouts here)
    m0 = jnp.maximum(a_ph, b_ph).astype(out_dtype)
    out_ref[0] = m0
    out_ref[0, :, 1:, :] = jnp.maximum(
        m0[:, 1:, :], b_ph[:, :-1, :].astype(out_dtype))


@functools.partial(jax.jit, static_argnames=("conv_h", "conv_w", "tile_h",
                                             "interpret"))
def fused_stem_pool(x_packed: jax.Array, w_flat: jax.Array,
                    scale_bias: jax.Array, *, conv_h: int, conv_w: int,
                    tile_h: int = 8, interpret: bool = False) -> jax.Array:
    """Packed stem conv + BN + ReLU + 3x3/2 maxpool.

    x_packed (N, conv_h+4, conv_w+2, C): from :func:`s2d_input` (2D stem,
    conv_h=H/2, conv_w=W/4) or :func:`s2d_input_3d` (3D stem).
    w_flat (k_pad, 128): from :func:`flatten_packed_kernel`.
    scale_bias (2, 128): folded eval-BN scale/bias tiled over the two
    w-phases. Returns (N, conv_h//2, conv_w, 64).
    """
    n, hp, wp, c_in = x_packed.shape
    assert hp == conv_h + 4 and wp == conv_w + 2, (x_packed.shape, conv_h)
    assert conv_h % tile_h == 0
    k_pad = w_flat.shape[0]
    out_dtype = x_packed.dtype
    kern = functools.partial(
        _stem_kernel, conv_h=conv_h, conv_w=conv_w, c_in=c_in,
        tile_h=tile_h, k_pad=k_pad, out_dtype=out_dtype)
    return pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hp, wp, c_in), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, conv_h // 2, conv_w, 64),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, conv_h // 2, conv_w, 64),
                                       out_dtype),
        scratch_shapes=[
            pltpu.VMEM((conv_h, conv_w, 128), out_dtype),
            pltpu.VMEM((tile_h, conv_w, k_pad), out_dtype),
        ],
        interpret=interpret,
    )(x_packed, w_flat, scale_bias)


# ---------------------------------------------------------------------------
# int8-emitting variant (round 4): the stem's cost is the bf16/int8
# conv-map HBM round trip between conv and pool; this kernel quantizes
# in the conv epilogue (relu folds into the [0, 127] clip) and pools
# int8 in VMEM, so the only HBM write is the pooled int8 map. Supports
# multiple 64-wide trunks in one pass (n_trunks 128-lane phase groups
# stacked on the lane axis) so two trunks reading the same frames pay
# ONE input read.
# ---------------------------------------------------------------------------

def _stem_kernel_q(x_ref, w_ref, sb_ref, out_ref, conv_scr, patch_scr, *,
                   conv_h: int, conv_w: int, c_in: int, tile_h: int,
                   k_pad: int, n_trunks: int):
    """One image per grid step; int8 output.

    x_ref    (1, conv_h+4, conv_w+2, c_in)      packed input
    w_ref    (k_pad, 128*n_trunks)              packed kernels (lane-stacked)
    sb_ref   (2, 128*n_trunks)                  scale/127·s and bias/s (f32,
                                                the quant divide pre-folded)
    out_ref  (1, conv_h//2, conv_w, 64*n_trunks) pooled int8
    conv_scr (conv_h, conv_w, 128*n_trunks)     int8 conv map (VMEM only)
    patch_scr(tile_h, conv_w, k_pad)            im2col tile (VMEM)
    """
    n_tiles = conv_h // tile_h
    k_real = 12 * c_in

    @pl.when(pl.program_id(0) == 0)
    def _zero_pad_cols():
        patch_scr[:, :, k_real:] = jnp.zeros(
            (tile_h, conv_w, k_pad - k_real), patch_scr.dtype)

    scale = sb_ref[0, :]
    bias = sb_ref[1, :]

    def tile_body(t, _):
        i0 = t * tile_h
        for dh in range(4):
            for dw in range(3):
                base = (dh * 3 + dw) * c_in
                patch_scr[:, :, base:base + c_in] = x_ref[
                    0, pl.ds(i0 + dh, tile_h), pl.ds(dw, conv_w), :]
        a = patch_scr[:, :, :].reshape(tile_h * conv_w, k_pad)
        acc = jnp.dot(a, w_ref[:, :], preferred_element_type=jnp.float32)
        y = acc * scale[None, :] + bias[None, :]
        # relu + symmetric int8 quantize: clip(round(max(y, 0)), 0, 127).
        # The quantized values stay in BF16 (0..127 ints are exact in
        # bf16, and Mosaic cannot legalize int8 vector max — the pool
        # below needs max); int8 conversion happens at the output store.
        q = jnp.clip(jnp.round(y), 0.0, 127.0)
        conv_scr[pl.ds(i0, tile_h), :, :] = q.reshape(
            tile_h, conv_w, 128 * n_trunks).astype(conv_scr.dtype)
        return 0

    jax.lax.fori_loop(0, n_tiles, tile_body, 0)

    # maxpool 3x3/2 pad 1. Post-relu values are >= 0, so a 0 pad is
    # exact (max(v, 0) == v) — no -128 sentinel rows needed.
    c = conv_scr[:, :, :]
    zrow = jnp.zeros((1, conv_w, 128 * n_trunks), conv_scr.dtype)
    cp = jnp.concatenate([zrow, c, zrow], axis=0)       # conv_h+2 rows
    cpe = cp.reshape((conv_h + 2) // 2, 2, conv_w, 128 * n_trunks)
    e = cpe[:, 0]                                        # rows 2j-1
    o = cpe[:, 1]                                        # rows 2j
    hp = jnp.maximum(jnp.maximum(e[:-1], o[:-1]), e[1:])  # (conv_h//2,..)
    # w phases per trunk group: out px col m = max(B[m-1], A[m], B[m])
    for g in range(n_trunks):
        a_ph = hp[:, :, g * 128:g * 128 + 64]
        b_ph = hp[:, :, g * 128 + 64:g * 128 + 128]
        m0 = jnp.maximum(a_ph, b_ph)
        out_ref[0, :, :, g * 64:(g + 1) * 64] = m0.astype(jnp.int8)
        out_ref[0, :, 1:, g * 64:(g + 1) * 64] = jnp.maximum(
            m0[:, 1:, :], b_ph[:, :-1, :]).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("conv_h", "conv_w", "tile_h",
                                             "interpret"))
def fused_stem_pool_q(x_packed: jax.Array, w_flat: jax.Array,
                      scale_bias: jax.Array, *, conv_h: int, conv_w: int,
                      tile_h: int = 16, interpret: bool = False) -> jax.Array:
    """Packed stem conv + BN + relu + int8 quantize + 3x3/2 maxpool.

    Like :func:`fused_stem_pool` but emits the POOLED INT8 map directly
    (the deployment int8-before-pool recipe, nn/resnet2d.py): the
    quantizer's 1/s divide must be pre-folded into ``scale_bias``
    (scale' = bn_scale/s, bias' = bn_bias/s with s = act_max/127).
    ``w_flat`` may lane-stack several trunks' packed kernels
    ((k_pad, 128*n)); returns (N, conv_h//2, conv_w, 64*n) int8 with
    each trunk's pooled map at lanes [g*64, (g+1)*64).
    """
    n, hp, wp, c_in = x_packed.shape
    assert hp == conv_h + 4 and wp == conv_w + 2, (x_packed.shape, conv_h)
    assert conv_h % tile_h == 0
    k_pad, lanes = w_flat.shape
    assert lanes % 128 == 0
    n_trunks = lanes // 128
    kern = functools.partial(
        _stem_kernel_q, conv_h=conv_h, conv_w=conv_w, c_in=c_in,
        tile_h=tile_h, k_pad=k_pad, n_trunks=n_trunks)
    return pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hp, wp, c_in), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, lanes), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, lanes), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, conv_h // 2, conv_w, 64 * n_trunks),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, conv_h // 2, conv_w,
                                        64 * n_trunks), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((conv_h, conv_w, 128 * n_trunks), jnp.bfloat16),
            pltpu.VMEM((tile_h, conv_w, k_pad), x_packed.dtype),
        ],
        interpret=interpret,
    )(x_packed, w_flat, scale_bias)


def fold_bn_quant(gamma, beta, mean, var, eps: float,
                  act_max) -> jnp.ndarray:
    """Eval BN + the int8 quantizer's 1/s divide as one per-lane affine
    for :func:`fused_stem_pool_q`: scale' = γ/√(σ²+ε)/s, bias' =
    (β − μ·γ/√(σ²+ε))/s, s = max(act_max, 1e-6)/127, tiled over the 2
    w-phases -> (2, 128) f32."""
    s = jnp.maximum(act_max, 1e-6) / 127.0
    scale = gamma / jnp.sqrt(var + eps) / s
    bias = (beta - mean * gamma / jnp.sqrt(var + eps)) / s
    return jnp.stack([jnp.tile(scale, 2), jnp.tile(bias, 2)]).astype(
        jnp.float32)


# ---------------------------------------------------------------------------
# convenience wrappers for the two stems
# ---------------------------------------------------------------------------

def fold_bn(gamma, beta, mean, var, eps: float) -> jnp.ndarray:
    """Eval-mode BN as y = x*scale + bias, tiled over the 2 w-phases ->
    (2, 128) f32."""
    scale = gamma / jnp.sqrt(var + eps)
    bias = beta - mean * scale
    return jnp.stack([jnp.tile(scale, 2), jnp.tile(bias, 2)]).astype(
        jnp.float32)


def resnet_stem_pool(x: jax.Array, kernel: jax.Array, scale_bias: jax.Array,
                     dtype=jnp.bfloat16, interpret: bool = False) -> jax.Array:
    """(N, H, W, 3) px frames -> conv1(7x7/2) + BN + relu + maxpool(3x3/2)
    -> (N, H/4, W/4, 64). kernel: the unpacked (7, 7, 3, 64) param."""
    n, h, w, _ = x.shape
    kp = pack_stem_kernel(np.asarray(jax.device_get(kernel))
                          if not isinstance(kernel, np.ndarray) else kernel)
    k_pad = ((kp.shape[0] * kp.shape[1] * kp.shape[2] + 127) // 128) * 128
    w_flat = flatten_packed_kernel(kp, k_pad).astype(dtype)
    xp = s2d_input(x.astype(dtype))
    out = fused_stem_pool(xp, w_flat, scale_bias,
                          conv_h=h // 2, conv_w=w // 4, interpret=interpret)
    # unpack w-phases: (N, H/4, W/4, 64) is already unpacked — the pool
    # consumed the phases; columns are px columns.
    return out
