"""Fused pallas stem kernel vs lax conv+BN+relu+maxpool (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egot2x.ops.pallas_stem import (flatten_packed_kernel, fold_bn,
                                    fused_stem_pool, pack_stem_kernel,
                                    pack_stem_kernel_3d, s2d_input,
                                    s2d_input_3d)

NEG = -1e30


def ref_stem_pool_2d(x, k, scale, bias):
    y = jax.lax.conv_general_dilated(
        x, k, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = jnp.maximum(y * scale + bias, 0.0)
    return jax.lax.reduce_window(
        y, NEG, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])


def ref_stem_pool_3d(x, k3d, scale, bias):
    y = jax.lax.conv_general_dilated(
        x[..., None], k3d, (1, 2, 2), [(2, 2), (3, 3), (3, 3)],
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"))
    y = jnp.maximum(y * scale + bias, 0.0)
    return jax.lax.reduce_window(
        y, NEG, jax.lax.max, (1, 1, 3, 3, 1), (1, 1, 2, 2, 1),
        [(0, 0), (0, 0), (1, 1), (1, 1), (0, 0)])


@pytest.mark.parametrize("hw", [64, 96])
def test_fused_stem_pool_2d_matches_lax(hw):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, hw, hw, 3)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((7, 7, 3, 64)) * 0.1, jnp.float32)
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, 64), jnp.float32)
    beta = jnp.asarray(rng.standard_normal(64) * 0.1, jnp.float32)
    mean = jnp.asarray(rng.standard_normal(64) * 0.1, jnp.float32)
    var = jnp.asarray(rng.uniform(0.5, 2.0, 64), jnp.float32)
    sb = fold_bn(gamma, beta, mean, var, 1e-5)
    ref = ref_stem_pool_2d(x, k, sb[0, :64], sb[1, :64])

    kp = pack_stem_kernel(np.asarray(k))
    w_flat = flatten_packed_kernel(kp, 384)
    out = fused_stem_pool(s2d_input(x), w_flat, sb,
                          conv_h=hw // 2, conv_w=hw // 4,
                          tile_h=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_stem_pool_3d_matches_lax():
    rng = np.random.default_rng(1)
    b, t, hw = 2, 6, 64
    x = jnp.asarray(rng.standard_normal((b, t, hw, hw)), jnp.float32)
    k3d = jnp.asarray(rng.standard_normal((5, 7, 7, 1, 64)) * 0.1,
                      jnp.float32)
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, 64), jnp.float32)
    beta = jnp.asarray(rng.standard_normal(64) * 0.1, jnp.float32)
    mean = jnp.asarray(rng.standard_normal(64) * 0.1, jnp.float32)
    var = jnp.asarray(rng.uniform(0.5, 2.0, 64), jnp.float32)
    sb = fold_bn(gamma, beta, mean, var, 1e-3)
    ref = ref_stem_pool_3d(x, k3d, sb[0, :64], sb[1, :64])

    kp = pack_stem_kernel_3d(np.asarray(k3d))
    w_flat = flatten_packed_kernel(kp, 512)
    out = fused_stem_pool(s2d_input_3d(x), w_flat, sb,
                          conv_h=hw // 2, conv_w=hw // 4,
                          tile_h=8, interpret=True)
    out = out.reshape(b, t, hw // 4, hw // 4, 64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_stem_pool_q_matches_shipped_int8():
    """Round-4 int8-emitting variant (fused_stem_pool_q): bit-exact vs
    the shipped conv+BN+relu+quantize_static+max_pool_int8 path in f32,
    single and dual (lane-stacked) trunk. Kept as a measured dead end on
    v5e (docs/PROFILE.md round 4: the stem is conv-compute-bound, and
    the Mosaic im2col matmul cannot beat XLA's conv) — the kernel stays
    correct for hardware/toolchains where the trade-off differs."""
    from egot2x.nn.quant import max_pool_int8, quantize_static
    from egot2x.ops.pallas_stem import fold_bn_quant, fused_stem_pool_q

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((7, 7, 3, 64)) * 0.05, jnp.float32)
    k2 = jnp.asarray(rng.standard_normal((7, 7, 3, 64)) * 0.05, jnp.float32)
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, 64), jnp.float32)
    beta = jnp.asarray(rng.standard_normal(64) * 0.1, jnp.float32)
    mean = jnp.asarray(rng.standard_normal(64) * 0.1, jnp.float32)
    var = jnp.asarray(rng.uniform(0.5, 2.0, 64), jnp.float32)
    act_max = jnp.float32(6.0)

    def shipped(x, k):
        y = jax.lax.conv_general_dilated(
            x, k, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        sc = gamma / jnp.sqrt(var + 1e-5)
        y = jnp.maximum(y * sc + (beta - mean * sc), 0)
        yq, _ = quantize_static(y, act_max)
        return max_pool_int8(yq, (3, 3), (2, 2), [(1, 1), (1, 1)])

    sb = fold_bn_quant(gamma, beta, mean, var, 1e-5, act_max)
    kp1 = flatten_packed_kernel(pack_stem_kernel(np.asarray(k1)), 384)
    got = fused_stem_pool_q(s2d_input(x), kp1.astype(jnp.float32), sb,
                            conv_h=32, conv_w=16, tile_h=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(shipped(x, k1)))

    kp2 = flatten_packed_kernel(pack_stem_kernel(np.asarray(k2)), 384)
    got2 = fused_stem_pool_q(
        s2d_input(x), jnp.concatenate([kp1, kp2], 1).astype(jnp.float32),
        jnp.concatenate([sb, sb], 1), conv_h=32, conv_w=16, tile_h=8,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(got2[..., :64]),
                                  np.asarray(shipped(x, k1)))
    np.testing.assert_array_equal(np.asarray(got2[..., 64:]),
                                  np.asarray(shipped(x, k2)))
