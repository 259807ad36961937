"""Round-3: uint8-input stems — can conv1 consume raw pixels?

The deployment pipeline ships uint8 frames to the device
(tools/bench_e2e.py); the stem currently normalizes to float first.
Three formulations of conv1(7x7/2, C_in=3) + BN/relu + int8-pool at the
bench operating point:

  A  shipped: f32 normalized input -> bf16 conv1 -> BN/relu ->
     quantize -> int8 max-pool (nn/resnet2d.py stem);
  B  uint8 input, normalize in-jit to bf16, then as A — input HBM
     reads drop 4x;
  C  uint8 input consumed DIRECTLY by an int8 conv1: x-128 as int8,
     per-input-channel normalize scale folded into the (per-output-
     channel quantized) weights, and the normalize shift handled by a
     constant border-aware bias map b*conv(mask, W) (zero-padding is
     applied AFTER normalization in the float model, so the shift
     contributes through a mask, not uniformly). No quantize pass at
     all — pixels are already integers. Round-2's int8 conv1 lost
     (36.2 vs 33.1 ms) but that included quantizing a float input.

Run: python tools/exp_conv1_u8.py   (TPU, idle host)
"""

import numpy as np

from _exp_util import bench

B, T = 128, 30
FRAMES = B * T
IMG = 224

MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    dn = ("NHWC", "HWIO", "NHWC")
    rng = np.random.default_rng(0)
    k = (rng.standard_normal((7, 7, 3, 64)) * 0.05).astype(np.float32)
    gamma = rng.uniform(0.5, 1.5, 64).astype(np.float32)
    beta = rng.uniform(-0.1, 0.1, 64).astype(np.float32)
    s_out = np.float32(4.0 / 127.0)  # calibrated stem activation scale

    x_u8 = rng.integers(0, 256, (FRAMES, IMG, IMG, 3), dtype=np.uint8)
    x_f32 = ((x_u8.astype(np.float32) / 255.0 - MEAN) / STD)

    def conv_f(x, kk, dtype):
        return jax.lax.conv_general_dilated(
            x.astype(dtype), jnp.asarray(kk, dtype), (2, 2),
            [(3, 3), (3, 3)], dimension_numbers=dn)

    def bn_relu_q(y):
        y = jnp.maximum(y.astype(jnp.float32) * gamma + beta, 0.0)
        return jnp.clip(jnp.round(y / s_out), -127, 127).astype(jnp.int8)

    def pool_i8(q):
        return nn.max_pool(q, (3, 3), strides=(2, 2),
                           padding=[(1, 1), (1, 1)])

    # ---- A: shipped (f32 normalized input) ----
    def f_a(x):
        return pool_i8(bn_relu_q(conv_f(x, k, jnp.bfloat16)))

    # ---- B: uint8 input, normalize in-jit ----
    mean_j = jnp.asarray(MEAN)
    std_j = jnp.asarray(STD)

    def f_b(xu):
        x = (xu.astype(jnp.float32) / 255.0 - mean_j) / std_j
        return pool_i8(bn_relu_q(conv_f(x, k, jnp.bfloat16)))

    # ---- C: int8 conv1 on raw pixels ----
    # norm(x) = a*(x-128) + b  with a = 1/(255*std), b = (128/255-mean)/std
    a = (1.0 / (255.0 * STD)).astype(np.float32)
    bias = ((128.0 / 255.0 - MEAN) / STD).astype(np.float32)
    k_scaled = k * a[None, None, :, None]          # fold a per C_in
    w_s = np.maximum(np.abs(k_scaled).max(axis=(0, 1, 2)), 1e-12) / 127.0
    k_i8 = np.round(k_scaled / w_s).astype(np.int8)
    # border-aware shift: the float model zero-pads AFTER normalize, so
    # the shift b contributes only through interior taps
    mask = np.zeros((1, IMG, IMG, 3), np.float32)
    mask[:] = bias
    shift_map = jax.device_get(jax.lax.conv_general_dilated(
        jnp.asarray(mask), jnp.asarray(k), (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=dn))            # (1,112,112,64) constant

    def f_c(xu):
        xi = (xu.astype(jnp.int16) - 128).astype(jnp.int8)
        acc = jax.lax.conv_general_dilated(
            xi, jnp.asarray(k_i8), (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=dn, preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * w_s + jnp.asarray(shift_map)
        return pool_i8(bn_relu_q(y))

    dev = jax.devices()[0]
    xf = jax.device_put(jnp.asarray(x_f32), dev)
    xu = jax.device_put(jnp.asarray(x_u8), dev)

    print("| formulation | ms |\n|---|---|", flush=True)
    bench("A f32-norm input, bf16 conv1 (shipped)", f_a, (xf,))
    bench("B u8 input, in-jit norm, bf16 conv1", f_b, (xu,))
    bench("C u8 input, int8 conv1 folded-norm", f_c, (xu,))

    # numeric check: C vs B on the same pixels (pre-pool float compare)
    yb = np.asarray(jax.jit(lambda x: conv_f(
        (x.astype(jnp.float32) / 255.0 - mean_j) / std_j, k,
        jnp.float32))(xu[:8]))
    yc = np.asarray(jax.jit(lambda x: jax.lax.conv_general_dilated(
        (x.astype(jnp.int16) - 128).astype(jnp.int8), jnp.asarray(k_i8),
        (2, 2), [(3, 3), (3, 3)], dimension_numbers=dn,
        preferred_element_type=jnp.int32).astype(jnp.float32) * w_s
        + jnp.asarray(shift_map))(xu[:8]))
    cos = float((yb * yc).sum() /
                (np.linalg.norm(yb) * np.linalg.norm(yc) + 1e-9))
    print(f"C-vs-B cosine (weight-quant error only): {cos:.6f}")


if __name__ == "__main__":
    main()
