"""Experiment round 2: 2-D packed stems + pool-in-packed-layout.

Round-1 findings (tools/exp_stem_pack.py, b64):
  stem3d conv C_in=1:   21.27 ms ( 8.3 TF/s)
  stem3d packed-3D:     12.77 ms (27.8 TF/s on 2x MACs)
  resnet18 conv1 C_in=3:16.63 ms (26.8 TF/s) x2 trunks

Here: express both stems as a single dense 2-D conv —
space-to-depth(h2,w4) packs C_in to 8 (x3 RGB = 24; x5 temporal taps
= 40), output w-phases pack C_out to 128 — and let the following
3x3/2 maxpool CONSUME the packed phases (h via reduce_window, w via a
3-way shifted max), so no unpack transpose ever materializes.

Run: python tools/exp_stem_pack2.py   (TPU)
"""

import sys
import time

import numpy as np

B = 64
T = 30
NEG = -1e30


def bench(name, fn, args, n=10):
    import jax

    jfn = jax.jit(fn)
    out = jfn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = jfn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / n
    print(f"| {name} | {dt*1e3:8.2f} |", flush=True)
    return dt


# ---------------- packed kernels ----------------

def pack_kernel_2d(k, c_in):
    """(7,7,C,64) spatial kernel -> (4,3,8*C,128) for h2w4 packing."""
    kp = np.zeros((4, 3, 8 * c_in, 128), k.dtype)
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
                            ci = (e * 4 + f) * c_in
                            kp[d, g, ci:ci + c_in, p * 64:(p + 1) * 64] = \
                                k[h, w, :, :]
    return kp


def s2d_h2w4(x):
    """(N,H,W,C) -> (N,H/2,W/4,8C), px-padded by 4 on each side first."""
    import jax.numpy as jnp

    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)))
    hp, wp = h + 8, w + 8
    xs = xp.reshape(n, hp // 2, 2, wp // 4, 4, c)
    xs = jnp.transpose(xs, (0, 1, 3, 2, 4, 5))
    return xs.reshape(n, hp // 2, wp // 4, 8 * c)


def packed_conv(x, kp, out_h, out_w2, dtype):
    import jax
    import jax.numpy as jnp

    y = jax.lax.conv_general_dilated(
        x.astype(dtype), jnp.asarray(kp, dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y[:, :out_h, :out_w2]


def pool_packed(y):
    """(N, H, W/2, 128) packed conv output -> maxpool 3x3/2 pad 1 ->
    (N, H/2, W/2, 64) unpacked. h via reduce_window; w consumed from
    the 2 packed phases."""
    import jax
    import jax.numpy as jnp

    n, h, w2, _ = y.shape
    yh = jax.lax.reduce_window(
        y, jnp.asarray(NEG, y.dtype), jax.lax.max, (1, 3, 1, 1),
        (1, 2, 1, 1), [(0, 0), (1, 1), (0, 0), (0, 0)])
    a, b = yh[..., :64], yh[..., 64:]
    b_prev = jnp.pad(b, ((0, 0), (0, 0), (1, 0), (0, 0)),
                     constant_values=NEG)[:, :, :w2]
    return jnp.maximum(jnp.maximum(a, b), b_prev)


# ---------------- reference formulations ----------------

def ref_conv1_pool(x, k, dtype):
    """resnet18 stem: conv 7x7/2 pad3 + maxpool 3x3/2 pad1."""
    import jax
    import jax.numpy as jnp

    y = jax.lax.conv_general_dilated(
        x.astype(dtype), jnp.asarray(k, dtype), (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.lax.reduce_window(
        y, jnp.asarray(NEG, y.dtype), jax.lax.max, (1, 3, 3, 1),
        (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])


def conv1_packed_pool(x, kp, dtype):
    n = x.shape[0]
    y = packed_conv(s2d_h2w4(x), kp, 112, 56, dtype)
    return pool_packed(y)


def ref_stem3d_pool(x, k, dtype):
    """TalkNet stem: conv3d (5,7,7)/(1,2,2) pad (2,3,3) + pool (1,3,3)/(1,2,2)."""
    import jax
    import jax.numpy as jnp

    y = jax.lax.conv_general_dilated(
        x[..., None].astype(dtype), jnp.asarray(k, dtype), (1, 2, 2),
        [(2, 2), (3, 3), (3, 3)],
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"))
    return jax.lax.reduce_window(
        y, jnp.asarray(NEG, y.dtype), jax.lax.max, (1, 1, 3, 3, 1),
        (1, 1, 2, 2, 1), [(0, 0), (0, 0), (1, 1), (1, 1), (0, 0)])


def stem3d_packed2d_pool(x, kp2d, dtype):
    """x (B,T,112,112). t-taps -> channels (5x8=40), one 2-D conv,
    pool consumes w-phases."""
    import jax.numpy as jnp

    b, t, h, w = x.shape
    xs = s2d_h2w4(x.reshape(b * t, h, w, 1)).reshape(b, t, (h + 8) // 2,
                                                     (w + 8) // 4, 8)
    xt = jnp.pad(xs, ((0, 0), (2, 2), (0, 0), (0, 0), (0, 0)))
    shifted = [xt[:, dt:dt + t] for dt in range(5)]
    xc = jnp.concatenate(shifted, axis=-1)  # (B,T,60,30,40)
    xc = xc.reshape(b * t, xc.shape[2], xc.shape[3], 40)
    y = packed_conv(xc, kp2d, 56, 28, dtype)
    out = pool_packed(y)
    return out.reshape(b, t, 28, 28, 64)


def pack_stem3d_kernel_2d(k3d):
    """(5,7,7,1,64) -> (4,3,40,128); t-tap dt lives at channels dt*8.."""
    kp = np.zeros((4, 3, 40, 128), k3d.dtype)
    for dt in range(5):
        sp = pack_kernel_2d(k3d[dt], 1)  # (4,3,8,128)
        kp[:, :, dt * 8:(dt + 1) * 8] = sp
    return kp


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    def put(x):
        return jax.device_put(jnp.asarray(x, jnp.float32), dev)

    # ---- numeric checks (f32, small) ----
    k1 = (rng.standard_normal((7, 7, 3, 64)) * 0.05).astype(np.float32)
    kp1 = pack_kernel_2d(k1, 3)
    xs = put(rng.standard_normal((2, 224, 224, 3)))
    a = np.asarray(jax.jit(lambda x: ref_conv1_pool(x, k1, jnp.float32))(xs))
    b = np.asarray(jax.jit(
        lambda x: conv1_packed_pool(x, kp1, jnp.float32))(xs))
    err = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    print(f"conv1 packed+pool rel err: {err:.2e}", flush=True)
    assert err < 1e-4, err

    k3 = (rng.standard_normal((5, 7, 7, 1, 64)) * 0.05).astype(np.float32)
    kp3 = pack_stem3d_kernel_2d(k3)
    xt = put(rng.standard_normal((2, 6, 112, 112)))
    a = np.asarray(jax.jit(lambda x: ref_stem3d_pool(x, k3, jnp.float32))(xt))
    b = np.asarray(jax.jit(
        lambda x: stem3d_packed2d_pool(x, kp3, jnp.float32))(xt))
    err = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    print(f"stem3d packed2d+pool rel err: {err:.2e}", flush=True)
    assert err < 1e-4, err

    print("| section | ms |", flush=True)
    print("|---|---|")

    video = put(rng.standard_normal((B * T, 224, 224, 3)))
    faces = put(rng.standard_normal((B, T, 112, 112)))

    bench("conv1+pool ref bf16 (one trunk)",
          lambda x: ref_conv1_pool(x, k1, dt), (video,))
    bench("conv1+pool packed bf16",
          lambda x: conv1_packed_pool(x, kp1, dt), (video,))
    bench("stem3d+pool ref bf16",
          lambda x: ref_stem3d_pool(x, k3, dt), (faces,))
    bench("stem3d+pool packed2d bf16",
          lambda x: stem3d_packed2d_pool(x, kp3, dt), (faces,))

    # int8 variant of the packed conv1 (static scales)
    s_act = np.float32(3.0 / 127.0)
    w_max = np.abs(kp1).max(axis=(0, 1, 2))
    kq = np.clip(np.round(kp1 / np.maximum(w_max / 127.0, 1e-12)),
                 -127, 127).astype(np.int8)

    def conv1_packed_int8(x):
        xi = s2d_h2w4(x)
        xq = jnp.clip(jnp.round(xi.astype(jnp.float32) / s_act),
                      -127, 127).astype(jnp.int8)
        acc = jax.lax.conv_general_dilated(
            xq, jnp.asarray(kq), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y = acc[:, :112, :56].astype(jnp.float32) * \
            (s_act * (w_max / 127.0)).astype(jnp.float32)
        return pool_packed(y.astype(dt))

    bench("conv1+pool packed int8", conv1_packed_int8, (video,))


if __name__ == "__main__":
    main()
