"""Time the fused pallas stem kernel at the bench shapes (b64, T30)."""

import time

import numpy as np

B, T = 64, 30


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


def main():
    import jax
    import jax.numpy as jnp

    from egot2x.ops.pallas_stem import (flatten_packed_kernel, fused_stem_pool,
                                        pack_stem_kernel, pack_stem_kernel_3d,
                                        s2d_input, s2d_input_3d)

    dev = jax.devices()[0]
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    def put(x, dd=np.float32):
        return jax.device_put(jnp.asarray(x, dd), dev)

    # --- resnet18 conv1 geometry: 1920 frames of 224x224x3 ---
    video = put(rng.standard_normal((B * T, 224, 224, 3)))
    k1 = (rng.standard_normal((7, 7, 3, 64)) * 0.05).astype(np.float32)
    kp1 = flatten_packed_kernel(pack_stem_kernel(k1), 384).astype(dt)
    kp1 = jax.device_put(kp1, dev)
    sb = put(np.stack([np.ones(128), np.zeros(128)]).astype(np.float32))

    def conv1_fused(x):
        xp = s2d_input(x.astype(dt))
        return fused_stem_pool(xp, kp1, sb, conv_h=112, conv_w=56, tile_h=16)

    # TPU numeric check vs lax (bf16 tolerance)
    small = put(rng.standard_normal((4, 224, 224, 3)))
    ref = jax.lax.conv_general_dilated(
        small.astype(dt), jnp.asarray(k1, dt), (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ref = jnp.maximum(ref, 0.0)
    ref = jax.lax.reduce_window(ref, jnp.asarray(-1e30, dt), jax.lax.max,
                                (1, 3, 3, 1), (1, 2, 2, 1),
                                [(0, 0), (1, 1), (1, 1), (0, 0)])
    got = jax.jit(conv1_fused)(small)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) -
                                ref.astype(jnp.float32))))
    den = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
    print(f"conv1 fused TPU rel err: {err/den:.2e}", flush=True)

    print("| section | ms |", flush=True)
    bench("conv1+pool pallas fused (one trunk)", conv1_fused, (video,))

    # --- TalkNet stem geometry: (64, 30, 112, 112) ---
    faces = put(rng.standard_normal((B, T, 112, 112)))
    k3 = (rng.standard_normal((5, 7, 7, 1, 64)) * 0.05).astype(np.float32)
    kp3 = jax.device_put(
        flatten_packed_kernel(pack_stem_kernel_3d(k3), 512).astype(dt), dev)

    def stem3d_fused(x):
        xp = s2d_input_3d(x.astype(dt))
        out = fused_stem_pool(xp, kp3, sb, conv_h=56, conv_w=28, tile_h=8)
        return out.reshape(B, T, 28, 28, 64)

    bench("stem3d+pool pallas fused", stem3d_fused, (faces,))


if __name__ == "__main__":
    main()
