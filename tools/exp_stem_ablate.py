"""Ablate the shipped stem's 31 ms/trunk (b128, f32 feed): where does
the time go — the conv itself, the bf16 conv-map materialization
before the quantize, or the int8 pool?

Usage: python tools/exp_stem_ablate.py   (real chip, idle)
Env:   B (default 128), T (default 30)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(name, fn, args, n=10):
    import jax

    jfn = jax.jit(fn)
    out = jfn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = jfn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[-1].ravel()[0])
    dt = (time.perf_counter() - t0) / n
    print(f"| {name} | {dt*1e3:8.2f} |", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from egot2x.nn.quant import max_pool_int8, quantize_static
    from egot2x.nn.resnet2d import _s2d_stem_conv

    b = int(os.environ.get("B", "128"))
    t = int(os.environ.get("T", "30"))
    n_img = b * t
    dev = jax.devices()[0]
    dt16 = jnp.bfloat16
    rng = np.random.default_rng(0)

    video = jax.device_put(
        jnp.asarray(rng.standard_normal((n_img, 224, 224, 3)), jnp.float32),
        dev)
    k1 = (rng.standard_normal((7, 7, 3, 64)) * 0.05).astype(np.float32)
    gamma = np.abs(rng.standard_normal(64)).astype(np.float32) + 0.5
    beta = rng.standard_normal(64).astype(np.float32) * 0.1
    mean = rng.standard_normal(64).astype(np.float32) * 0.1
    var = np.abs(rng.standard_normal(64)).astype(np.float32) + 0.5
    act_max = jnp.float32(6.0)
    sc = jnp.asarray(gamma / np.sqrt(var + 1e-5), dt16)
    bi = jnp.asarray(beta - mean * gamma / np.sqrt(var + 1e-5), dt16)

    def conv(x):
        return jax.lax.conv_general_dilated(
            x.astype(dt16), jnp.asarray(k1, dt16), (2, 2), [(3, 3)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def bnrelu(y):
        return jnp.maximum(y * sc + bi, 0)

    def quant(y):
        return quantize_static(y, act_max)[0]

    def pool8(yq):
        return max_pool_int8(yq, (3, 3), (2, 2), [(1, 1), (1, 1)])

    print(f"B*T = {n_img} frames of 224x224x3 (f32 feed)", flush=True)
    print("| stage | ms |\n|---|---|", flush=True)
    # the raw bf16 map cannot be RETURNED (XLA lane-pads 64->128: 11.5 GB
    # padded output copy OOMs); a full f32 sum forces the compute while
    # fusing into the conv epilogue -> measures conv COMPUTE + input read
    bench("conv compute (sum consumer, no map write)",
          lambda x: jnp.sum(conv(x), dtype=jnp.float32), (video,))
    bench("conv+bn+relu+quant (s8 out, returned)",
          lambda x: quant(bnrelu(conv(x))), (video,))
    bench("full: +int8 pool (shipped)",
          lambda x: pool8(quant(bnrelu(conv(x)))), (video,))
    bench("pool alone (s8 in, jit'd separately)",
          lambda yq: pool8(yq),
          (jax.jit(lambda x: quant(bnrelu(conv(x))))(video),))
    # s2d variant: conv expressed as a dense 4x4x12 conv
    bench("s2d conv+bn+relu+quant+pool",
          lambda x: pool8(quant(bnrelu(
              _s2d_stem_conv(x, jnp.asarray(k1), dt16)))), (video,))
    # bf16 pool then quantize (the pre-round-3 order, for reference)
    def pool_bf16(y):
        return jax.lax.reduce_window(
            y, jnp.asarray(-jnp.inf, y.dtype), jax.lax.max,
            (1, 3, 3, 1), (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])
    bench("bf16 pool then quant (r2 order)",
          lambda x: quant(pool_bf16(bnrelu(conv(x)))), (video,))


if __name__ == "__main__":
    main()
