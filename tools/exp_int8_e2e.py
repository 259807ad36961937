"""Experiment 2: realistic int8 layer chain vs bf16.

Each int8 step: int8 conv (int32 accum) -> dequant -> BN-affine + relu
-> dynamic per-tensor max -> requant to int8. This is the true cost of
a dynamic-quantized resnet stage including the requant reductions.
bf16 step: conv -> BN-affine + relu.
"""

import time

import numpy as np

K = 8


def timeit(fn, x, *rest, n=8):
    import jax

    jfn = jax.jit(fn)
    out = jfn(x, *rest)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = jfn(out if not isinstance(out, tuple) else out[0], *rest)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    dn = ("NHWC", "HWIO", "NHWC")

    for name, xs, ws in [
        ("stage1 @56x64", (960, 56, 56, 64), (3, 3, 64, 64)),
        ("stage2 @28x128", (960, 28, 28, 128), (3, 3, 128, 128)),
    ]:
        c = ws[-1]
        x = jax.device_put(jnp.asarray(rng.standard_normal(xs), jnp.bfloat16), dev)
        w = jax.device_put(jnp.asarray(rng.standard_normal(ws) * 0.05, jnp.bfloat16), dev)
        wq = jax.device_put(jnp.asarray(rng.integers(-127, 128, ws), jnp.int8), dev)
        scale = jax.device_put(jnp.asarray(rng.uniform(0.5, 1.5, (c,)), jnp.float32), dev)
        bias = jax.device_put(jnp.asarray(rng.uniform(-0.1, 0.1, (c,)), jnp.float32), dev)
        xq = jax.device_put(jnp.asarray(rng.integers(-127, 128, xs), jnp.int8), dev)

        def chain_bf16(a, w, scale, bias):
            for _ in range(K):
                y = lax.conv_general_dilated(a, w, (1, 1), "SAME",
                                             dimension_numbers=dn)
                a = jnp.maximum(y * scale.astype(jnp.bfloat16)
                                + bias.astype(jnp.bfloat16), 0)
                a = jnp.clip(a, 0, 4)
            return a

        def chain_int8(a, wq, scale, bias):
            for _ in range(K):
                y = lax.conv_general_dilated(a, wq, (1, 1), "SAME",
                                             dimension_numbers=dn,
                                             preferred_element_type=jnp.int32)
                yf = y.astype(jnp.float32) * (scale / 16384.0) + bias
                yf = jnp.maximum(yf, 0.0)
                m = jnp.max(yf) + 1e-6          # dynamic per-tensor scale
                a = jnp.round(yf * (127.0 / m)).astype(jnp.int8)
            return a

        t_bf = timeit(chain_bf16, x, w, scale, bias)
        t_i8 = timeit(chain_int8, xq, wq, scale, bias)
        fl = 2 * xs[0] * xs[1] * xs[2] * ws[3] * ws[0] * ws[1] * ws[2] * K
        print(f"{name}: bf16+bnrelu {t_bf*1e3/K:.3f} ms/conv "
              f"({fl/t_bf/1e12:.1f} TF/s) | int8+dynquant "
              f"{t_i8*1e3/K:.3f} ms/conv ({fl/t_i8/1e12:.1f} TOP/s) | "
              f"speedup {t_bf/t_i8:.2f}x", flush=True)


if __name__ == "__main__":
    main()
