"""Experiment: int8 vs bf16 conv throughput on the v5e MXU.

Chains K dependent convs inside one jit (so the runtime cannot dedupe
repeated identical dispatches) and times the chain. Decides whether an
int8 inference path can beat the bf16 ceiling (v5e: ~197 bf16 TFLOP/s
vs ~394 int8 TOPS).
"""

import time

import numpy as np

K = 8  # convs per chain


def timeit(fn, x, w, n=10):
    """Times ``fn(x, w)`` with the output carried back as the next
    input (shape/dtype-preserving chains only): the remote runtime
    coalesces identical in-flight dispatches, so independent repeats of
    the same call time as pure dispatch overhead."""
    import jax
    import numpy as np

    jfn = jax.jit(fn)
    out = jfn(x, w)
    _ = np.asarray(out.ravel()[0])  # force completion (gold standard on
    # the remote tunnel: block_until_ready has been observed to return
    # before execution there)
    t0 = time.perf_counter()
    for _ in range(n):
        out = jfn(out, w)
    _ = np.asarray(out.ravel()[0])
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    dn = ("NHWC", "HWIO", "NHWC")

    shapes = [
        ("stage1 3x3x64 @56", (960, 56, 56, 64), (3, 3, 64, 64)),
        ("stage2 3x3x128 @28", (960, 28, 28, 128), (3, 3, 128, 128)),
        ("stage3 3x3x256 @14", (960, 14, 14, 256), (3, 3, 256, 256)),
        ("stage4 3x3x512 @7", (960, 7, 7, 512), (3, 3, 512, 512)),
    ]
    print("| layer | bf16 ms | int8 ms | speedup | bf16 TF/s | int8 TOP/s |")
    print("|---|---|---|---|---|---|")
    for name, xs, ws in shapes:
        x = jnp.asarray(rng.standard_normal(xs), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal(ws) * 0.1, jnp.bfloat16)
        xi = jnp.asarray(rng.integers(-127, 127, xs), jnp.int8)
        wi = jnp.asarray(rng.integers(-4, 4, ws), jnp.int8)
        x, w, xi, wi = jax.device_put((x, w, xi, wi), dev)

        def chain_bf16(a, b):
            for _ in range(K):
                a = lax.conv_general_dilated(a, b, (1, 1), "SAME",
                                             dimension_numbers=dn)
                a = jnp.clip(a, -1, 1)  # keep finite, fused elementwise
            return a

        def chain_int8(a, b):
            for _ in range(K):
                y = lax.conv_general_dilated(a, b, (1, 1), "SAME",
                                             dimension_numbers=dn,
                                             preferred_element_type=jnp.int32)
                a = jnp.clip(y >> 6, -127, 127).astype(jnp.int8)
            return a

        t_bf = timeit(chain_bf16, x, w)
        try:
            t_i8 = timeit(chain_int8, xi, wi)
        except Exception as e:
            print(f"| {name} | {t_bf*1e3/K:.3f} | FAIL {type(e).__name__}: {e} |")
            continue
        flops = 2 * xs[0] * xs[1] * xs[2] * ws[3] * ws[0] * ws[1] * ws[2] * K
        print(f"| {name} | {t_bf*1e3/K:7.3f} | {t_i8*1e3/K:7.3f} | "
              f"{t_bf/t_i8:5.2f}x | {flops/t_bf/1e12:6.1f} | "
              f"{flops/t_i8/1e12:6.1f} |", flush=True)

    # int8 matmul sanity chain
    a8 = jax.device_put(jnp.asarray(rng.integers(-127, 127, (8192, 2048)), jnp.int8), dev)
    b8 = jax.device_put(jnp.asarray(rng.integers(-4, 4, (2048, 2048)), jnp.int8), dev)

    def mm_bf(a, b):
        for _ in range(K):
            a = jnp.clip(a @ b, -1, 1)
        return a

    def mm_i8(a, b):
        for _ in range(K):
            y = lax.dot(a, b, preferred_element_type=jnp.int32)
            a = jnp.clip(y >> 6, -127, 127).astype(jnp.int8)
        return a

    t_bf = timeit(mm_bf, a8.astype(jnp.bfloat16), b8.astype(jnp.bfloat16))
    t_i8 = timeit(mm_i8, a8, b8)
    fl = 2 * 8192 * 2048 * 2048 * K
    print(f"| matmul 8192x2048x2048 | {t_bf*1e3/K:7.3f} | {t_i8*1e3/K:7.3f} | "
          f"{t_bf/t_i8:5.2f}x | {fl/t_bf/1e12:6.1f} | {fl/t_i8/1e12:6.1f} |",
          flush=True)


if __name__ == "__main__":
    main()
