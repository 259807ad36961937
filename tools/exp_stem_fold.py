"""Round-3 stem experiments: BN folding + int8-before-pool.

exp_trunk_prefix.py decomposed the int8 trunk (b128): stem 40 ms,
layer1 24 ms — the stem's cost is HBM traffic (conv1 writes 6.2 GB
bf16 at 112x112x64, the pool reads it back and writes 1.5 GB, BN+relu
may cost another round trip if unfused). Variants:

  A  baseline: conv1 -> BN -> relu -> pool(bf16) -> layer1 (quantize
     from bf16 before each int8 conv) — the shipped structure;
  B  BN folded into the conv1 weight/bias constants (scale*W, bias) —
     free if XLA already folds constant multiplies into conv filters,
     a win if it does not;
  C  B + quantize BEFORE the maxpool: pool runs on int8 (half the
     traffic; max commutes with the monotonic quantize) and layer1's
     first conv consumes the int8 directly, dropping its quantize pass.

Run: python tools/exp_stem_fold.py   (TPU, idle host)
"""


import numpy as np

B, T = 128, 30
FRAMES = B * T


from _exp_util import bench  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as fnn

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    dn = ("NHWC", "HWIO", "NHWC")

    k1 = (rng.standard_normal((7, 7, 3, 64)) * 0.05).astype(np.float32)
    gamma = rng.uniform(0.5, 1.5, 64).astype(np.float32)
    beta = rng.standard_normal(64).astype(np.float32) * 0.1
    mean = rng.standard_normal(64).astype(np.float32) * 0.1
    var = rng.uniform(0.5, 1.5, 64).astype(np.float32)
    scale = gamma / np.sqrt(var + 1e-5)
    k1_folded = (k1 * scale).astype(np.float32)
    b_folded = (beta - mean * scale).astype(np.float32)

    # layer1: 4 chained 3x3 C64 int8 convs with static scales, BN+relu
    # folded into the dequant epilogue (deployment semantics)
    w64 = [np.clip(np.round(rng.standard_normal((3, 3, 64, 64)) * 30), -127,
                   127).astype(np.int8) for _ in range(4)]
    s_act = np.float32(4.0 / 127.0)

    def pool(y):
        return fnn.max_pool(y, (3, 3), strides=(2, 2),
                            padding=[(1, 1), (1, 1)])

    def quant(x):
        return jnp.clip(jnp.round(x.astype(jnp.float32) / s_act),
                        -127, 127).astype(jnp.int8)

    def layer1(xq_or_x, pre_quant):
        x = xq_or_x
        for i in range(4):
            xq = x if (pre_quant and i == 0) else quant(x)
            acc = jax.lax.conv_general_dilated(
                xq, jnp.asarray(w64[i]), (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=dn, preferred_element_type=jnp.int32)
            x = jnp.maximum(acc.astype(jnp.float32) * 2e-4 + 0.01,
                            0.0).astype(bf)
        return x

    def variant_a(x):
        y = jax.lax.conv_general_dilated(
            x, jnp.asarray(k1, bf), (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=dn)
        y = (y.astype(jnp.float32) - mean) * scale + beta
        y = jnp.maximum(y, 0.0).astype(bf)
        return layer1(pool(y), pre_quant=False)

    def variant_b(x):
        y = jax.lax.conv_general_dilated(
            x, jnp.asarray(k1_folded, bf), (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=dn)
        y = jnp.maximum(y.astype(jnp.float32) + b_folded, 0.0).astype(bf)
        return layer1(pool(y), pre_quant=False)

    def variant_c(x):
        y = jax.lax.conv_general_dilated(
            x, jnp.asarray(k1_folded, bf), (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=dn)
        y = jnp.maximum(y.astype(jnp.float32) + b_folded, 0.0)
        yq = quant(y)                       # int8 BEFORE the pool
        return layer1(pool(yq), pre_quant=True)

    x = jax.device_put(
        jnp.asarray(rng.standard_normal((FRAMES, 224, 224, 3)), bf), dev)

    print(f"| stem+layer1 variant ({FRAMES} frames) | ms |", flush=True)
    print("|---|---|")
    bench("A: conv1+BN+relu+pool(bf16)+layer1 (shipped)", variant_a, (x,))
    bench("B: BN folded into conv1 consts", variant_b, (x,))
    bench("C: B + int8 pool feeding layer1", variant_c, (x,))


if __name__ == "__main__":
    main()
