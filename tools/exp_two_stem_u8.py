"""Round-3: why does the u8 RGB feed lose on the FULL flagship?

tools/exp_conv1_u8.py showed a single stem wins from a u8 feed
(33.5 -> 31.4 ms); the full bench shows the opposite (699 -> 681
clips/s with both video streams u8). The flagship difference: the SAME
RGB tensor feeds TWO trunks (LAM + TTM), so the f32 path's
convert-to-bf16 and the u8 path's normalize both hinge on XLA CSE +
fusion choices across two consumers. This experiment reproduces that
sharing pattern at the bench operating point: two independent stems
(conv1+BN/relu+int8-quantize+pool, as shipped) consuming one input.

Variants:
  A  f32 normalized input, shared by both stems (shipped bench feed);
  B  u8 input, per-stem normalize_u8 to bf16 (shipped model code —
     identical expressions, CSE eligible);
  C  u8 input, normalize ONCE outside, explicit bf16 buffer fed to
     both stems (what CSE should produce);
  D  u8 input, per-stem normalize kept in f32 (the materialization the
     resnet2d docstring blames for 701->678).

Run: python tools/exp_two_stem_u8.py   (TPU, idle host)
"""

import numpy as np

from _exp_util import bench

B, T = 160, 30
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
    ks = [(rng.standard_normal((7, 7, 3, 64)) * 0.05).astype(np.float32)
          for _ in range(2)]
    gamma = rng.uniform(0.5, 1.5, 64).astype(np.float32)
    beta = rng.uniform(-0.1, 0.1, 64).astype(np.float32)
    s_out = np.float32(4.0 / 127.0)

    x_u8 = rng.integers(0, 256, (FRAMES, IMG, IMG, 3), dtype=np.uint8)
    x_f32 = (x_u8.astype(np.float32) / 255.0 - MEAN) / STD
    mean_j = jnp.asarray(MEAN)
    std_j = jnp.asarray(STD)

    def stem(x, k):
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), jnp.asarray(k, jnp.bfloat16), (2, 2),
            [(3, 3), (3, 3)], dimension_numbers=dn)
        y = jnp.maximum(y.astype(jnp.float32) * gamma + beta, 0.0)
        q = jnp.clip(jnp.round(y / s_out), -127, 127).astype(jnp.int8)
        return nn.max_pool(q, (3, 3), strides=(2, 2),
                           padding=[(1, 1), (1, 1)])

    def norm(xu, dtype):
        return ((xu.astype(jnp.float32) / 255.0 - mean_j)
                / std_j).astype(dtype)

    def f_a(x):
        return stem(x, ks[0]), stem(x, ks[1])

    def f_b(xu):
        return (stem(norm(xu, jnp.bfloat16), ks[0]),
                stem(norm(xu, jnp.bfloat16), ks[1]))

    def f_c(xu):
        x = norm(xu, jnp.bfloat16)
        x = jax.lax.optimization_barrier(x)  # force ONE materialization
        return stem(x, ks[0]), stem(x, ks[1])

    def f_d(xu):
        return (stem(norm(xu, jnp.float32), ks[0]),
                stem(norm(xu, jnp.float32), ks[1]))

    # E: the SHIPPED norm-folded stems (nn/resnet2d.py _StemConv): each
    # stem consumes raw u8 with the affine folded into its kernel plus
    # a batch-1 border-correction map — no normalized intermediate; the
    # open question is whether the u8->bf16 convert fuses into the conv
    # input read (if not, each stem pays a private bf16 copy)
    a_fold = (1.0 / (255.0 * STD)).astype(np.float32)
    b_img = np.broadcast_to(-MEAN / STD, (1, IMG, IMG, 3)).astype(np.float32)

    def stem_folded(xu, k):
        y = jax.lax.conv_general_dilated(
            xu.astype(jnp.bfloat16),
            jnp.asarray(k * a_fold[None, None, :, None], jnp.bfloat16),
            (2, 2), [(3, 3), (3, 3)], dimension_numbers=dn)
        m = jax.lax.conv_general_dilated(
            jnp.asarray(b_img, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
            (2, 2), [(3, 3), (3, 3)], dimension_numbers=dn)
        y = y + m
        y = jnp.maximum(y.astype(jnp.float32) * gamma + beta, 0.0)
        q = jnp.clip(jnp.round(y / s_out), -127, 127).astype(jnp.int8)
        return nn.max_pool(q, (3, 3), strides=(2, 2),
                           padding=[(1, 1), (1, 1)])

    def f_e(xu):
        return stem_folded(xu, ks[0]), stem_folded(xu, ks[1])

    # generate the inputs ON device: a multi-GB device_put rides the
    # ~27 MB/s axon tunnel (minutes); the values don't matter for perf
    del x_u8, x_f32
    xu = jax.jit(lambda k: jax.random.randint(
        k, (FRAMES, IMG, IMG, 3), 0, 256, jnp.uint8))(jax.random.key(0))
    xf = jax.jit(lambda x: norm(x, jnp.float32))(xu)
    # scalar-fetch a reduce — ravel()[0] forces a lane-padded (C=3→128)
    # copy of the whole tensor (123 GB at this shape)
    _ = np.asarray(jax.jit(lambda v: v[0, 0, 0, 0])(xf))
    print("inputs staged", flush=True)

    print("| variant | ms |\n|---|---|", flush=True)
    bench("A f32 shared input, 2 stems", f_a, (xf,))
    bench("B u8, per-stem bf16 normalize", f_b, (xu,))
    bench("C u8, one explicit bf16 normalize", f_c, (xu,))
    bench("D u8, per-stem f32 normalize", f_d, (xu,))
    bench("E u8, norm-FOLDED stems (shipped)", f_e, (xu,))


if __name__ == "__main__":
    main()
