"""Round-3: static requant chaining through a REAL residual block.

Round-2 measured int8 chaining on bare conv chains (+6%, no residuals).
This measures a realistic basic-block pair at the bench operating
point: does keeping the BLOCK OUTPUT int8 (dequant -> BN -> add ->
relu -> requant fused in one epilogue, int8 handed to the next block)
beat the shipped bf16 block boundaries?

  A  shipped: int8 convs, bf16 between convs and blocks;
  B  int8 block boundaries: each block takes int8 + scale, emits
     int8 + static scale; residual dequants in the add epilogue.

Run: python tools/exp_requant_chain.py   (TPU, idle host)
"""


import numpy as np

B, T = 128, 30
FRAMES = B * T


from _exp_util import bench  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    dn = ("NHWC", "HWIO", "NHWC")

    w = [np.clip(np.round(rng.standard_normal((3, 3, 64, 64)) * 30), -127,
                 127).astype(np.int8) for _ in range(4)]
    s_act = np.float32(4.0 / 127.0)

    def conv(xq, wi):
        return jax.lax.conv_general_dilated(
            xq, jnp.asarray(wi), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=dn, preferred_element_type=jnp.int32)

    def quant(x):
        return jnp.clip(jnp.round(x.astype(jnp.float32) / s_act),
                        -127, 127).astype(jnp.int8)

    def block_a(x, w1, w2):
        """shipped: bf16 in, bf16 out."""
        y = conv(quant(x), w1).astype(jnp.float32) * 2e-4
        y = jnp.maximum(y + 0.01, 0.0).astype(bf)         # BN+relu epilogue
        y = conv(quant(y), w2).astype(jnp.float32) * 2e-4 + 0.01
        return jnp.maximum(y + x.astype(jnp.float32), 0.0).astype(bf)

    def variant_a(x):
        x = block_a(x, w[0], w[1])
        return block_a(x, w[2], w[3])

    def block_b(xq, w1, w2):
        """int8 in (scale s_act), int8 out (same static scale)."""
        y = conv(xq, w1).astype(jnp.float32) * 2e-4
        y = jnp.maximum(y + 0.01, 0.0).astype(bf)
        y = conv(quant(y), w2).astype(jnp.float32) * 2e-4 + 0.01
        res = xq.astype(jnp.float32) * s_act                # dequant in add
        return quant(jnp.maximum(y + res, 0.0))

    def variant_b(xq):
        xq = block_b(xq, w[0], w[1])
        return block_b(xq, w[2], w[3])

    x = jax.device_put(
        jnp.asarray(np.abs(rng.standard_normal((FRAMES, 56, 56, 64))), bf),
        dev)
    xq0 = jax.device_put(
        np.clip(rng.integers(-127, 128, (FRAMES, 56, 56, 64)), -127,
                127).astype(np.int8), dev)

    print(f"| layer1 2-block variant ({FRAMES} frames @56x56x64) | ms |",
          flush=True)
    print("|---|---|")
    bench("A: bf16 block boundaries (shipped)", variant_a, (x,))
    bench("B: int8 block boundaries", variant_b, (xq0,))


if __name__ == "__main__":
    main()
