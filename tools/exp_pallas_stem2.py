"""Round-4 stem experiment: int8-emitting fused pallas stem vs shipped.

The round-3 prefix decomposition (docs/PROFILE.md) put the stem at
39.95 ms of the 95 ms int8 trunk at b128 — dominated by the conv-map
HBM round trip between conv1 and the pool. fused_stem_pool_q quantizes
in the conv epilogue and pools int8 in VMEM: the only HBM write is the
pooled int8 map (0.77 GB vs ~6-12 GB of intermediate traffic), and a
dual-trunk variant lane-stacks both RGB trunks' kernels so the shared
frames are read ONCE.

Usage: python tools/exp_pallas_stem2.py     (real chip, idle)
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
    from egot2x.ops.pallas_stem import (flatten_packed_kernel, fold_bn_quant,
                                        fused_stem_pool, fused_stem_pool_q,
                                        pack_stem_kernel, s2d_input)

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
    k2 = (rng.standard_normal((7, 7, 3, 64)) * 0.05).astype(np.float32)
    gamma = np.abs(rng.standard_normal(64)).astype(np.float32) + 0.5
    beta = rng.standard_normal(64).astype(np.float32) * 0.1
    mean = rng.standard_normal(64).astype(np.float32) * 0.1
    var = np.abs(rng.standard_normal(64)).astype(np.float32) + 0.5
    act_max = np.float32(6.0)
    s = max(act_max, 1e-6) / 127.0

    def shipped_stem(x, k):
        """conv1 + BN + relu + int8 quantize + int8 pool (nn/resnet2d.py
        deployment path; weights close over as jit constants, as in
        bench.py's folded params)."""
        y = jax.lax.conv_general_dilated(
            x.astype(dt16), jnp.asarray(k, dt16), (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        sc = jnp.asarray(gamma / np.sqrt(var + 1e-5), dt16)
        bi = jnp.asarray(beta - mean * gamma / np.sqrt(var + 1e-5), dt16)
        y = jnp.maximum(y * sc + bi, 0)
        yq, _ = quantize_static(y, jnp.float32(act_max))
        return max_pool_int8(yq, (3, 3), (2, 2), [(1, 1), (1, 1)])

    kp1 = jax.device_put(flatten_packed_kernel(
        pack_stem_kernel(k1), 384).astype(dt16), dev)
    kp2 = jax.device_put(flatten_packed_kernel(
        pack_stem_kernel(k2), 384).astype(dt16), dev)
    kp12 = jnp.concatenate([kp1, kp2], axis=1)
    sbq = jax.device_put(fold_bn_quant(gamma, beta, mean, var, 1e-5,
                                       jnp.float32(act_max)), dev)
    sbq2 = jnp.concatenate([sbq, sbq], axis=1)
    sb_plain = jax.device_put(jnp.stack([
        jnp.tile(jnp.asarray(gamma / np.sqrt(var + 1e-5)), 2),
        jnp.tile(jnp.asarray(beta - mean * gamma / np.sqrt(var + 1e-5)), 2),
    ]).astype(jnp.float32), dev)

    def pallas_q(x, kp, sb, tile_h):
        xp = s2d_input(x.astype(dt16))
        return fused_stem_pool_q(xp, kp, sb, conv_h=112, conv_w=56,
                                 tile_h=tile_h)

    # ---- numeric check: pallas int8 vs shipped int8 (bf16-rounding
    # tolerance: allow rare ±1 quantum flips) ----
    small = jax.device_put(jnp.asarray(
        rng.standard_normal((4, 224, 224, 3)), jnp.float32), dev)
    ref = np.asarray(jax.jit(lambda v: shipped_stem(v, k1))(small),
                     np.int32)
    got = np.asarray(jax.jit(
        lambda v: pallas_q(v, kp1, sbq, 16))(small), np.int32)
    diff = np.abs(ref - got)
    frac = float((diff > 0).mean())
    print(f"int8 mismatch: frac={frac:.4f} max={diff.max()} "
          f"(pallas f32-acc vs shipped bf16: ties flip by one quantum; "
          f"the pallas side is the more exact one)", flush=True)
    assert diff.max() <= 1 and frac < 0.08, "pallas int8 stem wrong"

    print(f"\nB*T = {n_img} frames of 224x224x3 (f32 feed)", flush=True)
    print("| variant | ms |\n|---|---|", flush=True)
    bench("A  shipped stem, ONE trunk", lambda x: shipped_stem(x, k1),
          (video,))
    bench("A2 shipped stem, TWO trunks",
          lambda x: (shipped_stem(x, k1), shipped_stem(x, k2)), (video,))
    bench("B  pallas bf16-out (r2), one trunk",
          lambda x: fused_stem_pool(s2d_input(x.astype(dt16)), kp1,
                                    sb_plain, conv_h=112, conv_w=56,
                                    tile_h=16), (video,))
    for th in (16, 28, 56):
        bench(f"C  pallas int8-out, one trunk, tile_h={th}",
              lambda x, th=th: pallas_q(x, kp1, sbq, th), (video,))
    for th in (16, 28, 56):
        bench(f"D  pallas int8-out, DUAL trunk, tile_h={th}",
              lambda x, th=th: pallas_q(x, kp12, sbq2, th), (video,))


if __name__ == "__main__":
    main()
