"""Experiment: channel-packed formulations of the small-C_in stems.

Hypothesis (round-2 perf push): the TalkNet 3D stem (C_in=1) and the
resnet18 conv1 (C_in=3) starve the MXU because XLA pads the channel
(sublane) dim to 8 — a 1-channel conv runs at <=12.5% of peak before
any other loss. Packing spatial pixels into channels (space-to-depth
h2xw4 => C_in=8, with the 2 output-w phases packed into C_out=128)
trades ~1.96x padded MACs for full sublane/lane utilization, a net win
if the current stem runs below ~50% of the packed rate.

Run: python tools/exp_stem_pack.py   (on the TPU)
"""

import sys
import time

import numpy as np

B = 64
T = 30


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
    try:
        cost = jfn.lower(*args).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
    except Exception:
        flops = 0.0
    print(f"| {name} | {dt*1e3:8.2f} | {flops/1e9:8.1f} | {flops/dt/1e12:6.1f} |",
          flush=True)
    return dt


def pack_stem3d_kernel(k):
    """(5,7,7,1,64) -> (5,4,3,8,128) for the h2xw4 packed layout."""
    kt, kh, kw, _, co = k.shape
    assert (kt, kh, kw) == (5, 7, 7)
    kp = np.zeros((5, 4, 3, 8, 2 * co), k.dtype)
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
                            kp[:, d, g, e * 4 + f, p * co:(p + 1) * co] = \
                                k[:, h, w, 0, :]
    return kp


def stem3d_packed(x, kp, dtype):
    """x (B,T,112,112) gray -> (B,T,56,56,64), same math as
    conv3d(k=(5,7,7), s=(1,2,2), pad=(2,3,3)) with C_in=1."""
    import jax
    import jax.numpy as jnp

    b, t, h, w = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (4, 4), (4, 4)))
    hp, wp = h + 8, w + 8
    xs = xp.reshape(b, t, hp // 2, 2, wp // 4, 4)
    xs = jnp.transpose(xs, (0, 1, 2, 4, 3, 5)).reshape(
        b, t, hp // 2, wp // 4, 8)
    y = jax.lax.conv_general_dilated(
        xs.astype(dtype), kp.astype(dtype), window_strides=(1, 1, 1),
        padding=[(2, 2), (0, 0), (0, 0)],
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"))
    y = y[:, :, : h // 2]                     # (B,T,56,28,128)
    ho, wo2 = y.shape[2], y.shape[3]
    y = y.reshape(b, t, ho, wo2, 2, 64)
    y = jnp.transpose(y, (0, 1, 2, 3, 4, 5)).reshape(b, t, ho, wo2 * 2, 64)
    return y


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    cpu = jax.devices("cpu")[0]
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    def put(x):
        return jax.device_put(jnp.asarray(x, jnp.float32), dev)

    faces = put(rng.uniform(0, 255, (B, T, 112, 112)))
    k3d = rng.standard_normal((5, 7, 7, 1, 64)).astype(np.float32) * 0.05
    kp = pack_stem3d_kernel(k3d)

    # ---- numeric check (small, f32, on device) ----
    small = put(rng.uniform(0, 255, (2, 6, 112, 112)))

    def ref_stem(x, k):
        x = ((x / 255.0 - 0.4161) / 0.1688)[..., None]
        return jax.lax.conv_general_dilated(
            x.astype(jnp.float32), jnp.asarray(k, jnp.float32),
            window_strides=(1, 2, 2), padding=[(2, 2), (3, 3), (3, 3)],
            dimension_numbers=("NTHWC", "THWIO", "NTHWC"))

    def packed_stem(x, kp, dtype):
        x = (x / 255.0 - 0.4161) / 0.1688
        return stem3d_packed(x, jnp.asarray(kp), dtype)

    a = np.asarray(jax.jit(lambda x: ref_stem(x, k3d))(small))
    bb = np.asarray(jax.jit(lambda x: packed_stem(x, kp, jnp.float32))(small))
    err = np.abs(a - bb).max() / (np.abs(a).max() + 1e-9)
    print(f"packed-stem max rel err vs conv3d: {err:.2e}", flush=True)
    assert err < 1e-4, err

    print("| section | ms | GFLOP | TFLOP/s |")
    print("|---|---|---|---|")

    # 1. current stem formulation (conv3d C_in=1), bf16
    bench("stem3d conv (C_in=1) bf16",
          lambda x: ref_stem(x, np.asarray(k3d)).astype(dt), (faces,))

    # 2. packed stem, bf16
    bench("stem3d packed h2w4 bf16",
          lambda x: packed_stem(x, kp, dt), (faces,))

    # 3. resnet18 conv1 (C_in=3) standalone, bf16, b64*T frames
    video = put(rng.standard_normal((B * T, 224, 224, 3)))
    k1 = (rng.standard_normal((7, 7, 3, 64)) * 0.05).astype(np.float32)
    bench("resnet18 conv1 (C_in=3) bf16",
          lambda x: jax.lax.conv_general_dilated(
              x.astype(dt), jnp.asarray(k1, dt), (2, 2),
              [(3, 3), (3, 3)],
              dimension_numbers=("NHWC", "HWIO", "NHWC")), (video,))

    # 4. trunk stage1 (56x56 C64) int8: 4 convs chained, current QuantConv math
    act56 = put(np.abs(rng.standard_normal((B * T, 56, 56, 64))))

    def chain_int8(x, ws, n_ch):
        for i in range(n_ch):
            s_act = jnp.float32(3.0 / 127.0)
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_act),
                          -127, 127).astype(jnp.int8)
            acc = jax.lax.conv_general_dilated(
                xq, ws[i], (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            x = jnp.maximum(acc.astype(jnp.float32) * 2e-4, 0.0).astype(dt)
        return x

    w64 = [np.clip(np.round(rng.standard_normal((3, 3, 64, 64)) * 30), -127,
                   127).astype(np.int8) for _ in range(4)]
    bench("stage1 4x conv3x3 C64 int8 (as shipped)",
          lambda x: chain_int8(x, [jnp.asarray(w) for w in w64], 4), (act56,))

    # 5. same via s2d(2) packed layout: conv 3x3 C64 -> conv 5x5 C256 on 28x28
    #    kernel: out cell (i,j) phase (a,b); taps k[kh,kw] at s2d offsets
    def pack33(k):
        co = k.shape[-1]
        kp = np.zeros((5, 5, 4 * k.shape[2], 4 * co), k.dtype)
        for a in range(2):
            for b2 in range(2):
                for d in range(5):
                    for e in range(2):
                        h = 2 * d + e - 2 - a  # px offset into 3x3: want 0..2
                        for g in range(5):
                            for f in range(2):
                                w = 2 * g + f - 2 - b2
                                if 0 <= h < 3 and 0 <= w < 3:
                                    kp[d, g,
                                       e * 2 + f::4,
                                       (a * 2 + b2) * co:(a * 2 + b2 + 1) * co] \
                                        = 0  # placeholder
        return kp

    # NOTE: full s2d(2) stage packing deferred — ratio 2.04x padded MACs
    # makes it a wash per the roofline; only measure if 4 shows <120 TOPS.

    # 6. stage1 as one fused 128-lane variant: two independent trunks'
    #    conv merged on the lane axis: [x1|x2] @ blockdiag(w1,w2)
    act56b = put(np.abs(rng.standard_normal((B * T, 56, 56, 128))))
    wbd = np.zeros((3, 3, 128, 128), np.int8)
    wbd[:, :, :64, :64] = w64[0]
    wbd[:, :, 64:, 64:] = w64[1]
    bench("stage1 conv3x3 C128 blockdiag int8 (2 trunks fused)",
          lambda x: chain_int8(x, [jnp.asarray(wbd)], 1), (act56b,))

    # 7. plain C128 and C256 3x3 int8 reference points at 28x28
    act28 = put(np.abs(rng.standard_normal((B * T, 28, 28, 128))))
    w128 = np.clip(np.round(rng.standard_normal((3, 3, 128, 128)) * 30),
                   -127, 127).astype(np.int8)
    bench("conv3x3 C128 @28 int8",
          lambda x: chain_int8(x, [jnp.asarray(w128)], 1), (act28,))


if __name__ == "__main__":
    main()
