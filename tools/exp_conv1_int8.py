"""Experiment (round 3): int8 + space-to-depth formulations of conv1.

The resnet18 stem (7x7/2, C_in=3) is the last big float section of the
bench graph: ~33 ms x2 of the 227 ms b128 batch (docs/PROFILE.md). At
C_in=3 the int8 MXU is starved (sublane tile 32), which is why plain
int8 stems lost in round 2. Space-to-depth raises C_in before
quantizing:

  * s2d(2): 224x224x3 -> 112x112x12, kernel 4x4, stride 1 (the existing
    float `_s2d_stem_conv` transform, here in int8);
  * s2d(4)+phases: 224x224x3 -> 58x58x48 (pad 4), kernel 3x3 VALID,
    C_out=4*64 (the 2x2 output-phase grid packed into lanes), then
    depth-to-space back to 112x112x64. C_in=48 fills bf16 sublanes
    exactly and 75% of an int8 tile.

Each variant is timed WITH the following 3x3/2 maxpool (the consumer
whose layout it feeds) and numerically checked against the plain lax
conv on a small f32 batch first.

Run: python tools/exp_conv1_int8.py   (on the TPU, idle host)
"""


import numpy as np

B = 128
T = 30
FRAMES = B * T


from _exp_util import bench  # noqa: E402


def pack_s2d4_kernel(k):
    """(7,7,3,F) -> (3,3,48,4F): s2d(4) input cells, 2x2 output phases.

    Input rows are padded by 4 (not the conv's 3) so cells align; tap
    kh for output phase a lands in padded row 4I + 2a + kh + 1, i.e.
    kernel cell d=(2a+kh+1)//4, in-cell offset e=(2a+kh+1)%4.
    """
    co = k.shape[-1]
    kp = np.zeros((3, 3, 48, 4 * co), k.dtype)
    for a in range(2):
        for b in range(2):
            for kh in range(7):
                dh, eh = divmod(2 * a + kh + 1, 4)
                for kw in range(7):
                    dw, ew = divmod(2 * b + kw + 1, 4)
                    for c in range(3):
                        kp[dh, dw, (eh * 4 + ew) * 3 + c,
                           (a * 2 + b) * co:(a * 2 + b + 1) * co] = \
                            k[kh, kw, c, :]
    return kp


def s2d4(x):
    """(N,224,224,3) -> (N,58,58,48), rows/cols padded by 4 each side."""
    import jax.numpy as jnp

    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)))
    hp, wp = h + 8, w + 8
    xs = xp.reshape(n, hp // 4, 4, wp // 4, 4, c)
    return jnp.transpose(xs, (0, 1, 3, 2, 4, 5)).reshape(
        n, hp // 4, wp // 4, 16 * c)


def d2s_phases(y, co):
    """(N,56,56,4co) phase layout -> (N,112,112,co)."""
    import jax.numpy as jnp

    n, hc, wc, _ = y.shape
    y = y.reshape(n, hc, wc, 2, 2, co)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
    return y.reshape(n, hc * 2, wc * 2, co)


def pack_s2d2_kernel(k):
    """(7,7,3,F) -> (4,4,12,F) for the stride-1 s2d(2) layout (same
    construction as egot2x.nn.resnet2d._s2d_stem_conv)."""
    co = k.shape[-1]
    kp8 = np.zeros((8, 8, 3, co), k.dtype)
    kp8[:7, :7] = k
    k2 = kp8.reshape(4, 2, 4, 2, 3, co)
    return np.transpose(k2, (0, 2, 1, 3, 4, 5)).reshape(4, 4, 12, co)


def s2d2(x):
    import jax.numpy as jnp

    n, h, w, c = x.shape
    pr = 5 + (h + 8) % 2
    xp = jnp.pad(x, ((0, 0), (3, pr), (3, pr), (0, 0)))
    hp, wp = xp.shape[1] // 2, xp.shape[2] // 2
    xs = xp.reshape(n, hp, 2, wp, 2, c)
    return jnp.transpose(xs, (0, 1, 3, 2, 4, 5)).reshape(n, hp, wp, 4 * c)


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    dn = ("NHWC", "HWIO", "NHWC")

    k1 = (rng.standard_normal((7, 7, 3, 64)) * 0.05).astype(np.float32)
    kp4 = pack_s2d4_kernel(k1)
    kp2 = pack_s2d2_kernel(k1)

    def pool(y):
        from flax import linen as nn

        return nn.max_pool(y, (3, 3), strides=(2, 2),
                           padding=[(1, 1), (1, 1)])

    def quant_w(k):
        s = np.maximum(np.abs(k).max(axis=(0, 1, 2)), 1e-12) / 127.0
        return np.round(k / s).astype(np.int8), s.astype(np.float32)

    def quant_x(x, s_act):
        return jnp.clip(jnp.round(x.astype(jnp.float32) / s_act),
                        -127, 127).astype(jnp.int8)

    # ---------- formulations ----------
    def f_plain(x, kk, dtype):
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), jnp.asarray(kk, dtype), (2, 2),
            [(3, 3), (3, 3)], dimension_numbers=dn)
        return pool(y)

    def f_plain_int8(x, s_act):
        wq, sw = quant_w(k1)
        acc = jax.lax.conv_general_dilated(
            quant_x(x, s_act), jnp.asarray(wq), (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=dn, preferred_element_type=jnp.int32)
        return pool((acc.astype(jnp.float32) * (s_act * sw)).astype(bf))

    def f_s2d2(x, dtype):
        y = jax.lax.conv_general_dilated(
            s2d2(x).astype(dtype), jnp.asarray(kp2, dtype), (1, 1),
            "VALID", dimension_numbers=dn)[:, :112, :112]
        return pool(y)

    def f_s2d2_int8(x, s_act):
        wq, sw = quant_w(kp2)
        acc = jax.lax.conv_general_dilated(
            quant_x(s2d2(x), s_act), jnp.asarray(wq), (1, 1), "VALID",
            dimension_numbers=dn,
            preferred_element_type=jnp.int32)[:, :112, :112]
        return pool((acc.astype(jnp.float32) * (s_act * sw)).astype(bf))

    def f_s2d4(x, dtype):
        y = jax.lax.conv_general_dilated(
            s2d4(x).astype(dtype), jnp.asarray(kp4, dtype), (1, 1),
            "VALID", dimension_numbers=dn)
        return pool(d2s_phases(y, 64))

    def f_s2d4_int8(x, s_act):
        wq, sw = quant_w(kp4)
        acc = jax.lax.conv_general_dilated(
            quant_x(s2d4(x), s_act), jnp.asarray(wq), (1, 1), "VALID",
            dimension_numbers=dn, preferred_element_type=jnp.int32)
        y = (acc.astype(jnp.float32) * (s_act * sw)).astype(bf)
        return pool(d2s_phases(y, 64))

    # ---------- numeric check (small, f32) ----------
    small = jax.device_put(
        jnp.asarray(rng.standard_normal((2, 224, 224, 3)), jnp.float32), dev)
    ref = np.asarray(jax.jit(lambda x: f_plain(x, k1, jnp.float32))(small))
    for nm, fn in [("s2d2", lambda x: f_s2d2(x, jnp.float32)),
                   ("s2d4", lambda x: f_s2d4(x, jnp.float32))]:
        got = np.asarray(jax.jit(fn)(small))
        err = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-9)
        print(f"{nm} max rel err vs plain conv+pool: {err:.2e}", flush=True)
        assert err < 1e-4, (nm, err)

    # ---------- timing at the bench operating point ----------
    x = jax.device_put(
        jnp.asarray(rng.standard_normal((FRAMES, 224, 224, 3)), bf), dev)
    s_act = np.float32(4.0 / 127.0)

    print(f"| conv1+pool formulation ({FRAMES} frames) | ms |", flush=True)
    print("|---|---|")
    bench("plain bf16 (shipped)", lambda v: f_plain(v, k1, bf), (x,))
    bench("plain int8 (round-2 negative)", lambda v: f_plain_int8(v, s_act),
          (x,))
    bench("s2d(2) bf16", lambda v: f_s2d2(v, bf), (x,))
    bench("s2d(2) int8", lambda v: f_s2d2_int8(v, s_act), (x,))
    bench("s2d(4)+phases bf16", lambda v: f_s2d4(v, bf), (x,))
    bench("s2d(4)+phases int8", lambda v: f_s2d4_int8(v, s_act), (x,))


if __name__ == "__main__":
    main()
