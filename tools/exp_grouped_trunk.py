"""Dual-trunk fusion experiment: run the LAM + TTM resnet18 trunks as ONE
channel-concatenated trunk (128-ch stem conv + feature_group_count=2 int8
stage convs) instead of two separate 64-ch trunks.

Motivation (docs/PROFILE.md round-4 stem ablation): int8 tensors tile
(32, 128) on TPU, so every 64-channel int8 tensor is lane-padded to 128 —
the stage-1 activations and the s8 stem map are PHYSICALLY 2x their
logical bytes. The two RGB trunks are architecturally identical resnet18s
consuming the SAME frames, so concatenating them channel-wise makes every
int8 tensor exactly one lane tile wide:

  * stem: one (7,7,3,128) conv IS both stems (same input, concat filters)
    — one s8 map write at full lane density instead of two half-dense;
  * stages: grouped convs (feature_group_count=2) with block-concat
    kernels compute exactly the two separate contractions; per-channel
    dequant absorbs the per-trunk activation scales (each group shares
    one scale, so the scale still factors out of the int32 accum);
  * residual adds / BN / relu are elementwise — concat-transparent.

Variants (all weights + scales folded as jit constants, as in bench.py):
  A  two separate trunks (the shipped formulation)
  B  fused: 128-ch stem + grouped stages
  C  fused stem only, separate stages from layer1 (isolates the stem win)
  D  fused stem + BLOCK-DIAGONAL dense 128-ch layer1 convs (2x FLOPs but
     full-depth K=1152 contractions), grouped from layer2

Prints a prefix table (stem / +layer1 / ... / full) per variant and
checks A vs B outputs are bit-identical (the int32 accumulations are the
same sums reordered only by XLA).

Usage: python tools/exp_grouped_trunk.py   [N_FRAMES=3840 N_ITER=8]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _exp_util import bench  # noqa: E402

STAGES = (2, 2, 2, 2)
WIDTH = 64


def make_trunk_weights(rng, tag):
    """Random resnet18 trunk weights + fake calibrated scales (values do
    not affect timing; structure matches nn/resnet2d.py quant path)."""
    p = {}
    p["stem_k"] = rng.standard_normal((7, 7, 3, WIDTH)).astype(np.float32) * 0.05
    p["stem_bn_scale"] = rng.uniform(0.5, 1.5, (WIDTH,)).astype(np.float32)
    p["stem_bn_shift"] = rng.uniform(-0.1, 0.1, (WIDTH,)).astype(np.float32)
    p["stem_act_max"] = np.float32(4.0)
    cin = WIDTH
    for s, blocks in enumerate(STAGES):
        f = WIDTH * 2 ** s
        for b in range(blocks):
            key = f"l{s}_{b}"
            p[key] = blk = {}
            blk["w1"] = rng.standard_normal((3, 3, cin, f)).astype(np.float32) * 0.05
            blk["w2"] = rng.standard_normal((3, 3, f, f)).astype(np.float32) * 0.05
            if (2 if s > 0 and b == 0 else 1) != 1 or cin != f:
                blk["wd"] = rng.standard_normal((1, 1, cin, f)).astype(np.float32) * 0.05
            for n in ("bn1", "bn2", "bnd"):
                blk[n + "_scale"] = rng.uniform(0.5, 1.5, (f,)).astype(np.float32)
                blk[n + "_shift"] = rng.uniform(-0.1, 0.1, (f,)).astype(np.float32)
            blk["a2_max"] = np.float32(4.0)   # conv2 input scale
            blk["out_max"] = np.float32(4.0)  # chained block output scale
            cin = f
    return p


def quantize_w(w):
    """Per-output-channel symmetric int8 (numpy, precomputed constants)."""
    s = np.maximum(np.abs(w).reshape(-1, w.shape[-1]).max(0), 1e-12) / 127.0
    return np.round(w / s).astype(np.int8), s.astype(np.float32)


def cat_w(wa, wb):
    return np.concatenate([wa, wb], axis=-1)


def blockdiag_w(wa, wb):
    kh, kw, ci, co = wa.shape
    out = np.zeros((kh, kw, 2 * ci, 2 * co), wa.dtype)
    out[:, :, :ci, :co] = wa
    out[:, :, ci:, co:] = wb
    return out


def main():
    import jax
    import jax.numpy as jnp

    n_frames = int(os.environ.get("N_FRAMES", "3840"))
    n_iter = int(os.environ.get("N_ITER", "8"))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n_frames, 224, 224, 3)), jnp.float32)

    pa = make_trunk_weights(np.random.default_rng(1), "a")
    pb = make_trunk_weights(np.random.default_rng(2), "b")

    def stem(xin, k, bns, bnb, amax):
        y = jax.lax.conv_general_dilated(
            xin.astype(jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
            (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y * jnp.asarray(bns, jnp.bfloat16) + jnp.asarray(bnb, jnp.bfloat16)
        y = jax.nn.relu(y)
        s = amax / 127.0
        yq = jnp.clip(jnp.round(y.astype(jnp.float32) / s),
                      -127, 127).astype(jnp.int8)
        yq = jax.lax.reduce_window(
            yq, jnp.int8(-128), jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)])
        return yq, s

    def iconv(xq, wq, sw, s_in, stride, pad, groups=1):
        """int8 conv + per-channel dequant to bf16. ``s_in`` is scalar or
        a per-GROUP vector expanded to output channels (constant)."""
        acc = jax.lax.conv_general_dilated(
            xq, jnp.asarray(wq), (stride, stride), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
            preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * (s_in * sw)).astype(jnp.bfloat16)

    def requant(y, amax):
        s = amax / 127.0
        return jnp.clip(jnp.round(y.astype(jnp.float32) / s),
                        -127, 127).astype(jnp.int8), s

    def expand(scalars, f):
        """Per-trunk scalars -> per-output-channel vector (f per trunk)."""
        return np.repeat(np.asarray(scalars, np.float32), f)

    def build_run(mode, n_stages=4):
        """mode: 'sep' | 'grp' | 'stemfused' | 'bdiag1'."""
        fused_stem = mode != "sep"
        if fused_stem:
            stem_k = cat_w(pa["stem_k"], pb["stem_k"])
            stem_bns = np.concatenate([pa["stem_bn_scale"], pb["stem_bn_scale"]])
            stem_bnb = np.concatenate([pa["stem_bn_shift"], pb["stem_bn_shift"]])
            # per-half quantize scale rides as a (128,) vector divisor
            stem_s = expand([pa["stem_act_max"] / 127.0,
                             pb["stem_act_max"] / 127.0], WIDTH)

        def run_one(xin, p):
            yq, s_in = stem(xin, p["stem_k"], p["stem_bn_scale"],
                            p["stem_bn_shift"], p["stem_act_max"])
            outs = [yq]
            cin = WIDTH
            for s, blocks in enumerate(STAGES[:n_stages]):
                f = WIDTH * 2 ** s
                for b in range(blocks):
                    blk = p[f"l{s}_{b}"]
                    stride = 2 if s > 0 and b == 0 else 1
                    w1q, sw1 = quantize_w(blk["w1"])
                    w2q, sw2 = quantize_w(blk["w2"])
                    y = iconv(yq, w1q, sw1, s_in, stride, [(1, 1), (1, 1)])
                    y = y * jnp.asarray(blk["bn1_scale"], jnp.bfloat16) \
                        + jnp.asarray(blk["bn1_shift"], jnp.bfloat16)
                    y = jax.nn.relu(y)
                    y2q, s2 = requant(y, blk["a2_max"])
                    z = iconv(y2q, w2q, sw2, s2, 1, [(1, 1), (1, 1)])
                    z = z * jnp.asarray(blk["bn2_scale"], jnp.bfloat16) \
                        + jnp.asarray(blk["bn2_shift"], jnp.bfloat16)
                    if "wd" in blk:
                        wdq, swd = quantize_w(blk["wd"])
                        idn = iconv(yq, wdq, swd, s_in, stride, [(0, 0), (0, 0)])
                        idn = idn * jnp.asarray(blk["bnd_scale"], jnp.bfloat16) \
                            + jnp.asarray(blk["bnd_shift"], jnp.bfloat16)
                    else:
                        idn = (yq.astype(jnp.float32) * s_in).astype(jnp.bfloat16)
                    out = jax.nn.relu(z + idn)
                    yq, s_in = requant(out, blk["out_max"])
                    outs[-1] = yq
                    cin = f
            return yq

        def run_fused(xin, grouped_from=0, n_st=n_stages):
            # fused stem
            y = jax.lax.conv_general_dilated(
                xin.astype(jnp.bfloat16), jnp.asarray(stem_k, jnp.bfloat16),
                (2, 2), [(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = y * jnp.asarray(stem_bns, jnp.bfloat16) \
                + jnp.asarray(stem_bnb, jnp.bfloat16)
            y = jax.nn.relu(y)
            yq = jnp.clip(jnp.round(y.astype(jnp.float32)
                                    / jnp.asarray(stem_s)),
                          -127, 127).astype(jnp.int8)
            yq = jax.lax.reduce_window(
                yq, jnp.int8(-128), jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                [(0, 0), (1, 1), (1, 1), (0, 0)])
            # per-trunk scalar input scales; expanded to per-output- or
            # per-input-channel vectors at each use site
            s_pair = (np.float32(pa["stem_act_max"] / 127.0),
                      np.float32(pb["stem_act_max"] / 127.0))
            cin = WIDTH
            for s, blocks in enumerate(STAGES[:n_st]):
                f = WIDTH * 2 ** s
                for b in range(blocks):
                    ba, bb = pa[f"l{s}_{b}"], pb[f"l{s}_{b}"]
                    stride = 2 if s > 0 and b == 0 else 1
                    dense = mode == "bdiag1" and s == 0
                    if dense:
                        w1q, sw1 = quantize_w(blockdiag_w(ba["w1"], bb["w1"]))
                        w2q, sw2 = quantize_w(blockdiag_w(ba["w2"], bb["w2"]))
                        g = 1
                    else:
                        w1q, sw1 = quantize_w(cat_w(ba["w1"], bb["w1"]))
                        w2q, sw2 = quantize_w(cat_w(ba["w2"], bb["w2"]))
                        g = 2
                    # NOTE: s_in here is a per-OUTPUT-channel constant
                    # vector; valid because each group's inputs share one
                    # scale. For the dense block-diag variant the off-
                    # diagonal zeros contribute nothing, so the same
                    # per-output scale is exact too.
                    bn1s = np.concatenate([ba["bn1_scale"], bb["bn1_scale"]])
                    bn1b = np.concatenate([ba["bn1_shift"], bb["bn1_shift"]])
                    bn2s = np.concatenate([ba["bn2_scale"], bb["bn2_scale"]])
                    bn2b = np.concatenate([ba["bn2_shift"], bb["bn2_shift"]])
                    y = iconv(yq, w1q, sw1, expand(s_pair, f), stride,
                              [(1, 1), (1, 1)], groups=g)
                    y = y * jnp.asarray(bn1s, jnp.bfloat16) \
                        + jnp.asarray(bn1b, jnp.bfloat16)
                    y = jax.nn.relu(y)
                    s2 = expand([ba["a2_max"] / 127.0, bb["a2_max"] / 127.0], f)
                    y2q = jnp.clip(jnp.round(y.astype(jnp.float32)
                                             / jnp.asarray(s2)),
                                   -127, 127).astype(jnp.int8)
                    z = iconv(y2q, w2q, sw2, s2, 1, [(1, 1), (1, 1)], groups=g)
                    z = z * jnp.asarray(bn2s, jnp.bfloat16) \
                        + jnp.asarray(bn2b, jnp.bfloat16)
                    if "wd" in ba:
                        if dense:
                            wdq, swd = quantize_w(blockdiag_w(ba["wd"], bb["wd"]))
                            gd = 1
                        else:
                            wdq, swd = quantize_w(cat_w(ba["wd"], bb["wd"]))
                            gd = 2
                        bnds = np.concatenate([ba["bnd_scale"], bb["bnd_scale"]])
                        bndb = np.concatenate([ba["bnd_shift"], bb["bnd_shift"]])
                        idn = iconv(yq, wdq, swd, expand(s_pair, f), stride,
                                    [(0, 0), (0, 0)], groups=gd)
                        idn = idn * jnp.asarray(bnds, jnp.bfloat16) \
                            + jnp.asarray(bndb, jnp.bfloat16)
                    else:
                        idn = (yq.astype(jnp.float32)
                               * jnp.asarray(expand(s_pair, cin))
                               ).astype(jnp.bfloat16)
                    out = jax.nn.relu(z + idn)
                    so = expand([ba["out_max"] / 127.0, bb["out_max"] / 127.0], f)
                    yq = jnp.clip(jnp.round(out.astype(jnp.float32)
                                            / jnp.asarray(so)),
                                  -127, 127).astype(jnp.int8)
                    s_pair = (np.float32(ba["out_max"] / 127.0),
                              np.float32(bb["out_max"] / 127.0))
                    cin = f
            return yq

        def run_stemfused_then_sep(xin, n_st=n_stages):
            yq = run_fused(xin, n_st=0)
            outs = []
            for p in (pa, pb):
                # slice this trunk's half; the slice is one relayout but
                # the stem write was half the padded bytes
                half = yq[..., :WIDTH] if p is pa else yq[..., WIDTH:]
                s_in = np.float32(p["stem_act_max"] / 127.0)
                cin = WIDTH
                cur = half
                for s, blocks in enumerate(STAGES[:n_st]):
                    f = WIDTH * 2 ** s
                    for b in range(blocks):
                        blk = p[f"l{s}_{b}"]
                        stride = 2 if s > 0 and b == 0 else 1
                        w1q, sw1 = quantize_w(blk["w1"])
                        w2q, sw2 = quantize_w(blk["w2"])
                        y = iconv(cur, w1q, sw1, s_in, stride, [(1, 1), (1, 1)])
                        y = y * jnp.asarray(blk["bn1_scale"], jnp.bfloat16) \
                            + jnp.asarray(blk["bn1_shift"], jnp.bfloat16)
                        y = jax.nn.relu(y)
                        y2q, s2 = requant(y, blk["a2_max"])
                        z = iconv(y2q, w2q, sw2, s2, 1, [(1, 1), (1, 1)])
                        z = z * jnp.asarray(blk["bn2_scale"], jnp.bfloat16) \
                            + jnp.asarray(blk["bn2_shift"], jnp.bfloat16)
                        if "wd" in blk:
                            wdq, swd = quantize_w(blk["wd"])
                            idn = iconv(cur, wdq, swd, s_in, stride,
                                        [(0, 0), (0, 0)])
                            idn = idn * jnp.asarray(blk["bnd_scale"], jnp.bfloat16) \
                                + jnp.asarray(blk["bnd_shift"], jnp.bfloat16)
                        else:
                            idn = (cur.astype(jnp.float32)
                                   * s_in).astype(jnp.bfloat16)
                        out = jax.nn.relu(z + idn)
                        cur, s_in = requant(out, blk["out_max"])
                        cin = f
                outs.append(cur)
            return outs[0], outs[1]

        if mode == "sep":
            return lambda xin: (run_one(xin, pa), run_one(xin, pb))
        if mode == "stemfused":
            return run_stemfused_then_sep
        return run_fused

    print(f"# dual-trunk fusion, {n_frames} frames, weights as constants")
    print("| variant | ms |")
    print("|---|---|")

    # prefix sweep: stages 1..4 for A and B; C/D full only
    for n_st in (1, 2, 4):
        ta = bench(f"A separate, stem+{n_st} stage(s)",
                   build_run("sep", n_st), (x,), n=n_iter)
        tb = bench(f"B grouped fused, stem+{n_st} stage(s)",
                   build_run("grp", n_st), (x,), n=n_iter)
        print(f"|   -> B/A = {tb / ta:.3f} | |")
    tc = bench("C fused stem, separate stages (full)",
               build_run("stemfused", 4), (x,), n=n_iter)
    td = bench("D fused stem + bdiag layer1 + grouped rest (full)",
               build_run("bdiag1", 4), (x,), n=n_iter)

    # correctness: A vs B bit-compare on a small input
    xs = jnp.asarray(np.random.default_rng(3)
                     .standard_normal((8, 224, 224, 3)), jnp.float32)
    import jax
    ya, yb_ = jax.jit(build_run("sep", 4))(xs)
    yf = jax.jit(build_run("grp", 4))(xs)
    fa, fb = np.asarray(yf[..., :512]), np.asarray(yf[..., 512:])
    ok_a = np.array_equal(np.asarray(ya), fa)
    ok_b = np.array_equal(np.asarray(yb_), fb)
    mis_a = float(np.mean(np.asarray(ya) != fa))
    mis_b = float(np.mean(np.asarray(yb_) != fb))
    print(f"bit-exact A-half={ok_a} (mismatch {mis_a:.2e}) "
          f"B-half={ok_b} (mismatch {mis_b:.2e})  (int8 outputs)")


if __name__ == "__main__":
    main()
