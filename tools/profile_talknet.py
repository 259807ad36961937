"""Sub-profile TalkNet + trunk batch-size scaling on the TPU.

Sections: visual 3D stem, AVSR resnet layers, TCN+conv1d, audio
SE-ResNet, cross/self attention; plus the resnet18 trunk at batch 64.
"""

import sys
import time

import numpy as np

T = 30
BATCH = 32


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


def main():
    import jax
    import jax.numpy as jnp

    from egot2x.nn.talknet import (AudioEncoder, CrossAttentionLayer,
                                   VisualConv1D, VisualFrontend, VisualTCN)

    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    def put(x):
        return jax.device_put(jnp.asarray(x, jnp.float32), dev)

    faces = put(rng.uniform(0, 255, (BATCH, T, 112, 112)))
    mfcc = put(rng.standard_normal((BATCH, 4 * T, 13)))
    feats512 = put(rng.standard_normal((BATCH, T, 512)))
    emb128 = put(rng.standard_normal((BATCH, T, 128)))

    print("| section | ms | GFLOP | TFLOP/s |")
    print("|---|---|---|---|")

    vf = VisualFrontend(dtype=dt)
    with jax.default_device(cpu):
        v_vf = vf.init(jax.random.key(0), jnp.zeros((1, 2, 112, 112)))
    v_vf = jax.device_put(v_vf, dev)
    bench("visual frontend (3D stem + AVSR resnet)",
          lambda x: vf.apply(v_vf, x, train=False), (faces,))

    tcn = VisualTCN(dtype=dt)
    with jax.default_device(cpu):
        v_tcn = tcn.init(jax.random.key(0), jnp.zeros((1, 2, 512)))
    v_tcn = jax.device_put(v_tcn, dev)
    bench("visual TCN", lambda x: tcn.apply(v_tcn, x, train=False), (feats512,))

    c1d = VisualConv1D(dtype=dt)
    with jax.default_device(cpu):
        v_c1d = c1d.init(jax.random.key(0), jnp.zeros((1, 2, 512)))
    v_c1d = jax.device_put(v_c1d, dev)
    bench("visual conv1d", lambda x: c1d.apply(v_c1d, x, train=False), (feats512,))

    ae = AudioEncoder(dtype=dt)
    with jax.default_device(cpu):
        v_ae = ae.init(jax.random.key(0), jnp.zeros((1, 8, 13)))
    v_ae = jax.device_put(v_ae, dev)
    bench("audio SE-ResNet", lambda x: ae.apply(v_ae, x, train=False), (mfcc,))

    ca = CrossAttentionLayer(128, 8, dtype=dt)
    with jax.default_device(cpu):
        v_ca = ca.init(jax.random.key(0), jnp.zeros((1, 2, 128)), jnp.zeros((1, 2, 128)))
    v_ca = jax.device_put(v_ca, dev)
    bench("one cross-attention layer",
          lambda a, b: ca.apply(v_ca, a, b), (emb128, emb128))

    # trunk batch scaling
    from egot2x.models.lam import LAMBackbone

    lam = LAMBackbone(dtype=dt)
    with jax.default_device(cpu):
        v_lam = lam.init(jax.random.key(0), jnp.zeros((1, 2, 224, 224, 3)),
                         middle=True)
    v_lam = jax.device_put(v_lam, dev)
    for b in (32, 64):
        video = put(rng.standard_normal((b, T, 224, 224, 3)))
        t_tr = bench(f"resnet18 trunk b={b}",
                     lambda v: lam.apply(v_lam, v, middle=True), (video,), n=6)
        print(f"  -> {b / (2 * t_tr):.0f} clips/s if 2 trunks only",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
