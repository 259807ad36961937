"""TalkNet sub-profile at the round-2 operating point (b128, folded
weights): packed stem, int8 AVSR body, TCN, audio encoder, attention."""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

B, T = 128, 30


def bench(name, fn, args, n=8):
    import jax

    jfn = jax.jit(fn)
    out = jfn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = jfn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / n
    print(f"| {name} | {dt*1e3:8.2f} |", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from egot2x.nn.talknet import (AudioEncoder, CrossAttentionLayer,
                                   VisualConv1D, VisualFrontend, VisualTCN)

    dev = jax.devices()[0]
    cpu = jax.devices("cpu")[0]
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    def put(x):
        return jax.device_put(jnp.asarray(x, np.float32), dev)

    faces = put(rng.uniform(0, 255, (B, T, 112, 112)))
    mfcc = put(rng.standard_normal((B, 4 * T, 13)))
    feats512 = put(rng.standard_normal((B, T, 512)))
    emb128 = put(rng.standard_normal((B, T, 128)))

    print("| section (b128, folded) | ms |", flush=True)

    vf = VisualFrontend(dtype=dt, quant=True)
    with jax.default_device(cpu):
        v_vf = dict(vf.init(jax.random.key(0), jnp.zeros((1, 2, 112, 112))))
    v_vf = jax.device_put(v_vf, dev)
    if "quant" in v_vf:
        v_vf["quant"] = jax.tree_util.tree_map(
            lambda x: jnp.full_like(x, 3.0), v_vf["quant"])
    bench("visual frontend (packed stem + int8 AVSR)",
          lambda x: vf.apply(v_vf, x, train=False), (faces,))

    tcn = VisualTCN(dtype=dt)
    with jax.default_device(cpu):
        v_tcn = tcn.init(jax.random.key(0), jnp.zeros((1, 2, 512)))
    v_tcn = jax.device_put(v_tcn, dev)
    bench("visual TCN", lambda x: tcn.apply(v_tcn, x, train=False),
          (feats512,))

    ae = AudioEncoder(dtype=dt)
    with jax.default_device(cpu):
        v_ae = ae.init(jax.random.key(0), jnp.zeros((1, 8, 13)))
    v_ae = jax.device_put(v_ae, dev)
    bench("audio SE-ResNet", lambda x: ae.apply(v_ae, x, train=False),
          (mfcc,))

    ca = CrossAttentionLayer(128, 8, dtype=dt)
    with jax.default_device(cpu):
        v_ca = ca.init(jax.random.key(0), jnp.zeros((1, 2, 128)),
                       jnp.zeros((1, 2, 128)))
    v_ca = jax.device_put(v_ca, dev)
    bench("one cross-attention layer",
          lambda a, b: ca.apply(v_ca, a, b), (emb128, emb128))


if __name__ == "__main__":
    main()
