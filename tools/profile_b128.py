"""Per-section profile at the round-2 operating point: batch 128,
int8 static-PTQ, packed stem, weights folded as jit constants."""

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

    from egot2x.models.lam import LAMBackbone
    from egot2x.nn.talknet import TalkNetModel
    from egot2x.core.checkpoint import restore_tree
    import os

    dev = jax.devices()[0]
    cpu = jax.devices("cpu")[0]
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    def put(x):
        return jax.device_put(jnp.asarray(x, np.float32), dev)

    video = put(rng.standard_normal((B, T, 224, 224, 3)))
    faces = put(rng.uniform(0, 255, (B, T, 112, 112)))
    mfcc = put(rng.standard_normal((B, 4 * T, 13)))
    wave = put(rng.standard_normal((B, T * 16000 // 30)))

    print("| section (b128, folded weights) | ms |", flush=True)

    # int8 trunk (one of two)
    lam = LAMBackbone(dtype=dt, quant=True)
    with jax.default_device(cpu):
        v = lam.init(jax.random.key(0), jnp.zeros((1, 2, 224, 224, 3)),
                     middle=True)
    # borrow calibrated quant scales shape via a dummy positive scale
    v = jax.device_put(v, dev)
    v = jax.tree_util.tree_map(lambda x: x, dict(v))
    if "quant" in v:
        v["quant"] = jax.tree_util.tree_map(
            lambda x: jnp.full_like(x, 3.0), v["quant"])
    t_tr = bench("resnet18 trunk int8 (one of two)",
                 lambda x: lam.apply(v, x, middle=True), (video,))

    # TalkNet full (packed stem + int8 AVSR)
    asd = TalkNetModel(dtype=dt, quant=True)
    with jax.default_device(cpu):
        va = asd.init(jax.random.key(0), jnp.zeros((1, 8, 13)),
                      jnp.zeros((1, 2, 112, 112)), train=False)
    va = jax.device_put(dict(va), dev)
    if "quant" in va:
        va["quant"] = jax.tree_util.tree_map(
            lambda x: jnp.full_like(x, 3.0), va["quant"])
    t_tk = bench("TalkNet AV (packed stem, int8 AVSR)",
                 lambda m, f: asd.apply(va, m, f, train=False)[0],
                 (mfcc, faces))

    print(f"sum(2*trunk + talknet) = {(2 * t_tr + t_tk) * 1e3:.1f} ms; "
          f"full graph at 561 clips/s = {B / 561 * 1e3:.1f} ms",
          file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
