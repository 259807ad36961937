"""Per-module profile of the bench graph (VERDICT round-1 item #2 step 1).

Times each component of the EgoT2-s TTM 3-task flagship at the bench
shapes (BATCH=32, T=30) on the real chip, and reports ms/batch, FLOPs
from XLA cost_analysis, and achieved TFLOP/s so the MXU-bound sections
are visible. Writes docs/PROFILE.md-ready lines to stdout (stderr for
progress).

Run: python tools/profile_bench.py  (TPU; first compiles ~1-3 min each)
"""

import sys
import time

import numpy as np

T = 30
BATCH = 32
IMG = 224
SR = 16000


def bench_fn(name, fn, args, n_iter=10):
    import jax

    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    out = jfn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = jfn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iter
    try:
        cost = jfn.lower(*args).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
    except Exception:
        flops = 0.0
    tflops = flops / dt / 1e12
    print(f"| {name} | {dt * 1e3:8.2f} | {flops / 1e9:8.1f} | {tflops:6.1f} |",
          flush=True)
    print(f"done {name}: {dt*1e3:.2f} ms compile={compile_s:.0f}s",
          file=sys.stderr, flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from egot2x.models.lam import LAMBackbone
    from egot2x.nn.talknet import TalkNetModel
    from egot2x.nn.common import TransformerEncoder

    rng = np.random.default_rng(0)
    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    dt = jnp.bfloat16

    def put(x):
        return jax.device_put(jnp.asarray(x, jnp.float32), dev)

    video = put(rng.standard_normal((BATCH, T, IMG, IMG, 3)))
    video_asd = put(rng.uniform(0, 255, (BATCH, T, 112, 112)))
    audio_asd = put(rng.standard_normal((BATCH, 4 * T, 13)))
    tokens = put(rng.standard_normal((BATCH, 3 * T + T, 128)))

    print("| section | ms/batch | GFLOP | TFLOP/s |")
    print("|---|---|---|---|")

    # 1. One frozen resnet18 trunk over B*T frames (LAM; TTM-video is
    #    the identical graph with different weights).
    lam = LAMBackbone(dtype=dt)
    with jax.default_device(cpu):
        lam_v = lam.init(jax.random.key(0), jnp.zeros((1, 2, IMG, IMG, 3)),
                         middle=True)
    lam_v = jax.device_put(lam_v, dev)
    t_lam = bench_fn("resnet18 trunk (one of two)",
                     lambda v: lam.apply(lam_v, v, middle=True), (video,))

    # 2. Frozen TalkNet AV stream.
    asd = TalkNetModel(dtype=dt)
    with jax.default_device(cpu):
        asd_v = asd.init(jax.random.key(0), jnp.zeros((1, 8, 13)),
                         jnp.zeros((1, 2, 112, 112)), train=False)
    asd_v = jax.device_put(asd_v, dev)
    t_asd = bench_fn(
        "TalkNet AV",
        lambda a, v: asd.apply(asd_v, a, v, train=False)[0],
        (audio_asd, video_asd))

    # 3. Translator core transformer (128-d, 1 layer, 120 tokens).
    enc = TransformerEncoder(num_layers=1, d_model=128, num_heads=4,
                             dim_feedforward=2048, dropout=0.1, dtype=dt)
    with jax.default_device(cpu):
        enc_v = enc.init(jax.random.key(0), jnp.zeros((1, 4, 128)),
                         deterministic=True)
    enc_v = jax.device_put(enc_v, dev)
    t_core = bench_fn("translator encoder",
                      lambda x: enc.apply(enc_v, x, deterministic=True),
                      (tokens,))

    total = 2 * t_lam + t_asd + t_core
    print(f"\nsum(2*trunk + talknet + core) = {total * 1e3:.2f} ms "
          f"-> {BATCH / total:.1f} clips/s upper bound", flush=True)


if __name__ == "__main__":
    main()
