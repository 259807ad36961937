"""Experiment: int8 requant chaining + batch scaling.

Current QuantConv dequantizes each conv's int32 acc to bf16, applies
BN+relu, then the next conv re-quantizes — two full activation
round-trips through HBM per conv. Chained requant keeps activations
int8 between convs: acc -> per-channel scale (BN folded) -> relu ->
divide by the next conv's static act scale -> clamp int8. Measures a
4-conv chain (stage-1 geometry) both ways, plus the full flagship fwd
at batch 128.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_requant.py
"""

import time

import numpy as np

B, T = 64, 30


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
    print(f"| {name} | {dt*1e3:8.2f} |", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    def put(x, d=np.float32):
        return jax.device_put(jnp.asarray(x, d), dev)

    n_frames = B * T
    act = put(np.abs(rng.standard_normal((n_frames, 56, 56, 64))))
    ws = [np.clip(np.round(rng.standard_normal((3, 3, 64, 64)) * 30), -127,
                  127).astype(np.int8) for _ in range(4)]
    wj = [jax.device_put(jnp.asarray(w), dev) for w in ws]
    dn = ("NHWC", "HWIO", "NHWC")

    def conv_i8(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
            preferred_element_type=jnp.int32)

    # A: shipped scheme — bf16 between convs (quantize+conv+dequant x4)
    def shipped(x):
        s_act = jnp.float32(3.0 / 127.0)
        for w in wj:
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_act),
                          -127, 127).astype(jnp.int8)
            acc = conv_i8(xq, w)
            x = jnp.maximum(acc.astype(jnp.float32) * 2e-4, 0.0).astype(dt)
        return x

    # B: chained requant — int8 stays int8 between convs
    def chained(x):
        s_act = jnp.float32(3.0 / 127.0)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_act),
                      -127, 127).astype(jnp.int8)
        m = jnp.float32(2e-4 / (3.0 / 127.0))  # combined scale -> next int8
        for w in wj:
            acc = conv_i8(xq, w)
            xq = jnp.clip(jnp.round(
                jnp.maximum(acc, 0).astype(jnp.float32) * m),
                -127, 127).astype(jnp.int8)
        return xq

    print("| section | ms |", flush=True)
    bench("stage1 4conv int8, bf16 between (shipped)", shipped, (act,))
    bench("stage1 4conv int8, chained requant", chained, (act,))

    # C: full flagship forward at batch 128 (vs 139.1 ms at 64)
    from egot2x.core.registry import build_model
    from egot2x.core.checkpoint import restore_tree
    import egot2x.translate.egot2s_hhi  # noqa: F401
    import os

    model = build_model("TaskFusionMFTransformer3Task", hidden_dim=128,
                        num_layers=1, quant=True, dtype=dt)
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache", "variables_int8")
    if not os.path.isdir(cache):
        print("no bench cache; skipping batch-128 test", flush=True)
        return
    variables = jax.device_put(dict(restore_tree(cache)), dev)
    BB = 128
    inputs = (
        put(rng.standard_normal((BB, T, 224, 224, 3))),
        put(rng.uniform(0, 255, (BB, T, 112, 112))),
        put(rng.standard_normal((BB, T * 16000 // 30))),
        put(rng.standard_normal((BB, 4 * T, 13))),
    )

    def fwd(video, video_asd, audio, audio_asd):
        return model.apply(variables, video, video_asd, audio, audio_asd,
                           train=False)

    d = bench("flagship fwd batch128", fwd, inputs, n=6)
    print(f"  -> {BB / d:.1f} clips/s", flush=True)


if __name__ == "__main__":
    main()
