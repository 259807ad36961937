"""HOI inference throughput: the ts_pnr EgoT2-s 3-task translator.

Reference workload (HOI/configs/pnr/ts_pnr.yaml): frozen PNR + OSCC
ResNet3D backbones on 16×225² raw-pixel frames plus the frozen AR
SlowFast (32-frame fast / 8-frame slow at α=4, 224²), fused by the
128-d 6-layer translator. The HOI trunks are the heaviest FLOPs/clip
in the framework (~3.3 TFLOP/clip vs ~0.22 for the HHI flagship).

Usage:  python tools/bench_hoi.py
Env:    BATCH (default 8), N_ITER (default 10), QUANT (1=int8 PTQ
        stage convs — default — 0=bf16), LAYERS (default 6)
Prints one JSON line: ts_pnr inference clips/s/chip.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from _exp_util import enable_compile_cache

    enable_compile_cache()

    from egot2x.core.registry import build_model
    import egot2x.translate.egot2s_hoi  # noqa: F401

    batch = int(os.environ.get("BATCH", "8"))
    n_iter = int(os.environ.get("N_ITER", "10"))
    quant = bool(int(os.environ.get("QUANT", "1")))
    layers = int(os.environ.get("LAYERS", "6"))

    model = build_model(
        "TaskFusionMFTransformer3TaskDropout", target="keyframe",
        feature_dim=128, num_layers=layers, crop_size=225, alpha=4,
        beta_inv=8, quant=quant, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.uniform(0, 255, (batch, 16, 225, 225, 3)), jnp.float32)
    pathways = [
        jnp.asarray(rng.standard_normal((batch, 8, 224, 224, 3)),
                    jnp.float32),
        jnp.asarray(rng.standard_normal((batch, 32, 224, 224, 3)),
                    jnp.float32),
    ]

    # init on CPU at batch 1 (params batch-independent; bench.py ditto),
    # cache variables + calibrated scales for driver re-runs
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache",
        f"hoi_ts_pnr_{'int8' if quant else 'bf16'}_l{layers}")
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        f1 = jax.device_put(np.zeros((1,) + frames.shape[1:], np.float32), cpu)
        p1 = [jax.device_put(np.zeros((1,) + p.shape[1:], np.float32), cpu)
              for p in pathways]
        fresh = model.init(jax.random.key(0), f1, p1, train=False)

    def signature(tree):
        import flax.core

        leaves, treedef = jax.tree_util.tree_flatten(
            flax.core.unfreeze(dict(tree)))
        return treedef, [np.shape(leaf) for leaf in leaves]

    variables = None
    if os.path.isdir(cache):
        try:
            from egot2x.core.checkpoint import restore_tree

            cached = restore_tree(cache)
            if signature(cached) == signature(fresh):
                variables = cached
        except Exception:
            variables = None
    calibrated = variables is not None and (not quant or (
        "quant" in variables and all(
            float(s) > 0
            for s in jax.tree_util.tree_leaves(variables["quant"]))))
    if variables is None:
        variables = fresh
    dev = jax.devices()[0]
    variables = jax.device_put(dict(variables), dev)
    frames = jax.device_put(frames, dev)
    pathways = jax.device_put(pathways, dev)
    if quant and not calibrated:
        from egot2x.nn.quant import calibrate_variables

        print("calibrating int8 activation scales...", file=sys.stderr)
        variables = calibrate_variables(model, variables, frames, pathways,
                                        train=False)
        try:
            from egot2x.core.checkpoint import save_tree

            save_tree(cache, jax.device_get(variables))
        except Exception:
            pass
    print("init done", file=sys.stderr)

    # variables ride as an ARGUMENT, not a closure: the HOI trunks are
    # hundreds of MB and constant-folding them serializes the weights
    # into the remote-compile request (HTTP 413 on the tunnel)
    @jax.jit
    def fwd(v, fr, pw):
        return model.apply(v, fr, pw, train=False)

    out = fwd(variables, frames, pathways)
    _ = np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fwd(variables, frames, pathways)
    _ = np.asarray(out)  # completion barrier (tunnel runtime)
    dt = time.perf_counter() - t0
    clips = batch * n_iter / dt
    print(json.dumps({
        "metric": "egot2s_ts_pnr_3task_infer_clips_per_sec",
        "value": round(clips, 2),
        "unit": "clips/s/chip",
        "ms_per_batch": round(dt / n_iter * 1000, 2),
        "config": (("int8 static-PTQ" if quant else "bf16")
                   + f" HOI trunks, 128-d {layers}-layer translator, "
                   f"batch {batch}"),
    }))


if __name__ == "__main__":
    main()
