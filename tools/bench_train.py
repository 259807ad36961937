"""Training-step throughput for the flagship EgoT2-s TTM 3-task translator.

Measures the full jitted train step — forward through the three frozen
Stage-I backbones, weighted-CE loss, backward + Adam update on the
translator — in clips/s/chip on one device. Because the backbones are
frozen (structural split, egot2x/train/state.py split_params), their
backward pass is dead code: XLA's DCE removes it, so a training step
costs roughly one bf16 forward plus the (tiny) translator backward.
This is the Stage-II training regime of the reference
(HHI/scripts/run_ttm.py --two_loader) where only the fusion transformer
learns.

Feed is the float training path (normalized f32 frames): the norm-folded
uint8 stems are a deployment-inference design; under training the fold
kernels pin gradients to the explicit-normalize float path.

Usage:  PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_train.py
Env:    BATCH (default 64), T (default 30), N_ITER (default 10),
        NOFREEZE=1 trains the backbones too (full backward — the
        reference Stage-I/full-finetune regime; needs smaller BATCH),
        QUANT=1 runs the frozen trunks in int8 static-PTQ (scales
        calibrated on the feed batch; frozen regime only)
Prints one JSON line: train clips/s/chip + steps/s.
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

    from egot2x.core.config import Config
    from egot2x.tasks.ttm_2loader import TalkingToMe2Loader

    batch = int(os.environ.get("BATCH", "64"))
    t = int(os.environ.get("T", "30"))
    n_iter = int(os.environ.get("N_ITER", "10"))
    nofreeze = bool(int(os.environ.get("NOFREEZE", "0")))
    remat = bool(int(os.environ.get("REMAT", "0")))
    quant = bool(int(os.environ.get("QUANT", "0")))

    cfg = Config(
        data_root="/nonexistent",  # loaders are never constructed
        model="TaskFusionMFTransformer3Task",
        weights=[0.266, 0.734], lr=1e-4, wd=1e-4, batch_size=batch,
        num_workers=0, img_size=224, seed=0, hidden_dim=128, num_layers=1,
        num_heads=4, dropout=0.5, nofreeze=nofreeze, remat=remat,
        quant_trunks=quant, compute_dtype="bf16",
        lam_checkpoint=None, ttm_checkpoint=None, asd_checkpoint=None,
    )
    task = TalkingToMe2Loader(cfg)

    # init on CPU at batch 1 (params are batch-independent; a full-batch
    # on-device init would pay minutes of remote compile — bench.py ditto)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        state = task.build_state(jax.random.key(0))
    dev = jax.devices()[0]
    state = jax.device_put(state, dev)

    rng = np.random.default_rng(0)
    feed = {
        "frames": jnp.asarray(
            rng.standard_normal((batch, t, 224, 224, 3)), jnp.float32),
        "video_asd": jnp.asarray(
            rng.standard_normal((batch, t, 112, 112)), jnp.float32),
        "audio": jnp.asarray(
            rng.standard_normal((batch, t * 16000 // 30)), jnp.float32),
        "audio_asd": jnp.asarray(
            rng.standard_normal((batch, 4 * t, 13)), jnp.float32),
        "label": jnp.asarray(rng.integers(0, 2, (batch,)), jnp.int32),
    }
    feed = jax.device_put(feed, dev)

    if quant:
        # one float pass captures the int8 activation scales (the
        # Trainer does this on the first real batch; here the feed
        # batch is the calibration batch)
        state = task.calibrate_state(state, feed)
        print("calibrated int8 scales", file=sys.stderr)

    step = jax.jit(task.train_step, donate_argnums=0)
    keys = [jax.random.key(i) for i in range(n_iter + 1)]
    state, metrics = step(state, feed, keys[0])
    _ = np.asarray(metrics["loss"])  # force compile + first run
    print("compiled; first loss", float(metrics["loss"]), file=sys.stderr)

    t0 = time.perf_counter()
    for i in range(n_iter):
        state, metrics = step(state, feed, keys[i + 1])
    _ = np.asarray(metrics["loss"])  # completion barrier (tunnel runtime)
    dt = time.perf_counter() - t0

    clips = batch * n_iter / dt
    print(json.dumps({
        "metric": "egot2s_ttm_3task_train_clips_per_sec",
        "value": round(clips, 2),
        "unit": "clips/s/chip",
        "steps_per_sec": round(n_iter / dt, 3),
        "config": (f"bf16 train step, "
                   + (("FULL backward (nofreeze"
                       + (", remat trunks" if remat else "") + ")")
                      if nofreeze else
                      ("int8 frozen trunks (backward DCE'd)" if quant else
                       "frozen backbones (backward DCE'd)"))
                   + f", Adam, batch {batch}, T={t}"),
    }))


if __name__ == "__main__":
    main()
