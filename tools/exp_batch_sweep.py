"""Round-3: batch sweep at the int8-before-pool operating point.

b256 OOM'd in round 2; the int8 stem pools cut peak activation memory,
so probe 128/160/192 (652/663/649). After block chaining: 699/679/693
at 160/192/256 — b256 fits now but 160 stays the operating point.
Reuses bench.py's cached calibrated variables.

Run: python tools/exp_batch_sweep.py   (TPU, idle host)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T, IMG, SR = 30, 224, 16000


def main():
    import jax
    import jax.numpy as jnp

    from egot2x.core.checkpoint import restore_tree
    from egot2x.core.registry import build_model
    from egot2x.nn.quant import assert_calibrated
    import egot2x.translate.egot2s_hhi  # noqa: F401

    from _exp_util import enable_compile_cache

    enable_compile_cache()
    fuse = os.environ.get("FUSE", "1") == "1"
    model = build_model("TaskFusionMFTransformer3Task", hidden_dim=128,
                        num_layers=1, quant=True, fuse_stems=fuse,
                        dtype=jnp.bfloat16)
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache", "variables_int8")
    variables = jax.device_put(dict(restore_tree(cache)), jax.devices()[0])
    assert_calibrated(variables)
    rng = np.random.default_rng(0)

    sizes = tuple(int(b) for b in os.environ.get(
        "BATCHES", "128,160,192,224").split(","))
    for batch in sizes:
        inputs = (
            jnp.asarray(rng.standard_normal((batch, T, IMG, IMG, 3)),
                        dtype=jnp.float32),
            jnp.asarray(rng.uniform(0, 255, (batch, T, 112, 112)),
                        dtype=jnp.float32),
            jnp.asarray(rng.standard_normal((batch, T * SR // 30)),
                        dtype=jnp.float32),
            jnp.asarray(rng.standard_normal((batch, 4 * T, 13)),
                        dtype=jnp.float32),
        )

        @jax.jit
        def fwd(video, video_asd, audio, audio_asd):
            return model.apply(variables, video, video_asd, audio,
                               audio_asd, train=False)

        try:
            out = fwd(*inputs)
            _ = np.asarray(out)
            n = 8
            t0 = time.perf_counter()
            for _ in range(n):
                out = fwd(*inputs)
            _ = np.asarray(out)
            dt = time.perf_counter() - t0
            print(f"| batch {batch} | {batch * n / dt:8.1f} clips/s |",
                  flush=True)
        except Exception as e:
            print(f"| batch {batch} | FAILED: {type(e).__name__} |",
                  flush=True)
        del inputs


if __name__ == "__main__":
    main()
