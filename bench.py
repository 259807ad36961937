"""Benchmark harness: prints ONE JSON line with the headline metric.

Headline (BASELINE.json north star): EgoT2-s TTM inference clips/sec per
chip. Until the translator lands, benches the LAM BaselineLSTM forward
(the dominant-FLOP component of the translator stack).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from egot2x.core.registry import build_model
    import egot2x.models.lam  # noqa: F401

    batch = 32
    model = build_model("BaselineLSTM", dtype=jnp.bfloat16)
    clip = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, 7, 224, 224, 3)),
        dtype=jnp.float32,
    )
    variables = model.init(jax.random.key(0), clip, train=False)

    @jax.jit
    def fwd(video):
        return model.apply(variables, video, train=False)

    fwd(clip).block_until_ready()  # compile
    n_iter = 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fwd(clip)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    clips_per_sec = batch * n_iter / dt

    # vs_baseline: north-star reference is 5x A100-PyTorch for the TTM
    # translator; no published baseline exists for this interim metric,
    # report ratio vs a nominal 1000 clips/s A100 estimate.
    print(json.dumps({
        "metric": "lam_baselinelstm_fwd_clips_per_sec",
        "value": round(clips_per_sec, 2),
        "unit": "clips/s/chip",
        "vs_baseline": round(clips_per_sec / 1000.0, 3),
    }))


if __name__ == "__main__":
    main()
