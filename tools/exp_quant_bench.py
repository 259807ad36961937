"""Flagship bench graph with int8 PTQ trunks vs bf16 — TPU timing."""

import time
import sys

import numpy as np

import os

T, IMG, SR = 30, 224, 16000
BATCH = int(os.environ.get("BENCH_BATCH", 32))


def main():
    import jax
    import jax.numpy as jnp

    from egot2x.core.registry import build_model
    from egot2x.nn.quant import calibrate_variables
    import egot2x.translate.egot2s_hhi  # noqa: F401

    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    inputs = (
        jnp.asarray(rng.standard_normal((BATCH, T, IMG, IMG, 3)), jnp.float32),
        jnp.asarray(rng.uniform(0, 255, (BATCH, T, 112, 112)), jnp.float32),
        jnp.asarray(rng.standard_normal((BATCH, T * SR // 30)), jnp.float32),
        jnp.asarray(rng.standard_normal((BATCH, 4 * T, 13)), jnp.float32),
    )
    inputs = jax.device_put(inputs, dev)

    for quant in ((True,) if os.environ.get("QUANT_ONLY") else (False, True)):
        model = build_model("TaskFusionMFTransformer3Task", hidden_dim=128,
                            num_layers=1, quant=quant, dtype=jnp.bfloat16)
        with jax.default_device(cpu):
            zeros = tuple(jnp.zeros(x.shape, x.dtype) for x in
                          jax.device_get(inputs))
            variables = model.init(jax.random.key(0), *zeros, train=False)
        variables = jax.device_put(dict(variables), dev)
        if quant:
            print("calibrating...", file=sys.stderr, flush=True)
            variables = calibrate_variables(model, variables, *inputs,
                                            train=False)

        @jax.jit
        def fwd(v, a, b, c, d):
            return model.apply(v, a, b, c, d, train=False)

        out = fwd(variables, *inputs)
        _ = np.asarray(out.ravel()[0])
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            out = fwd(variables, *inputs)
        _ = np.asarray(out.ravel()[0])
        dt = (time.perf_counter() - t0) / n
        print(f"quant={quant}: {dt*1e3:.2f} ms/batch -> "
              f"{BATCH/dt:.1f} clips/s", flush=True)


if __name__ == "__main__":
    main()
