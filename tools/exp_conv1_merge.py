"""Experiment: merge the LAM+TTM conv1 into one C_out=128 conv.

Both trunks read the SAME video frames, so their stems are one conv
with concatenated filters — C_out 64 -> 128 fills the MXU lanes with no
extra FLOPs. Measures 2x separate conv1(+pool) vs merged conv1(+pool).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_conv1_merge.py
"""

import time

import numpy as np

B, T = 128, 30
NEG = -1e30


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

    dev = jax.devices()[0]
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    video = jax.device_put(
        jnp.asarray(rng.standard_normal((B * T, 224, 224, 3)), jnp.float32),
        dev)
    k1 = jnp.asarray(rng.standard_normal((7, 7, 3, 64)) * 0.05, dt)
    k2 = jnp.asarray(rng.standard_normal((7, 7, 3, 64)) * 0.05, dt)
    k12 = jnp.concatenate([k1, k2], axis=-1)
    dn = ("NHWC", "HWIO", "NHWC")

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x.astype(dt), k, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=dn)

    def pool(y):
        return jax.lax.reduce_window(
            y, jnp.asarray(NEG, y.dtype), jax.lax.max, (1, 3, 3, 1),
            (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])

    print("| section | ms |", flush=True)
    bench("2x conv1 F=64 + pool (separate trunks)",
          lambda x: (pool(jnp.maximum(conv(x, k1), 0)),
                     pool(jnp.maximum(conv(x, k2), 0))), (video,))
    # merged at full batch OOMs (12.3 GB pre-pool map); chunk the batch
    # so each chunk's intermediate matches the separate version's peak
    def merged_chunked(x, n_chunks=2):
        outs = []
        for c in jnp.split(x, n_chunks, axis=0):
            outs.append(pool(jnp.maximum(conv(c, k12), 0)))
        return jnp.concatenate(outs, axis=0)

    bench("1x conv1 F=128 + pool (merged, 2 chunks)", merged_chunked,
          (video,))


if __name__ == "__main__":
    main()
