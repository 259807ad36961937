"""Shared timing helper for the tools/exp_*.py TPU experiments.

The scalar fetch (``np.asarray(...[0])``) before AND after the loop is
load-bearing on the axon tunnel runtime: ``block_until_ready`` has been
observed to return before execution completes there, so a host fetch is
the only reliable completion barrier (see docs/PROFILE.md preamble).
"""

import os
import time

import numpy as np


def enable_compile_cache(subdir="xla"):
    """Persistent XLA compilation cache (verified working on axon:
    1.5 s -> 0.07 s on a probe graph). Shared by bench.py and the
    exp tools so re-runs skip the ~10 min remote compile."""
    import jax

    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache", subdir)
    os.makedirs(root, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", root)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


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
