"""Shared timing helper for the tools/exp_*.py TPU experiments.

The scalar fetch (``np.asarray(...[0])``) before AND after the loop is
load-bearing on the axon tunnel runtime: ``block_until_ready`` has been
observed to return before execution completes there, so a host fetch is
the only reliable completion barrier (see docs/PROFILE.md preamble).
"""

import time

import numpy as np


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
