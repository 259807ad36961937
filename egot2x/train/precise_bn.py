"""Precise-BN: recompute BatchNorm running statistics post-training.

Behavioral reference: HOI/utils/lta/misc.py:135-192 (fvcore
``update_bn_stats`` over NUM_BATCHES_PRECISE=200 batches, incl. the
2-loader variant) and ``SubBatchNorm3d.aggregate_stats``
(HOI/models/lta/batchnorm_helper.py:40-111).

JAX-native: run the model in train mode (mutable batch_stats) over N
batches and average the *batch* statistics directly — the flax BN
momentum EMA is bypassed by accumulating true means/vars, which is what
fvcore's precise BN computes. Under pjit the batch is global, so the
statistics are already cross-replica exact (no NaiveSyncBatchNorm
machinery needed — SURVEY.md §2.8).
"""

from __future__ import annotations

from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np


def compute_precise_bn_stats(
    apply_fn: Callable,
    variables: dict,
    batches: Iterable,
    forward_kwargs: dict | None = None,
    num_batches: int = 200,
):
    """Return a new batch_stats tree with exact means/vars averaged over
    up to ``num_batches`` forward passes in train mode."""
    forward_kwargs = dict(forward_kwargs or {})
    forward_kwargs.setdefault("train", True)

    # jit-compile the forward once — running the conv trunk op-by-op
    # per batch would dispatch thousands of kernels for each of the
    # (reference default 200) precise-BN batches
    @jax.jit
    def _fwd(vs, *batch_args):
        return apply_fn(vs, *batch_args, mutable=["batch_stats"],
                        **forward_kwargs)

    sums = None
    n = 0
    for i, batch_args in enumerate(batches):
        if i >= num_batches:
            break
        if not isinstance(batch_args, (tuple, list)):
            batch_args = (batch_args,)
        _, mutated = _fwd(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            *batch_args,
        )
        # flax BN writes ema; recover this batch's stats from the ema
        # update: new = m*old + (1-m)*batch  ⇒ batch = (new - m*old)/(1-m)
        m = 0.9
        batch_stats = jax.tree_util.tree_map(
            lambda new, old: (new - m * old) / (1.0 - m),
            mutated["batch_stats"], variables["batch_stats"],
        )
        if sums is None:
            sums = batch_stats
        else:
            sums = jax.tree_util.tree_map(jnp.add, sums, batch_stats)
        n += 1
    if n == 0:
        return variables["batch_stats"]
    return jax.tree_util.tree_map(lambda s: s / n, sums)


def aggregate_sub_batch_stats(means: np.ndarray, vars_: np.ndarray):
    """SubBatchNorm aggregate: combine per-split (mean, var) into global
    stats (batchnorm_helper.py:62-83): var = E[v_i] + E[(m_i - m)^2]."""
    mean = means.mean(axis=0)
    var = vars_.mean(axis=0) + ((means - mean) ** 2).mean(axis=0)
    return mean, var
