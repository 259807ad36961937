"""Optimizer and LR-schedule factory (optax).

Covers the reference's optimizer surface:
  * HHI — plain ``Adam(lr)`` (HHI/tasks/lam/video_task.py:51).
  * HOI — ``construct_optimizer`` with BN/non-BN weight-decay groups and
    sgd/adam/adamw (HOI/optimizers/lta/optimizer.py:15-73), LR policies
    cosine / constant / cosine_warmup / steps_with_relative_lrs
    (HOI/optimizers/lta/lr_policy.py, lr_scheduler.py:11-48).

BN-parameter exclusion from weight decay is expressed with
``optax.masked`` over a path predicate instead of torch param groups.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import optax


def lr_schedule(
    policy: str,
    base_lr: float,
    total_steps: int,
    warmup_steps: int = 0,
    warmup_start_lr: float = 0.0,
    steps: Optional[Sequence[int]] = None,
    lrs: Optional[Sequence[float]] = None,
    cosine_end_lr: float = 0.0,
):
    """Build an optax schedule mirroring the reference lr_policy names."""
    if policy == "constant":
        sched = optax.constant_schedule(base_lr)
    elif policy == "cosine":
        sched = optax.cosine_decay_schedule(
            base_lr, max(total_steps, 1), alpha=cosine_end_lr / max(base_lr, 1e-12)
        )
    elif policy in ("cosine_warmup", "warmup_cosine"):
        sched = optax.warmup_cosine_decay_schedule(
            init_value=warmup_start_lr,
            peak_value=base_lr,
            warmup_steps=max(warmup_steps, 1),
            decay_steps=max(total_steps, warmup_steps + 1),
            end_value=cosine_end_lr,
        )
    elif policy == "steps_with_relative_lrs":
        assert steps is not None and lrs is not None
        # piecewise constant: lr = lrs[i] for step in [steps[i], steps[i+1]).
        # The reference returns cfg.SOLVER.LRS[ind] DIRECTLY — no base_lr
        # factor (HOI/optimizers/lta/lr_policy.py:43); ADVICE r1 #4.
        scales = {int(s): float(lrs[i + 1] / lrs[i]) for i, s in enumerate(steps[1:])}
        sched = optax.piecewise_constant_schedule(float(lrs[0]), scales)
    else:
        raise ValueError(f"Unknown lr policy {policy!r}")
    return sched


def _norm_bias_mask(params: Any, decay_on: bool) -> Any:
    """Mask tree: True on leaves that should receive weight decay
    (excludes BN scale/bias and all 1-D leaves, matching the reference's
    BN/non-BN split, HOI/optimizers/lta/optimizer.py:21-38)."""

    def leaf_mask(path, leaf):
        is_norm_or_bias = leaf.ndim <= 1
        return (not is_norm_or_bias) if decay_on else is_norm_or_bias

    return jax.tree_util.tree_map_with_path(leaf_mask, params)


def construct_optimizer(
    params: Any,
    method: str = "adam",
    lr: float | optax.Schedule = 1e-4,
    weight_decay: float = 0.0,
    momentum: float = 0.9,
    nesterov: bool = True,
    dampening: float = 0.0,
    grad_clip: Optional[float] = None,
) -> optax.GradientTransformation:
    """Build the optimizer with BN/bias weight-decay exclusion."""
    if method == "sgd":
        base = optax.sgd(lr, momentum=momentum, nesterov=nesterov)
        wd = weight_decay
    elif method == "adam":
        base = optax.adam(lr)
        wd = weight_decay
    elif method == "adamw":
        # decoupled decay, excluded for norm/bias leaves
        base = optax.adamw(
            lr,
            weight_decay=weight_decay,
            mask=lambda p: _norm_bias_mask(p, decay_on=True),
        )
        wd = 0.0
    else:
        raise NotImplementedError(f"optimizer {method!r}")

    chain = []
    if grad_clip:
        chain.append(optax.clip_by_global_norm(grad_clip))
    if wd and method != "adamw":
        chain.append(
            optax.masked(
                optax.add_decayed_weights(wd),
                lambda p: _norm_bias_mask(p, decay_on=True),
            )
        )
    chain.append(base)
    return optax.chain(*chain) if len(chain) > 1 else chain[0]
