"""Train state: trainable/frozen parameter split + BN statistics.

The reference freezes Stage-I backbones with ``requires_grad=False`` and
``.eval()`` (HHI/models/multitask/task_prompt_model.py:96-111) while its
Adam still iterates *all* parameters (HHI/tasks/ttm/video_task.py:65).
The JAX-native design makes the split structural: ``params`` holds only
trainable leaves, ``frozen`` holds stop-gradiented backbone weights, and
the optimizer state covers exactly ``params`` (fixing the reference's
subtle all-params-Adam behavior, SURVEY.md §7 hard parts).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    frozen: Any  # frozen param subtree(s); {} when nothing is frozen
    batch_stats: Any  # BN running stats; {} for BN-free models
    opt_state: Any
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    # int8 static-PTQ activation scales (egot2x.nn.quant ``quant``
    # collection); {} for float models. Stage-II training may run the
    # FROZEN trunks in int8 (their forward is the bulk of the step and
    # no gradient flows into them), so the scales ride in the state
    # like batch_stats — non-trainable, checkpointed, replicated.
    quant: Any = struct.field(default_factory=dict)
    # Debug capture of the last step's raw gradients (the reference's
    # LOG_GRADIENT_PERIOD hook, HOI/tasks/lta/video_task.py:112-125).
    # None = off (no cost). The Trainer enables it by seeding a
    # params-shaped tree (``Trainer(log_gradient_period=N)``); the
    # structure check is static under jit, and the cost when on is one
    # extra params-sized HBM buffer carried in the state.
    grad_stats: Any = None

    def variables(self) -> Dict[str, Any]:
        """Assemble the flax variables dict for apply()."""
        params = self.params
        if self.frozen:
            params = merge_trees(self.frozen, params)
        out = {"params": params}
        if self.batch_stats:
            out["batch_stats"] = self.batch_stats
        if self.quant:
            out["quant"] = self.quant
        return out

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_stats = grads if self.grad_stats is not None else None
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state, grad_stats=new_stats)

    @classmethod
    def create(cls, apply_fn, params, tx, frozen=None, batch_stats=None,
               quant=None):
        import jax.numpy as jnp

        return cls(
            step=jnp.zeros((), dtype=jnp.int32),
            params=params,
            frozen=frozen or {},
            batch_stats=batch_stats or {},
            opt_state=tx.init(params),
            apply_fn=apply_fn,
            tx=tx,
            quant=quant or {},
        )


def merge_trees(base: Any, overlay: Any) -> Any:
    """Recursively merge two nested param dicts (overlay wins on leaves)."""
    if isinstance(base, (dict, FrozenDict)) and isinstance(overlay, (dict, FrozenDict)):
        out = dict(base)
        for k, v in overlay.items():
            out[k] = merge_trees(base[k], v) if k in base else v
        return out
    return overlay


def split_params(params: Any, is_frozen: Callable[[str], bool]):
    """Split a top-level params dict into (trainable, frozen) by key
    predicate — the structural analogue of requires_grad=False."""
    trainable, frozen = {}, {}
    for k, v in params.items():
        (frozen if is_frozen(k) else trainable)[k] = v
    return trainable, frozen
