"""Task protocol — the egot2x analogue of the reference's
LightningModule task layer (SURVEY.md §1 Task layer).

A Task owns: the model, its loss, train/eval step *functions* (pure,
jit-compiled by the Trainer), dataloaders, and validation aggregation.
Unlike Lightning's stateful modules, steps here are pure functions of
(TrainState, batch, rng) so the Trainer can jit/shard/donate them.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax

from egot2x.train.state import TrainState


def resolve_dtype(cfg):
    """cfg.compute_dtype ∈ {float32, bf16/bfloat16} → jnp dtype (bf16
    activations on the MXU with f32 params/stats)."""
    import jax.numpy as jnp

    name = str(cfg.get("compute_dtype", "float32")).lower()
    return {"bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16}.get(name, jnp.float32)


class Task:
    # name of the metric used for checkpoint selection and whether
    # higher is better (reference: task.checkpoint_metric + ckpt mode)
    checkpoint_metric: str = "val_loss"
    checkpoint_mode: str = "min"

    def build_state(self, rng: jax.Array) -> TrainState:
        raise NotImplementedError

    def train_step(self, state: TrainState, batch: Dict[str, Any], rng: jax.Array
                   ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        """Pure function — jitted by the Trainer."""
        raise NotImplementedError

    def eval_step(self, state: TrainState, batch: Dict[str, Any]) -> Dict[str, Any]:
        """Pure function returning device outputs for aggregation."""
        raise NotImplementedError

    def train_loader(self):
        raise NotImplementedError

    def val_loader(self):
        raise NotImplementedError

    def bn_forward_args(self, batch):
        """Positional model-apply args for a precise-BN forward on this
        batch (reference BN.USE_PRECISE_STATS). None → the task does not
        support precise BN and the Trainer hook is a no-op."""
        return None

    # -- validation aggregation (host side) -------------------------------
    def start_validation(self) -> Any:
        """Create an aggregation context (reference PostProcessor)."""
        return []

    def accumulate(self, ctx: Any, outputs: Dict[str, Any], batch: Dict[str, Any]) -> None:
        ctx.append((outputs, batch))

    def finalize_validation(self, ctx: Any) -> Dict[str, float]:
        raise NotImplementedError
