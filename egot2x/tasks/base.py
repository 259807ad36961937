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

    # batch shardability: the Trainer sets this to its mesh data-axis
    # size before building loaders, so every batch's leading dim is a
    # multiple of the data axis (bucketed loaders round/pad to it).
    # Manual-step use (tests, scripts) keeps 1 — no batch reshaping.
    batch_divisor: int = 1

    def shardable_batch(self, batch_size: int) -> int:
        """Round a configured batch size UP to a multiple of the mesh
        data-axis size (no-op at the default divisor 1)."""
        d = self.batch_divisor
        return max(d, ((int(batch_size) + d - 1) // d) * d)

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

    def calibrate_state(self, state: TrainState, batch) -> TrainState:
        """One float calibration forward on ``batch``, capturing int8
        activation scales into ``state.quant`` (static PTQ — see
        egot2x.nn.quant). Requires the task to define ``_model_inputs``
        and the model to accept ``calibrate=``; the Trainer calls this
        once before the first step when the state carries uncalibrated
        quant scales."""

        @jax.jit
        def _cal(variables, *xs):
            return self.model.apply(variables, *xs, train=False,
                                    calibrate=True, mutable=["quant"])

        _, mutated = _cal(state.variables(), *self._model_inputs(batch))
        return state.replace(quant=mutated["quant"])

    # -- validation aggregation (host side) -------------------------------
    def start_validation(self) -> Any:
        """Create an aggregation context (reference PostProcessor)."""
        return []

    def accumulate(self, ctx: Any, outputs: Dict[str, Any], batch: Dict[str, Any]) -> None:
        ctx.append((outputs, batch))

    def finalize_validation(self, ctx: Any) -> Dict[str, float]:
        raise NotImplementedError

    def merge_validation(self, ctxs) -> Any:
        """Multi-host: merge the per-process validation contexts into
        ONE global context before ``finalize_validation``, so AP/ED-type
        metrics are computed once over all samples — the reference
        gathers raw predictions, not per-rank metric averages
        (HHI/utils/lam/utils.py:61-80 CSV merge,
        HOI/evaluation/lta/lta_metrics.py:23-84 all_gather).

        The default leaf-wise merge (counters sum, per-sample lists /
        arrays concatenate, sets union, dicts merge recursively by key
        union) is exact for every record-style context; tasks whose
        contexts hold uid-keyed maps with overwrite semantics (AR
        clip-ensembling labels, TTM segment spans) override this.
        """
        return merge_contexts(ctxs)


def merge_contexts(ctxs):
    """Generic leaf-wise merge of per-process validation contexts.

    Rules: numeric scalars SUM (counter semantics), lists concatenate,
    sets union, 1-d+ arrays concatenate along axis 0, 0-d arrays sum,
    dicts (incl. defaultdicts) merge recursively over the key union —
    so a uid-keyed ``defaultdict(list)`` accumulates every process's
    per-sample records and a ``defaultdict(float)`` sums ensembled
    logits. Strings/bools/None take the first value.
    """
    import numpy as np
    from collections import defaultdict

    first = ctxs[0]
    if len(ctxs) == 1:
        return first
    if isinstance(first, dict):
        out = (defaultdict(first.default_factory)
               if isinstance(first, defaultdict) else type(first)())
        keys = []
        for c in ctxs:
            for k in c.keys():
                if k not in keys:
                    keys.append(k)
        for k in keys:
            out[k] = merge_contexts([c[k] for c in ctxs if k in c])
        return out
    if isinstance(first, (bool, str)) or first is None:
        return first
    if isinstance(first, (int, float, np.integer, np.floating)):
        return type(first)(sum(ctxs))
    if isinstance(first, list):
        return [x for c in ctxs for x in c]
    if isinstance(first, set):
        return set().union(*ctxs)
    if isinstance(first, np.ndarray):
        if first.ndim == 0:
            return np.asarray(sum(ctxs))
        return np.concatenate(ctxs, axis=0)
    return first
