"""LAM (looking-at-me) task: weighted CE training + mAP validation.

Behavioral reference: HHI/tasks/lam/video_task.py:15-85 — CE loss with
class weights [0.136, 0.864] (HHI/configs/lam/config.py:33), validation
through a PostProcessor that collects softmax scores per (uid, frame,
track) row and computes AVA-style mAP + acc@0.5. The CSV/pandas path is
replaced by in-memory numpy aggregation (egot2x.metrics.map).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from egot2x.core.registry import build_model
from egot2x.data.lam import LamClipDataset
from egot2x.data.pipeline import BatchLoader
from egot2x.metrics.map import run_evaluation
from egot2x.tasks.base import Task, resolve_dtype
from egot2x.train.optim import construct_optimizer
from egot2x.train.state import TrainState

import egot2x.models.lam  # noqa: F401 — register models


def weighted_cross_entropy(logits, labels, weights):
    """CE with per-class weights, torch CrossEntropyLoss semantics:
    mean is weighted by the selected class's weight."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    w = jnp.asarray(weights)[labels]
    return -(w * picked).sum() / w.sum()


class LookingAtMe(Task):
    checkpoint_metric = "val_mAP"
    checkpoint_mode = "max"

    def __init__(self, cfg):
        self.cfg = cfg
        self.model = build_model(cfg.model, dtype=resolve_dtype(cfg))
        self.class_weights = np.asarray(cfg.weights, dtype=np.float32)

    # -- state -------------------------------------------------------------
    def build_state(self, rng: jax.Array) -> TrainState:
        c = self.cfg
        sample = jnp.zeros((1, 7, c.img_size, c.img_size, 3), jnp.float32)
        variables = self.model.init(rng, sample, train=False)
        tx = construct_optimizer(variables["params"], method="adam", lr=c.lr)
        return TrainState.create(
            apply_fn=self.model.apply,
            params=variables["params"],
            tx=tx,
            batch_stats=variables.get("batch_stats", {}),
        )

    # -- steps -------------------------------------------------------------
    def train_step(self, state: TrainState, batch, rng):
        weights = jnp.asarray(self.class_weights)

        def loss_fn(params):
            out, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch["frames"],
                train=True,
                mutable=["batch_stats"],
            )
            loss = weighted_cross_entropy(out, batch["label"], weights)
            return loss, mutated

        (loss, mutated), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads)
        state = state.replace(batch_stats=mutated["batch_stats"])
        return state, {"loss": loss}

    def eval_step(self, state: TrainState, batch):
        logits = state.apply_fn(state.variables(), batch["frames"], train=False)
        return {"scores": jax.nn.softmax(logits, axis=-1)[:, 1]}

    def bn_forward_args(self, batch):
        return (batch["frames"],)

    # -- data --------------------------------------------------------------
    def _dataset(self, split):
        c = self.cfg
        stride = c.train_stride if split == "train" else c.val_stride
        return LamClipDataset(c.data_root, split=split, stride=stride,
                              img_size=c.img_size)

    def train_loader(self):
        c = self.cfg
        return BatchLoader(self._dataset("train"),
                           self.shardable_batch(c.batch_size), mode="train",
                           seed=c.seed, num_workers=c.num_workers)

    def val_loader(self):
        c = self.cfg
        return BatchLoader(self._dataset("val"),
                           self.shardable_batch(c.batch_size), mode="eval",
                           num_workers=c.num_workers)

    # -- validation aggregation (reference PostProcessor semantics) --------
    def start_validation(self):
        return {"uids": [], "labels": [], "scores": []}

    def accumulate(self, ctx, outputs, batch):
        scores = np.asarray(outputs["scores"])
        valid = np.asarray(batch.get("valid", np.ones(len(scores), bool)))
        for i in range(len(scores)):
            if not valid[i]:
                continue
            ctx["uids"].append(batch["uid"][i])
            ctx["labels"].append(int(batch["label"][i]))
            ctx["scores"].append(float(scores[i]))

    def finalize_validation(self, ctx) -> Dict[str, float]:
        if not ctx["uids"]:
            return {"val_mAP": 0.0, "val_acc": 0.0}
        m_ap, acc = run_evaluation(ctx["uids"], np.asarray(ctx["labels"]),
                                   np.asarray(ctx["scores"]))
        return {"val_mAP": m_ap, "val_acc": acc}
