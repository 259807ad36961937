"""ASD task: TalkNet 3-loss training + frame-level accuracy validation.

Behavioral reference: HHI/tasks/asd/video_task.py:17-94 — loss =
lossAV + 0.4·lossA + 0.4·lossV, each a per-frame 2-class CE with class
weights [1, 4] (HHI/tasks/asd/loss.py); validation = frame accuracy
correct/total from the AV head; Adam + per-step StepLR(gamma=lr_decay).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from egot2x.core.registry import build_model
from egot2x.data.asd import AsdTrialDataset
from egot2x.data.bucketing import BucketBatchLoader
from egot2x.tasks.base import Task
from egot2x.train.state import TrainState

import egot2x.models.asd  # noqa: F401 — register models

ASD_CLASS_WEIGHTS = np.asarray([1.0, 4.0], dtype=np.float32)
ASD_BUCKETS = (15, 30, 60, 90, 120, 150)


def frame_weighted_ce(logits, labels, weights):
    """Per-frame weighted CE over (B, T, 2) logits, torch mean semantics."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    w = jnp.asarray(weights)[labels]
    return -(w * picked).sum() / w.sum()


class ActiveSpeakerDetection(Task):
    checkpoint_metric = "val_acc"
    checkpoint_mode = "max"

    def __init__(self, cfg):
        self.cfg = cfg
        self.model = build_model(cfg.get("model", "TalkNetWithHeads"))

    def build_state(self, rng: jax.Array) -> TrainState:
        c = self.cfg
        n = int(min(ASD_BUCKETS))
        mfcc = jnp.zeros((1, 4 * n, 13), jnp.float32)
        faces = jnp.zeros((1, n, 112, 112), jnp.float32)
        variables = self.model.init(rng, mfcc, faces, train=False)
        # Adam with per-step exponential decay (reference StepLR step_size=1)
        sched = optax.exponential_decay(
            init_value=c.lr, transition_steps=1, decay_rate=c.get("lr_decay", 1.0)
        ) if c.get("lr_decay", 1.0) != 1.0 else c.lr
        tx = optax.adam(sched)
        return TrainState.create(
            apply_fn=self.model.apply,
            params=variables["params"],
            tx=tx,
            batch_stats=variables.get("batch_stats", {}),
        )

    def train_step(self, state: TrainState, batch, rng):
        def loss_fn(params):
            out, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch["mfcc"], batch["faces"],
                train=True, deterministic=False, mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            labels = batch["labels"][:, : out["logits_av"].shape[1]]
            loss_av = frame_weighted_ce(out["logits_av"], labels, ASD_CLASS_WEIGHTS)
            loss_a = frame_weighted_ce(out["logits_a"], labels, ASD_CLASS_WEIGHTS)
            loss_v = frame_weighted_ce(out["logits_v"], labels, ASD_CLASS_WEIGHTS)
            loss = loss_av + 0.4 * loss_a + 0.4 * loss_v
            return loss, (mutated, out, labels)

        (loss, (mutated, out, labels)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads)
        state = state.replace(batch_stats=mutated["batch_stats"])
        pred = jnp.argmax(out["logits_av"], axis=-1)
        acc = jnp.mean((pred == labels).astype(jnp.float32))
        return state, {"loss": loss, "acc": acc}

    def eval_step(self, state: TrainState, batch):
        out = state.apply_fn(state.variables(), batch["mfcc"], batch["faces"],
                             train=False)
        labels = batch["labels"][:, : out["logits_av"].shape[1]]
        pred = jnp.argmax(out["logits_av"], axis=-1)
        return {
            "correct": (pred == labels).astype(jnp.int32).sum(axis=1),
            "total": jnp.full((labels.shape[0],), labels.shape[1], jnp.int32),
            "scores": jax.nn.softmax(out["logits_av"], axis=-1)[..., 1],
        }

    def _dataset(self, split):
        return AsdTrialDataset(self.cfg.data_root, split=split)

    def train_loader(self):
        c = self.cfg
        return BucketBatchLoader(self._dataset("train"), frames_budget=c.batch_size,
                                 buckets=ASD_BUCKETS, mode="train", seed=c.seed,
                                 num_workers=c.num_workers,
                                 batch_divisor=self.batch_divisor)

    def val_loader(self):
        c = self.cfg
        return BucketBatchLoader(self._dataset("val"), frames_budget=c.batch_size,
                                 buckets=ASD_BUCKETS, mode="eval",
                                 num_workers=c.num_workers,
                                 batch_divisor=self.batch_divisor)

    def start_validation(self):
        return {"correct": 0, "total": 0}

    def accumulate(self, ctx, outputs, batch):
        valid = np.asarray(batch.get("valid", np.ones(len(outputs["correct"]), bool)))
        ctx["correct"] += int(np.asarray(outputs["correct"])[valid].sum())
        ctx["total"] += int(np.asarray(outputs["total"])[valid].sum())

    def finalize_validation(self, ctx) -> Dict[str, float]:
        acc = ctx["correct"] / max(ctx["total"], 1)
        return {"val_acc": acc}
