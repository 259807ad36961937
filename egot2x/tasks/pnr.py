"""PNR (keyframe localisation) and OSCC (state-change) tasks.

Behavioral reference: HOI/tasks/pnr/keyframe_detection.py —
  * ``KeyframeLocalisation`` (:20-136): BCE over the 16 per-frame
    sigmoid scores, or CE on the argmax label masked by the
    state-change flag; metric = keyframe localisation error in seconds
    (checkpoint metric is its negation, mode max in the reference —
    here plain min on val_keyframe_dist).
  * ``StateChangeClassification`` (:139-219): CE on 2-class logits,
    accuracy metric.
  * ``StateChangeAndKeyframeLocalisation`` (:222-364): dual-head
    λ1·state + λ2·keyframe.
Optimizer: adamw + constant/cosine LR (HOI/optimizers/pnr).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from egot2x.core.registry import build_model
from egot2x.data.pipeline import BatchLoader
from egot2x.data.pnr import PnrClipDataset
from egot2x.metrics.pnr import (
    keyframe_accuracy,
    keyframe_distance,
    state_change_accuracy,
)
from egot2x.nn.resnet3d import resolve_nonlocal
from egot2x.tasks.base import Task
from egot2x.train.optim import construct_optimizer, lr_schedule
from egot2x.train.state import TrainState

import egot2x.models.pnr  # noqa: F401 — register models


class PnrTaskBase(Task):
    def __init__(self, cfg):
        self.cfg = cfg
        self.num_frames = cfg.get("sampling_fps", 2) * cfg.get("clip_len_sec", 8)
        self.model = self._build_model()

    def _build_model(self):
        raise NotImplementedError

    def _nonlocal_cfg(self):
        """Honor a user YAML's NONLOCAL.* group (reference
        HOI/configs/pnr/defaults.py:259-276) — None when every stage's
        LOCATION list is empty (the EgoT2 configs)."""
        c = self.cfg
        return resolve_nonlocal(
            c.get_path("NONLOCAL.LOCATION", default=None),
            c.get_path("NONLOCAL.GROUP", default=None),
            c.get_path("NONLOCAL.POOL", default=None),
            c.get_path("NONLOCAL.INSTANTIATION", default="dot_product"))

    def build_state(self, rng: jax.Array) -> TrainState:
        c = self.cfg
        s = c.get("crop_size", 225)
        sample = jnp.zeros((1, self.num_frames, s, s, 3), jnp.float32)
        variables = self.model.init(rng, sample, train=False)
        total_steps = c.get("total_steps", 10000)
        sched = lr_schedule(c.get("lr_policy", "constant"), c.lr, total_steps,
                            warmup_steps=c.get("warmup_steps", 0))
        tx = construct_optimizer(variables["params"],
                                 method=c.get("optimizer", "adamw"),
                                 lr=sched,
                                 weight_decay=c.get("wd", 1e-4))
        return TrainState.create(
            apply_fn=self.model.apply,
            params=variables["params"],
            tx=tx,
            batch_stats=variables.get("batch_stats", {}),
        )

    def _dataset(self, split):
        c = self.cfg
        return PnrClipDataset(
            c.data_root, split=split, crop_size=c.get("crop_size", 225),
            sampling_fps=c.get("sampling_fps", 2),
            clip_len_sec=c.get("clip_len_sec", 8),
            no_state_chng=c.get("no_state_chng", False),
        )

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


class KeyframeLocalisation(PnrTaskBase):
    checkpoint_metric = "val_keyframe_dist"
    checkpoint_mode = "min"

    def _build_model(self):
        c = self.cfg
        kw = {}
        nl = self._nonlocal_cfg()
        if nl is not None:  # KeyframeCnnLSTM has no trunk nonlocal
            kw["nonlocal_cfg"] = nl
        return build_model(c.get("model", "KeyframeLocalizationResNet"),
                           arch=c.get("arch", "slow_layer5"),
                           crop_size=c.get("crop_size", 225),
                           remat=c.get("remat", False), **kw)

    def train_step(self, state: TrainState, batch, rng):
        use_bce = self.cfg.get("loss_func", "bce") == "bce"

        def loss_fn(params):
            out, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch["frames"], train=True, mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            logits = out[..., 0]  # (B, 16)
            if use_bce:
                pred = jax.nn.sigmoid(logits)
                loss = jnp.mean(
                    -(batch["labels"] * jnp.log(pred + 1e-8)
                      + (1 - batch["labels"]) * jnp.log(1 - pred + 1e-8))
                )
            else:
                logp = jax.nn.log_softmax(logits, axis=-1)
                tgt = jnp.argmax(batch["labels"], axis=-1)
                ce = -jnp.take_along_axis(logp, tgt[:, None], axis=-1)[:, 0]
                # masked by state-change flag (keyframe_detection.py:36-40)
                loss = jnp.mean(batch["state"].astype(jnp.float32) * ce)
            return loss, mutated

        (loss, mutated), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads)
        state = state.replace(batch_stats=mutated["batch_stats"])
        return state, {"loss": loss}

    def eval_step(self, state: TrainState, batch):
        out = state.apply_fn(state.variables(), batch["frames"], train=False)
        return {"preds": out[..., 0]}

    def start_validation(self):
        return {"dist_sum": 0.0, "dist_n": 0, "correct": 0, "total": 0}

    def accumulate(self, ctx, outputs, batch):
        valid = np.asarray(batch.get("valid", np.ones(len(outputs["preds"]), bool)))
        preds = np.asarray(outputs["preds"])[valid]
        state = np.asarray(batch["state"])[valid]
        labels = np.asarray(batch["labels"])[valid]
        s, n = keyframe_distance(
            preds, state, np.asarray(batch["fps"])[valid],
            np.asarray(batch["clip_start_frame"])[valid],
            np.asarray(batch["clip_end_frame"])[valid],
            np.asarray(batch["pnr_frame"])[valid],
            num_frames=self.num_frames,
        )
        ctx["dist_sum"] += s
        ctx["dist_n"] += n
        c, t = keyframe_accuracy(preds, labels, state)
        ctx["correct"] += c
        ctx["total"] += t

    def finalize_validation(self, ctx) -> Dict[str, float]:
        return {
            "val_keyframe_dist": ctx["dist_sum"] / max(ctx["dist_n"], 1),
            "val_keyframe_acc": ctx["correct"] / max(ctx["total"], 1),
        }


class StateChangeClassification(PnrTaskBase):
    checkpoint_metric = "val_state_acc"
    checkpoint_mode = "max"

    def _build_model(self):
        c = self.cfg
        kw = {}
        nl = self._nonlocal_cfg()
        if nl is not None:
            kw["nonlocal_cfg"] = nl
        return build_model(c.get("model", "StateChangeClsResNet"),
                           arch=c.get("arch", "slow_layer5"),
                           crop_size=c.get("crop_size", 225),
                           remat=c.get("remat", False), **kw)

    def train_step(self, state: TrainState, batch, rng):
        def loss_fn(params):
            logits, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch["frames"], train=True, mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            logp = jax.nn.log_softmax(logits, axis=-1)
            loss = -jnp.mean(
                jnp.take_along_axis(logp, batch["state"][:, None], axis=-1)
            )
            return loss, mutated

        (loss, mutated), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads)
        state = state.replace(batch_stats=mutated["batch_stats"])
        return state, {"loss": loss}

    def eval_step(self, state: TrainState, batch):
        logits = state.apply_fn(state.variables(), batch["frames"], train=False)
        return {"logits": logits}

    def start_validation(self):
        return {"correct": 0, "total": 0}

    def accumulate(self, ctx, outputs, batch):
        valid = np.asarray(batch.get("valid", np.ones(len(outputs["logits"]), bool)))
        c, t = state_change_accuracy(np.asarray(outputs["logits"])[valid],
                                     np.asarray(batch["state"])[valid])
        ctx["correct"] += c
        ctx["total"] += t

    def finalize_validation(self, ctx) -> Dict[str, float]:
        return {"val_state_acc": ctx["correct"] / max(ctx["total"], 1)}


class StateChangeAndKeyframeLocalisation(PnrTaskBase):
    """Dual-head: λ1·state CE + λ2·keyframe BCE (keyframe_detection.py:222-364)."""

    checkpoint_metric = "val_state_acc"
    checkpoint_mode = "max"

    def _build_model(self):
        c = self.cfg
        return build_model("DualHeadResNet", arch=c.get("arch", "slow_layer5"),
                           crop_size=c.get("crop_size", 225),
                           nonlocal_cfg=self._nonlocal_cfg())

    def train_step(self, state: TrainState, batch, rng):
        c = self.cfg
        lambda1 = c.get("lambda1", 1.0)
        lambda2 = c.get("lambda2", 1.0)

        def loss_fn(params):
            (keyframe, st_logits), mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch["frames"], train=True, mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            pred = jax.nn.sigmoid(keyframe)
            kf_loss = jnp.mean(
                batch["state"][:, None].astype(jnp.float32)
                * -(batch["labels"] * jnp.log(pred + 1e-8)
                    + (1 - batch["labels"]) * jnp.log(1 - pred + 1e-8))
            )
            logp = jax.nn.log_softmax(st_logits, axis=-1)
            st_loss = -jnp.mean(
                jnp.take_along_axis(logp, batch["state"][:, None], axis=-1)
            )
            return lambda1 * st_loss + lambda2 * kf_loss, mutated

        (loss, mutated), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads)
        state = state.replace(batch_stats=mutated["batch_stats"])
        return state, {"loss": loss}

    def eval_step(self, state: TrainState, batch):
        keyframe, st_logits = state.apply_fn(state.variables(), batch["frames"],
                                             train=False)
        return {"preds": keyframe, "logits": st_logits}

    def start_validation(self):
        return {"dist_sum": 0.0, "dist_n": 0, "correct": 0, "total": 0}

    def accumulate(self, ctx, outputs, batch):
        valid = np.asarray(batch.get("valid", np.ones(len(outputs["preds"]), bool)))
        s, n = keyframe_distance(
            np.asarray(outputs["preds"])[valid],
            np.asarray(batch["state"])[valid],
            np.asarray(batch["fps"])[valid],
            np.asarray(batch["clip_start_frame"])[valid],
            np.asarray(batch["clip_end_frame"])[valid],
            np.asarray(batch["pnr_frame"])[valid],
            num_frames=self.num_frames,
        )
        ctx["dist_sum"] += s
        ctx["dist_n"] += n
        c, t = state_change_accuracy(np.asarray(outputs["logits"])[valid],
                                     np.asarray(batch["state"])[valid])
        ctx["correct"] += c
        ctx["total"] += t

    def finalize_validation(self, ctx) -> Dict[str, float]:
        return {
            "val_keyframe_dist": ctx["dist_sum"] / max(ctx["dist_n"], 1),
            "val_state_acc": ctx["correct"] / max(ctx["total"], 1),
        }
