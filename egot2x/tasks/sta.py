"""STA (short-term anticipation) task — vestigial in the reference
(unused by EgoT2 training), provided for surface completeness on top of
data/sta.py + models/sta.py + metrics/sta.py.

Behavioral reference: HOI/tasks/lta/short_term_anticipation.py:27-120 —
loss = w0·CE(verb, ignore −100 non-next-active) + w1·smooth-L1(ttc on
valid targets) over RoI-pooled detection boxes; train metrics
verb_accuracy / ttc_error; validation aggregates per-image detections
into box AP. The reference's ragged per-image box lists become
static-shape (B, M) padded boxes with masks (TPU static shapes)."""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from egot2x.core.registry import build_model
from egot2x.data.pipeline import BatchLoader
from egot2x.data.sta import Ego4dStaDataset
from egot2x.metrics.sta import box_ap
from egot2x.tasks.base import Task, resolve_dtype
from egot2x.train.optim import construct_optimizer, lr_schedule
from egot2x.train.state import TrainState

import egot2x.models.sta  # noqa: F401 — registers the STA models


def _flat_boxes(boxes: jax.Array) -> jax.Array:
    """(B, M, 4) padded boxes -> (B*M, 5) RoI rows with batch index."""
    b, m, _ = boxes.shape
    idx = jnp.repeat(jnp.arange(b, dtype=boxes.dtype), m)[:, None]
    return jnp.concatenate([idx, boxes.reshape(b * m, 4)], axis=1)


def smooth_l1(pred: jax.Array, tgt: jax.Array) -> jax.Array:
    d = jnp.abs(pred - tgt)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


class ShortTermAnticipationTask(Task):
    checkpoint_metric = "val_map_box"
    checkpoint_mode = "max"

    def __init__(self, cfg):
        self.cfg = cfg
        c = cfg
        self.num_verbs = c.get("num_verbs", 115)
        self.loss_weights = c.get("sta_loss_weights", [1.0, 1.0])
        self.model = build_model(
            c.get("model", "ShortTermAnticipationSlowFast"),
            num_verbs=self.num_verbs, alpha=c.get("alpha", 8),
            beta_inv=c.get("beta_inv", 8),
            dtype=resolve_dtype(c))

    # -- state -------------------------------------------------------------
    def build_state(self, rng: jax.Array) -> TrainState:
        c = self.cfg
        s = c.get("crop_size", 224)
        nf = c.get("num_frames", 32)
        al = c.get("alpha", 8)
        m = c.get("max_boxes", 16)
        slow = jnp.zeros((1, max(nf // al, 1), s, s, 3), jnp.float32)
        fast = jnp.zeros((1, nf, s, s, 3), jnp.float32)
        boxes = jnp.zeros((m, 5), jnp.float32)
        variables = self.model.init(rng, [slow, fast], boxes, train=False)
        sched = lr_schedule(c.get("lr_policy", "cosine"), c.lr,
                            c.get("total_steps", 10000),
                            warmup_steps=c.get("warmup_steps", 0))
        tx = construct_optimizer(variables["params"],
                                 method=c.get("optimizer", "sgd"),
                                 lr=sched, weight_decay=c.get("wd", 1e-4))
        return TrainState.create(
            apply_fn=self.model.apply, params=variables["params"], tx=tx,
            batch_stats=variables.get("batch_stats", {}))

    # -- data --------------------------------------------------------------
    def _dataset(self, split):
        c = self.cfg
        return Ego4dStaDataset(
            c.data_root, split=split, num_frames=c.get("num_frames", 32),
            alpha=c.get("alpha", 8), crop_size=c.get("crop_size", 224),
            jitter_scales=tuple(c.get("jitter_scales", (256, 320))),
            max_boxes=c.get("max_boxes", 16), seed=c.seed)

    def train_loader(self):
        c = self.cfg
        return BatchLoader(self._dataset("train"),
                           self.shardable_batch(c.batch_size),
                           mode="train", seed=c.seed,
                           num_workers=c.num_workers)

    def val_loader(self):
        c = self.cfg
        return BatchLoader(self._dataset("val"),
                           self.shardable_batch(c.batch_size), mode="eval",
                           num_workers=c.num_workers)

    # -- steps ---------------------------------------------------------------
    def train_step(self, state: TrainState, batch, rng):
        w0, w1 = self.loss_weights

        def loss_fn(params):
            out, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                [batch["slow"], batch["fast"]], _flat_boxes(batch["boxes"]),
                train=True, mutable=["batch_stats"], rngs={"dropout": rng})
            verb_logits, ttc = out                      # (B*M, V), (B*M, 1)
            verbs = batch["verb"].reshape(-1)           # -100 = ignore
            ttcs = batch["ttc"].reshape(-1)
            ttc_valid = batch["ttc_valid"].reshape(-1)
            vmask = (verbs >= 0) & batch["box_valid"].reshape(-1)
            safe = jnp.maximum(verbs, 0)
            logp = jax.nn.log_softmax(verb_logits.astype(jnp.float32), -1)
            ce = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
            verb_loss = jnp.sum(ce * vmask) / jnp.maximum(vmask.sum(), 1)
            tl = smooth_l1(ttc[:, 0].astype(jnp.float32), ttcs)
            ttc_loss = jnp.sum(tl * ttc_valid) / jnp.maximum(
                ttc_valid.sum(), 1)
            loss = w0 * verb_loss + w1 * ttc_loss
            acc = jnp.sum((verb_logits.argmax(-1) == verbs) * vmask) / \
                jnp.maximum(vmask.sum(), 1)
            err = jnp.sum(jnp.abs(ttc[:, 0] - ttcs) * ttc_valid) / \
                jnp.maximum(ttc_valid.sum(), 1)
            return loss, (mutated, verb_loss, ttc_loss, acc, err)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        mutated, verb_loss, ttc_loss, acc, err = aux
        state = state.apply_gradients(grads)
        state = state.replace(batch_stats=mutated["batch_stats"])
        return state, {"loss": loss, "verb_loss": verb_loss,
                       "ttc_loss": ttc_loss, "verb_accuracy": acc,
                       "ttc_error": err}

    def eval_step(self, state: TrainState, batch):
        verb_scores, ttc = state.apply_fn(
            state.variables(), [batch["slow"], batch["fast"]],
            _flat_boxes(batch["boxes"]), train=False)
        b = batch["boxes"].shape[0]
        return {"verb_scores": verb_scores.reshape(b, -1, self.num_verbs),
                "ttc": ttc.reshape(b, -1)}

    def bn_forward_args(self, batch):
        return ([batch["slow"], batch["fast"]], _flat_boxes(batch["boxes"]))

    # -- validation aggregation ----------------------------------------------
    def finalize_validation(self, ctx) -> Dict[str, float]:
        preds, scores, gts, accs = [], [], [], []
        for outputs, batch in ctx:
            valid_rows = batch.get("valid",
                                   np.ones(len(batch["boxes"]), bool))
            vs = np.asarray(outputs["verb_scores"], np.float32)
            for i in range(len(batch["boxes"])):
                if not valid_rows[i]:
                    continue
                bm = np.asarray(batch["box_valid"][i])
                boxes = np.asarray(batch["boxes"][i])[bm]
                conf = np.asarray(batch["score"][i])[bm] * \
                    vs[i][bm].max(-1)
                preds.append(boxes)
                scores.append(conf)
                gm = np.asarray(batch["gt_valid"][i])
                gts.append(np.asarray(batch["gt_boxes"][i])[gm])
                vlab = np.asarray(batch["verb"][i])[bm]
                act = vlab >= 0
                if act.any():
                    accs.append(float(
                        (vs[i][bm][act].argmax(-1) == vlab[act]).mean()))
        out = {"val_map_box": box_ap(preds, scores, gts)}
        if accs:
            out["val_verb_acc"] = float(np.mean(accs))
        return out
