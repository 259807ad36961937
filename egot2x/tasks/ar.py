"""AR (action recognition) task: verb+noun CE + top-k accuracy.

Behavioral reference: HOI/tasks/lta/long_term_anticipation.py:25-158
(``MultiTaskClassificationTask``) — loss = Σ_head CE, metrics =
verb/noun top-1/top-5 errors via gathered predictions; test-time
multi-view ensembling sums logits per clip id.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from egot2x.core.registry import build_model

import egot2x.nn.mvit  # noqa: F401 — register MViT backbones
from egot2x.data.lta import Ego4dRecognitionDataset
from egot2x.data.pipeline import BatchLoader
from egot2x.metrics.lta import topk_accuracies
from egot2x.tasks.base import Task
from egot2x.train.optim import construct_optimizer, lr_schedule
from egot2x.train.state import TrainState

import egot2x.models.ar_lta  # noqa: F401 — register models


def ce_loss(logits, labels):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[..., None], axis=-1))


class MultiTaskClassificationTask(Task):
    checkpoint_metric = "val_verb_top1"
    checkpoint_mode = "max"

    def __init__(self, cfg):
        self.cfg = cfg
        c = cfg
        name = c.get("model", "MultiTaskSlowFast")
        if "MViT" in name:
            # reference MViT consumes the 16-frame stream from the
            # SlowFast pathways (video_model_builder.py:858-868)
            self.model = build_model(
                name,
                num_classes=tuple(c.get("num_classes", (115, 478))),
                num_frames=min(c.get("num_frames", 32), 16),
            )
        else:
            self.model = build_model(
                name,
                num_classes=tuple(c.get("num_classes", (115, 478))),
                alpha=c.get("alpha", 8),
                beta_inv=c.get("beta_inv", 8),
                depth=c.get("resnet_depth", 50),
            )

    def _sample_inputs(self):
        c = self.cfg
        s = c.get("crop_size", 224)
        t = c.get("num_frames", 32)
        a = c.get("alpha", 8)
        return [
            jnp.zeros((1, t // a, s, s, 3), jnp.float32),
            jnp.zeros((1, t, s, s, 3), jnp.float32),
        ]

    def build_state(self, rng: jax.Array) -> TrainState:
        c = self.cfg
        variables = self.model.init(rng, self._sample_inputs(), train=False)
        sched = lr_schedule(c.get("lr_policy", "cosine_warmup"), c.lr,
                            c.get("total_steps", 10000),
                            warmup_steps=c.get("warmup_steps", 100))
        tx = construct_optimizer(variables["params"],
                                 method=c.get("optimizer", "sgd"),
                                 lr=sched, weight_decay=c.get("wd", 1e-4),
                                 momentum=c.get("momentum", 0.9))
        return TrainState.create(
            apply_fn=self.model.apply, params=variables["params"], tx=tx,
            batch_stats=variables.get("batch_stats", {}),
        )

    def _pathways(self, batch):
        return [batch["slow"], batch["fast"]]

    def train_step(self, state: TrainState, batch, rng):
        def loss_fn(params):
            (verb_logits, noun_logits), mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                self._pathways(batch), train=True, mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            loss = ce_loss(verb_logits, batch["verb"]) + ce_loss(noun_logits, batch["noun"])
            return loss, mutated

        (loss, mutated), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads)
        state = state.replace(batch_stats=mutated["batch_stats"])
        return state, {"loss": loss}

    def eval_step(self, state: TrainState, batch):
        verb_logits, noun_logits = state.apply_fn(
            state.variables(), self._pathways(batch), train=False)
        return {"verb_logits": verb_logits, "noun_logits": noun_logits}

    def _dataset(self, split):
        c = self.cfg
        return Ego4dRecognitionDataset(
            c.data_root, split=split, num_frames=c.get("num_frames", 32),
            alpha=c.get("alpha", 8), crop_size=c.get("crop_size", 224),
            seed=c.seed,
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

    # multi-view ensembling: sum logits per clip id (reference :106-158)
    def start_validation(self):
        # float factory (not a lambda): the ctx crosses pickle in the
        # multi-host validation gather (Task.merge_validation)
        return {"verb": defaultdict(float), "noun": defaultdict(float),
                "verb_label": {}, "noun_label": {}}

    def merge_validation(self, ctxs):
        """Cross-process merge: clips of one uid may land on different
        processes (strided sharding), so per-uid logit sums ADD while
        the label maps overwrite — identical labels, not counters
        (reference lta_metrics.py gather + get_mean semantics)."""
        out = self.start_validation()
        for c in ctxs:
            for key in ("verb", "noun"):
                for uid, v in c[key].items():
                    out[key][uid] = out[key][uid] + v
            for key in ("verb_label", "noun_label"):
                out[key].update(c[key])
        return out

    def accumulate(self, ctx, outputs, batch):
        vl = np.asarray(outputs["verb_logits"])
        nl = np.asarray(outputs["noun_logits"])
        valid = np.asarray(batch.get("valid", np.ones(len(vl), bool)))
        for i in range(len(vl)):
            if not valid[i]:
                continue
            uid = batch["clip_uid"][i]
            ctx["verb"][uid] = ctx["verb"][uid] + vl[i]
            ctx["noun"][uid] = ctx["noun"][uid] + nl[i]
            ctx["verb_label"][uid] = int(batch["verb"][i])
            ctx["noun_label"][uid] = int(batch["noun"][i])

    def finalize_validation(self, ctx) -> Dict[str, float]:
        if not ctx["verb"]:
            return {"val_verb_top1": 0.0, "val_noun_top1": 0.0}
        uids = list(ctx["verb"])
        vp = np.stack([ctx["verb"][u] for u in uids])
        np_ = np.stack([ctx["noun"][u] for u in uids])
        vl = np.asarray([ctx["verb_label"][u] for u in uids])
        nl = np.asarray([ctx["noun_label"][u] for u in uids])
        ks = [1, min(5, vp.shape[1])]
        v1, v5 = topk_accuracies(vp, vl, ks)
        n1, n5 = topk_accuracies(np_, nl, ks)
        return {"val_verb_top1": v1, "val_verb_top5": v5,
                "val_noun_top1": n1, "val_noun_top5": n5}
