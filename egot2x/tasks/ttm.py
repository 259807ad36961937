"""TTM (talking-to-me) task: weighted CE + per-segment mAP validation.

Behavioral reference: HHI/tasks/ttm/video_task.py:17-99 — CE with class
weights [0.266, 0.734] (HHI/configs/ttm/config.py), Adam(lr, wd);
validation aggregates per *segment*: sub-chunk logits of a split segment
are averaged before softmax (PostProcessor._merge_output,
HHI/utils/ttm/utils.py:71-80), then AVA-style mAP. The reference's
degenerate-batch skip (audio.shape[1]==0, video_task.py:33-34) cannot
occur here: bucketing guarantees non-empty static shapes.

One jitted program per frame bucket (≤6) replaces the reference's
per-batch dynamic shapes.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from egot2x.core.registry import build_model
from egot2x.data.bucketing import BucketBatchLoader
from egot2x.data.ttm import TtmSegmentDataset
from egot2x.metrics.map import run_evaluation
from egot2x.tasks.base import Task, resolve_dtype
from egot2x.tasks.lam import weighted_cross_entropy
from egot2x.train.optim import construct_optimizer
from egot2x.train.state import TrainState

import egot2x.models.ttm  # noqa: F401 — register models


class TalkingToMe(Task):
    checkpoint_metric = "val_mAP"
    checkpoint_mode = "max"

    def __init__(self, cfg):
        self.cfg = cfg
        self.model = build_model(cfg.model, dtype=resolve_dtype(cfg))
        self.class_weights = np.asarray(cfg.weights, dtype=np.float32)

    def build_state(self, rng: jax.Array) -> TrainState:
        c = self.cfg
        n = int(min(self.buckets))
        video = jnp.zeros((1, n, c.img_size, c.img_size, 3), jnp.float32)
        audio = jnp.zeros((1, int(n / 30.0 * 16000)), jnp.float32)
        variables = self.model.init(rng, video, audio, train=False)
        tx = construct_optimizer(variables["params"], method="adam", lr=c.lr,
                                 weight_decay=c.get("wd", 0.0))
        return TrainState.create(
            apply_fn=self.model.apply,
            params=variables["params"],
            tx=tx,
            batch_stats=variables.get("batch_stats", {}),
        )

    @property
    def buckets(self):
        return tuple(self.cfg.get("buckets", (15, 30, 60, 90, 120, 150)))

    def train_step(self, state: TrainState, batch, rng):
        weights = jnp.asarray(self.class_weights)

        def loss_fn(params):
            out, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch["frames"], batch["audio"],
                train=True, mutable=["batch_stats"],
            )
            loss = weighted_cross_entropy(out, batch["label"], weights)
            return loss, mutated

        (loss, mutated), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads)
        state = state.replace(batch_stats=mutated["batch_stats"])
        return state, {"loss": loss}

    def eval_step(self, state: TrainState, batch):
        logits = state.apply_fn(state.variables(), batch["frames"], batch["audio"],
                                train=False)
        return {"logits": logits}

    # -- data --------------------------------------------------------------
    def _dataset(self, split):
        c = self.cfg
        return TtmSegmentDataset(c.data_root, split=split, img_size=c.img_size)

    def train_loader(self):
        c = self.cfg
        return BucketBatchLoader(
            self._dataset("train"), frames_budget=c.batch_size,
            buckets=self.buckets, mode="train", seed=c.seed,
            num_workers=c.num_workers, batch_divisor=self.batch_divisor,
        )

    def val_loader(self):
        c = self.cfg
        return BucketBatchLoader(
            self._dataset("val"), frames_budget=c.batch_size,
            buckets=self.buckets, mode="eval", num_workers=c.num_workers,
            batch_divisor=self.batch_divisor,
        )

    # -- validation: per-segment logit averaging ---------------------------
    def start_validation(self):
        return {"logits": defaultdict(list), "label": {}, "span": {}}

    def accumulate(self, ctx, outputs, batch):
        logits = np.asarray(outputs["logits"])
        valid = np.asarray(batch.get("valid", np.ones(len(logits), bool)))
        for i in range(len(logits)):
            if not valid[i]:
                continue
            seg = batch["seg_id"][i]
            ctx["logits"][seg].append(logits[i])
            ctx["label"][seg] = int(batch["label"][i])
            s, e = int(batch["start"][i]), int(batch["end"][i])
            lo, hi = ctx["span"].get(seg, (s, e))
            ctx["span"][seg] = (min(lo, s), max(hi, e))

    def merge_validation(self, ctxs):
        """Cross-process merge: a segment's bucketed chunks may land on
        different processes, so per-segment logit lists concatenate,
        labels overwrite (identical), and spans take the (min, max)
        envelope — the global mAP is then computed once in finalize
        (reference utils/lam CSV merge semantics)."""
        out = self.start_validation()
        for c in ctxs:
            for seg, chunks in c["logits"].items():
                out["logits"][seg].extend(chunks)
            out["label"].update(c["label"])
            for seg, (s, e) in c["span"].items():
                lo, hi = out["span"].get(seg, (s, e))
                out["span"][seg] = (min(lo, s), max(hi, e))
        return out

    def finalize_validation(self, ctx) -> Dict[str, float]:
        if not ctx["logits"]:
            return {"val_mAP": 0.0, "val_acc": 0.0}
        uids, labels, scores = [], [], []
        for seg, chunks in ctx["logits"].items():
            mean_logits = np.mean(np.stack(chunks), axis=0)
            p = np.exp(mean_logits - mean_logits.max())
            p = p / p.sum()
            uids.append(seg)
            labels.append(ctx["label"][seg])
            scores.append(float(p[1]))
        m_ap, acc = run_evaluation(uids, np.asarray(labels), np.asarray(scores))
        return {"val_mAP": m_ap, "val_acc": acc}
