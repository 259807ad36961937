"""LTA (long-term anticipation) task.

Behavioral reference: HOI/tasks/lta/long_term_anticipation.py:161-295
(``LongTermAnticipationTask``) — train loss = mean over Z future actions
of verb CE + noun CE; validation generates k=5 sampled sequences per
head and computes the edit-distance AUED (ED@20 is the headline metric);
test writes outputs_lta.json with per-sample predictions.
"""

from __future__ import annotations

import json
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from egot2x.core.registry import build_model
from egot2x.data.lta import (Ego4dLtaDataset, Ego4dLtaSeparateSeqDataset,
                             Ego4dLtaSeqDataset)
from egot2x.data.pipeline import BatchLoader
from egot2x.metrics.lta import aued
from egot2x.tasks.base import Task
from egot2x.train.optim import construct_optimizer, lr_schedule
from egot2x.train.state import TrainState

import egot2x.models.ar_lta  # noqa: F401 — register models
import egot2x.models.lta_seqdecoder  # noqa: F401 — register seq decoders


class LongTermAnticipationTask(Task):
    checkpoint_metric = "val_verb_ED20"
    checkpoint_mode = "min"

    def __init__(self, cfg):
        self.cfg = cfg
        c = cfg
        self.num_actions = c.get("num_actions", 20)
        self.k = c.get("num_sequences_to_predict", 5)
        self.model = build_model(
            c.get("model", "ForecastingEncoderDecoder"),
            num_classes=tuple(c.get("num_classes", (115, 478))),
            num_actions=self.num_actions,
            aggregator=c.get("aggregator", "TransformerAggregator"),
            alpha=c.get("alpha", 8),
            beta_inv=c.get("beta_inv", 8),
        )

    def _sample_inputs(self):
        c = self.cfg
        s = c.get("crop_size", 224)
        t = c.get("num_frames", 32)
        a = c.get("alpha", 8)
        n = c.get("num_input_clips", 2)
        return [
            jnp.zeros((1, n, t // a, s, s, 3), jnp.float32),
            jnp.zeros((1, n, t, s, s, 3), jnp.float32),
        ]

    def build_state(self, rng: jax.Array) -> TrainState:
        c = self.cfg
        variables = self.model.init(rng, self._sample_inputs(), train=False)
        sched = lr_schedule(c.get("lr_policy", "cosine_warmup"), c.lr,
                            c.get("total_steps", 10000),
                            warmup_steps=c.get("warmup_steps", 100))
        tx = construct_optimizer(variables["params"],
                                 method=c.get("optimizer", "sgd"),
                                 lr=sched, weight_decay=c.get("wd", 1e-4))
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
            # (B, Z, C) vs (B, Z)
            def seq_ce(logits, labels):
                logp = jax.nn.log_softmax(logits, axis=-1)
                return -jnp.mean(jnp.take_along_axis(logp, labels[..., None], axis=-1))

            loss = seq_ce(verb_logits, batch["verb"]) + seq_ce(noun_logits, batch["noun"])
            return loss, mutated

        (loss, mutated), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads)
        state = state.replace(batch_stats=mutated["batch_stats"])
        return state, {"loss": loss}

    def eval_step(self, state: TrainState, batch, rng=None):
        rng = jax.random.key(0) if rng is None else rng
        preds = state.apply_fn(state.variables(), self._pathways(batch),
                               k=self.k, rng=rng, method="generate")
        return {"verb_preds": preds[0], "noun_preds": preds[1]}  # (B, k, Z)

    def _dataset(self, split):
        c = self.cfg
        return Ego4dLtaDataset(
            c.data_root, split=split,
            num_input_clips=c.get("num_input_clips", 2),
            num_actions=self.num_actions,
            num_frames=c.get("num_frames", 32), alpha=c.get("alpha", 8),
            crop_size=c.get("crop_size", 224), seed=c.seed,
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

    def start_validation(self):
        return {"verb_preds": [], "noun_preds": [], "verb": [], "noun": [],
                "uids": []}

    def accumulate(self, ctx, outputs, batch):
        vp = np.asarray(outputs["verb_preds"])  # (B, k, Z)
        np_p = np.asarray(outputs["noun_preds"])
        valid = np.asarray(batch.get("valid", np.ones(len(vp), bool)))
        for i in range(len(vp)):
            if not valid[i]:
                continue
            ctx["verb_preds"].append(vp[i])
            ctx["noun_preds"].append(np_p[i])
            ctx["verb"].append(np.asarray(batch["verb"][i]))
            ctx["noun"].append(np.asarray(batch["noun"][i]))
            ctx["uids"].append(batch["clip_uid"][i])

    def finalize_validation(self, ctx) -> Dict[str, float]:
        if not ctx["verb_preds"]:
            return {"val_verb_ED20": 1.0, "val_noun_ED20": 1.0}
        # (N, Z, K) layout for the metric
        vp = np.stack(ctx["verb_preds"]).transpose(0, 2, 1)
        np_p = np.stack(ctx["noun_preds"]).transpose(0, 2, 1)
        vl = np.stack(ctx["verb"])
        nl = np.stack(ctx["noun"])
        v = aued(vp, vl)
        n = aued(np_p, nl)
        z = vp.shape[1]
        return {
            f"val_verb_ED20": v[f"ED_{z - 1}"],
            f"val_noun_ED20": n[f"ED_{z - 1}"],
            "val_verb_AUED": v["AUED"],
            "val_noun_AUED": n["AUED"],
        }

    def write_test_outputs(self, ctx, path: str) -> None:
        """outputs_lta.json (reference :274-281)."""
        out = {}
        for uid, vp, np_p in zip(ctx["uids"], ctx["verb_preds"], ctx["noun_preds"]):
            out[uid] = {"verb": vp.tolist(), "noun": np_p.tolist()}
        with open(path, "w") as f:
            json.dump(out, f)


class LongTermAnticipationTaskSeq(LongTermAnticipationTask):
    """Seq-label LTA training: one joint [<action>, v, n, ...] decode
    (reference LongTermAnticipationTaskSeq,
    long_term_anticipation.py:298-348)."""

    checkpoint_metric = "val_verb_ED20"
    checkpoint_mode = "min"
    dataset_cls = Ego4dLtaSeqDataset
    model_name = "ForecastingEncoderSeqDecoder"

    def __init__(self, cfg):
        import os

        from egot2x.translate.vocab import build_hoi_vocab, map_label_to_action

        self.cfg = cfg
        c = cfg
        self.num_actions = c.get("num_actions", 20)
        self.k = c.get("num_sequences_to_predict", 5)
        tax = c.get("taxonomy") or os.path.join(c.data_root,
                                                "fho_lta_taxonomy.json")
        self.vocab = build_hoi_vocab(tax)
        self.verb_dict, self.noun_dict = map_label_to_action(tax)
        verb_ids = tuple(self.vocab[self.verb_dict[i]]
                         for i in range(len(self.verb_dict)))
        noun_ids = tuple(self.vocab[self.noun_dict[i]]
                         for i in range(len(self.noun_dict)))
        self.model = build_model(
            self.model_name,
            vocab_size=len(self.vocab), verb_ids=verb_ids, noun_ids=noun_ids,
            dim=c.get("seq_decoder_dim", 2048),
            num_heads=c.get("num_heads", 8),
            num_layers=c.get("num_layers", 6),
            num_actions=self.num_actions,
            alpha=c.get("alpha", 8), beta_inv=c.get("beta_inv", 8),
            **self._model_extra(),
        )

    def _model_extra(self):
        return {"bos_token": self.vocab["action"]}

    def build_state(self, rng: jax.Array) -> TrainState:
        c = self.cfg
        tgt = jnp.zeros((1, 2), jnp.int32)
        variables = self.model.init(rng, self._sample_inputs(), tgt,
                                    train=False)
        sched = lr_schedule(c.get("lr_policy", "cosine_warmup"), c.lr,
                            c.get("total_steps", 10000),
                            warmup_steps=c.get("warmup_steps", 100))
        tx = construct_optimizer(variables["params"],
                                 method=c.get("optimizer", "sgd"),
                                 lr=sched, weight_decay=c.get("wd", 1e-4))
        return TrainState.create(
            apply_fn=self.model.apply, params=variables["params"], tx=tx,
            batch_stats=variables.get("batch_stats", {}),
        )

    def _targets(self, batch):
        return [batch["target_seq"]]

    def train_step(self, state: TrainState, batch, rng):
        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            # Encode the clips ONCE and decode per target. The reference
            # re-runs the full model per target sequence
            # (long_term_anticipation.py:358-369), recomputing the
            # dominant SlowFast encoding; sharing it halves step cost.
            # Divergence (documented): encoder dropout/BN-update happen
            # once per step instead of once per decode.
            encoded, mutated = state.apply_fn(
                variables, self._pathways(batch), train=True,
                mutable=["batch_stats"], method="encode",
                rngs={"dropout": jax.random.fold_in(rng, 999)},
            )
            total = 0.0
            for ti, tgt in enumerate(self._targets(batch)):
                logits = state.apply_fn(
                    variables, tgt[:, :-1], encoded, train=True,
                    method="decode",
                    rngs={"dropout": jax.random.fold_in(rng, ti)},
                )
                logp = jax.nn.log_softmax(logits, axis=-1)
                total = total - jnp.mean(
                    jnp.take_along_axis(logp, tgt[:, 1:, None], axis=-1))
            return total, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        state = state.apply_gradients(grads)
        state = state.replace(batch_stats=new_stats)
        return state, {"loss": loss}

    def eval_step(self, state: TrainState, batch, rng=None):
        rng = jax.random.key(0) if rng is None else rng
        preds = state.apply_fn(state.variables(), self._pathways(batch),
                               k=self.k, rng=rng, method="generate")
        return {"verb_preds": preds[0], "noun_preds": preds[1]}

    def _dataset(self, split):
        c = self.cfg
        return self.dataset_cls(
            self.vocab, self.verb_dict, self.noun_dict,
            c.data_root, split=split,
            num_input_clips=c.get("num_input_clips", 2),
            num_actions=self.num_actions,
            num_frames=c.get("num_frames", 32), alpha=c.get("alpha", 8),
            crop_size=c.get("crop_size", 224), seed=c.seed,
        )


class LongTermAnticipationTaskSeparateSeq(LongTermAnticipationTaskSeq):
    """Separate verb/noun seq decodes from the lta_verb/lta_noun prompts
    (reference LongTermAnticipationTaskSeparateSeq, :350-409)."""

    dataset_cls = Ego4dLtaSeparateSeqDataset
    model_name = "ForecastingEncoderSeparateSeqDecoder"

    def _model_extra(self):
        return {"verb_bos": self.vocab["lta_verb"],
                "noun_bos": self.vocab["lta_noun"]}

    def _targets(self, batch):
        return [batch["target_seq_verb"], batch["target_seq_noun"]]
