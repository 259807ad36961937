"""LTA 2-loader task: EgoT2-s long-term anticipation translation.

Behavioral reference: HOI/tasks/lta/long_term_anticipation_taskspecfic.py
:139-281 (``LTA2Loader``) — batch = {'orig': SlowFast input clips,
'pnr': per-clip 16-frame streams}; models
``TaskFusionMFTransformerLTA4Task`` (PNR+OSCC+AR+LTA) and
``TaskFusionMFTransformer2Task`` (AR+LTA) with Categorical generate at
val/test (distributed_AUED).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from egot2x.core.checkpoint import graft_backbone
from egot2x.core.registry import build_model
from egot2x.data.hoi_2task import LtaWithAuxDataset
from egot2x.data.pipeline import BatchLoader
from egot2x.tasks.lta import LongTermAnticipationTask
from egot2x.train.optim import construct_optimizer, lr_schedule
from egot2x.train.state import TrainState, merge_trees, split_params
from egot2x.translate.egot2s_hoi import HOI_FROZEN_KEYS

import egot2x.translate.egot2s_hoi  # noqa: F401

LTA_NAME_ALIASES = {
    "TaskFusionMFTransformer2Task": "TaskFusionMFTransformer2TaskLTA",
}


class LTA2Loader(LongTermAnticipationTask):
    def __init__(self, cfg):
        self.cfg = cfg
        self.num_actions = cfg.get("num_actions", 20)
        self.k = cfg.get("num_sequences_to_predict", 5)
        name = cfg.get("model", "TaskFusionMFTransformerLTA4Task")
        name = LTA_NAME_ALIASES.get(name, name)
        self.uses_pnr_stream = name == "TaskFusionMFTransformerLTA4Task"
        self.model = build_model(
            name,
            num_classes=tuple(cfg.get("num_classes", (115, 478))),
            num_actions=self.num_actions,
            num_input_clips=cfg.get("num_input_clips", 2),
            crop_size=cfg.get("pnr_crop", 225),
            feature_dim=cfg.get("translation_features", 2048),
            num_layers=cfg.get("translation_layers", 1),
            alpha=cfg.get("alpha", 8),
            beta_inv=cfg.get("beta_inv", 8),
        )

    def _sample_inputs(self):
        c = self.cfg
        s = c.get("crop_size", 224)
        t = c.get("num_frames", 32)
        a = c.get("alpha", 8)
        n = c.get("num_input_clips", 2)
        ps = c.get("pnr_crop", 225)
        pathways = [jnp.zeros((1, n, t // a, s, s, 3), jnp.float32),
                    jnp.zeros((1, n, t, s, s, 3), jnp.float32)]
        frames_pnr = jnp.zeros((1, n, c.get("pnr_frames", 16), ps, ps, 3),
                               jnp.float32)
        return pathways, frames_pnr

    def _model_args(self, batch):
        pathways = [batch["slow"], batch["fast"]]
        if self.uses_pnr_stream:
            return (pathways, batch["frames_pnr"])
        return (pathways,)

    def build_state(self, rng: jax.Array) -> TrainState:
        c = self.cfg
        pathways, frames_pnr = self._sample_inputs()
        init_args = (pathways, frames_pnr) if self.uses_pnr_stream else (pathways,)
        variables = dict(self.model.init(rng, *init_args, train=False))
        for key, flag, src in (
            ("pnr_model", "pnr_checkpoint", None),
            ("oscc_model", "oscc_checkpoint", None),
            ("action_model", "action_checkpoint", "trunk"),
            ("lta_model", "lta_checkpoint", None),
        ):
            path = c.get(flag)
            if path and key in variables["params"]:
                variables = graft_backbone(variables, key, path, params_src=src)
        trainable, frozen = split_params(
            variables["params"], lambda k: k in HOI_FROZEN_KEYS)
        sched = lr_schedule(c.get("lr_policy", "cosine_warmup"), c.lr,
                            c.get("total_steps", 10000),
                            warmup_steps=c.get("warmup_steps", 100))
        tx = construct_optimizer(trainable, method=c.get("optimizer", "sgd"),
                                 lr=sched, weight_decay=c.get("wd", 1e-4))
        return TrainState.create(
            apply_fn=self.model.apply, params=trainable, frozen=frozen, tx=tx,
            batch_stats=variables.get("batch_stats", {}),
        )

    def train_step(self, state: TrainState, batch, rng):
        def loss_fn(params):
            full = merge_trees(state.frozen, params) if state.frozen else params
            (verb_logits, noun_logits), mutated = state.apply_fn(
                {"params": full, "batch_stats": state.batch_stats},
                *self._model_args(batch), train=True, mutable=["batch_stats"],
                rngs={"dropout": rng},
            )

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
        full = merge_trees(state.frozen, state.params) if state.frozen else state.params
        preds = state.apply_fn(
            {"params": full, "batch_stats": state.batch_stats},
            *self._model_args(batch), k=self.k, rng=rng, method="generate",
        )
        return {"verb_preds": preds[0], "noun_preds": preds[1]}

    def _dataset(self, split):
        c = self.cfg
        return LtaWithAuxDataset(
            c.data_root, split=split,
            num_input_clips=c.get("num_input_clips", 2),
            num_actions=self.num_actions,
            num_frames=c.get("num_frames", 32), alpha=c.get("alpha", 8),
            crop_size=c.get("crop_size", 224),
            pnr_frames=c.get("pnr_frames", 16), pnr_crop=c.get("pnr_crop", 225),
            seed=c.seed,
        )
