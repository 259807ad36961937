"""AR 2-loader task: EgoT2-s action recognition translation.

Behavioral reference: HOI/tasks/lta/long_term_anticipation_taskspecfic.py
:23-137 (``RecognitionTask2Loader``) — batch = {'orig': SlowFast clip,
'pnr': 16-frame stream}; model(pathways, frames_pnr) → verb/noun logits.

The reference's AR-registry name ``TaskFusionMFTransformer3Task`` maps
to our globally-unique ``ARTaskFusionMFTransformer3Task``.
"""

from __future__ import annotations

import jax

from egot2x.core.checkpoint import graft_backbone
from egot2x.core.registry import build_model
from egot2x.data.hoi_2task import RecognitionWithAuxDataset
from egot2x.data.pipeline import BatchLoader
from egot2x.tasks.ar import MultiTaskClassificationTask, ce_loss
from egot2x.train.optim import construct_optimizer, lr_schedule
from egot2x.train.state import TrainState, split_params
from egot2x.translate.egot2s_hoi import HOI_FROZEN_KEYS

import egot2x.translate.egot2s_hoi  # noqa: F401

import jax.numpy as jnp

AR_NAME_ALIASES = {
    "TaskFusionMFTransformer3Task": "ARTaskFusionMFTransformer3Task",
}


class RecognitionTask2Loader(MultiTaskClassificationTask):
    def __init__(self, cfg):
        self.cfg = cfg
        name = cfg.get("model", "ARTaskFusionMFTransformer3Task")
        name = AR_NAME_ALIASES.get(name, name)
        self.model = build_model(
            name,
            num_classes=tuple(cfg.get("num_classes", (115, 478))),
            crop_size=cfg.get("pnr_crop", 225),
            feature_dim=cfg.get("translation_features", 256),
            num_layers=cfg.get("translation_layers", 3),
            alpha=cfg.get("alpha", 8),
            beta_inv=cfg.get("beta_inv", 8),
        )

    def _sample_inputs(self):
        c = self.cfg
        s = c.get("crop_size", 224)
        t = c.get("num_frames", 32)
        a = c.get("alpha", 8)
        ps = c.get("pnr_crop", 225)
        pathways = [jnp.zeros((1, t // a, s, s, 3), jnp.float32),
                    jnp.zeros((1, t, s, s, 3), jnp.float32)]
        frames = jnp.zeros((1, c.get("pnr_frames", 16), ps, ps, 3), jnp.float32)
        return pathways, frames

    def build_state(self, rng: jax.Array) -> TrainState:
        c = self.cfg
        pathways, frames = self._sample_inputs()
        variables = dict(self.model.init(rng, pathways, frames, train=False))
        for key, flag, src in (
            ("pnr_model", "pnr_checkpoint", None),
            ("oscc_model", "oscc_checkpoint", None),
            ("action_model", "action_checkpoint", "trunk"),
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

    def _apply(self, state, params, batch, train, rng=None):
        from egot2x.train.state import merge_trees

        full = merge_trees(state.frozen, params) if state.frozen else params
        kwargs = dict(train=train)
        if train:
            kwargs.update(mutable=["batch_stats"], rngs={"dropout": rng})
        return state.apply_fn(
            {"params": full, "batch_stats": state.batch_stats},
            [batch["slow"], batch["fast"]], batch["frames_pnr"], **kwargs,
        )

    def train_step(self, state: TrainState, batch, rng):
        def loss_fn(params):
            (verb_logits, noun_logits), mutated = self._apply(
                state, params, batch, True, rng)
            loss = ce_loss(verb_logits, batch["verb"]) + ce_loss(noun_logits, batch["noun"])
            return loss, mutated

        (loss, mutated), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads)
        state = state.replace(batch_stats=mutated["batch_stats"])
        return state, {"loss": loss}

    def eval_step(self, state: TrainState, batch):
        verb_logits, noun_logits = self._apply(state, state.params, batch, False)
        return {"verb_logits": verb_logits, "noun_logits": noun_logits}

    def _dataset(self, split):
        c = self.cfg
        return RecognitionWithAuxDataset(
            c.data_root, split=split, num_frames=c.get("num_frames", 32),
            alpha=c.get("alpha", 8), crop_size=c.get("crop_size", 224),
            pnr_frames=c.get("pnr_frames", 16), pnr_crop=c.get("pnr_crop", 225),
            seed=c.seed,
        )
