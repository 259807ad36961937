"""PNR/OSCC 2-loader tasks: EgoT2-s translation with frozen HOI backbones.

Behavioral reference: HOI/tasks/pnr/video_taskspecific_pnr.py:21-219 —
``KeyframeLocalisation2Loader`` / ``StateChangeClassification2Loader``:
batch = {'orig': PNR frames+labels, 'recognition': SlowFast clip};
model(frames, pathways); same losses/metrics as Stage-I.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from egot2x.core.checkpoint import graft_backbone
from egot2x.core.registry import build_model
from egot2x.data.hoi_2task import PnrWithAuxDataset
from egot2x.data.pipeline import BatchLoader
from egot2x.tasks.pnr import KeyframeLocalisation, StateChangeClassification
from egot2x.train.optim import construct_optimizer, lr_schedule
from egot2x.train.state import TrainState, split_params
from egot2x.translate.egot2s_hoi import HOI_FROZEN_KEYS

import egot2x.translate.egot2s_hoi  # noqa: F401 — register translators


class _TwoLoaderMixin:
    """Shared build_state/data plumbing for the PNR/OSCC translators."""

    target: str = "keyframe"

    def _build_model(self):
        c = self.cfg
        return build_model(
            c.get("model", "TaskFusionMFTransformer3TaskDropout"),
            target=self.target,
            crop_size=c.get("crop_size", 225),
            feature_dim=c.get("translation_features", 128),
            num_layers=c.get("translation_layers", 1),
            feat_dropout=c.get("feat_dropout", 0.5),
            alpha=c.get("alpha", 8),
            beta_inv=c.get("beta_inv", 8),
            # int8 static-PTQ trunks for Stage-II training: the frozen
            # HOI backbones are ~all the step's FLOPs and take no
            # gradient (tests/test_quant_3d.py gates accuracy). Scales
            # calibrate on the first batch (Trainer hook).
            quant=c.get("quant_trunks", False),
        )

    def _sample_inputs(self):
        c = self.cfg
        s = c.get("crop_size", 225)
        t = self.num_frames
        ac = c.get("aux_crop", 224)
        at = c.get("aux_num_frames", 32)
        a = c.get("alpha", 8)
        frames = jnp.zeros((1, t, s, s, 3), jnp.float32)
        pathways = [jnp.zeros((1, at // a, ac, ac, 3), jnp.float32),
                    jnp.zeros((1, at, ac, ac, 3), jnp.float32)]
        return frames, pathways

    def build_state(self, rng: jax.Array) -> TrainState:
        c = self.cfg
        frames, pathways = self._sample_inputs()
        variables = dict(self.model.init(rng, frames, pathways, train=False))
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
        sched = lr_schedule(c.get("lr_policy", "constant"), c.lr,
                            c.get("total_steps", 10000))
        tx = construct_optimizer(trainable, method=c.get("optimizer", "adamw"),
                                 lr=sched, weight_decay=c.get("wd", 1e-4))
        return TrainState.create(
            apply_fn=self.model.apply, params=trainable, frozen=frozen, tx=tx,
            batch_stats=variables.get("batch_stats", {}),
            quant=variables.get("quant", {}),
        )

    def _model_inputs(self, batch):
        # positional apply args (Task.calibrate_state contract)
        return (batch["frames"], [batch["slow"], batch["fast"]])

    def _dataset(self, split):
        c = self.cfg
        return PnrWithAuxDataset(
            c.data_root, split=split, crop_size=c.get("crop_size", 225),
            sampling_fps=c.get("sampling_fps", 2),
            clip_len_sec=c.get("clip_len_sec", 8),
            aux_num_frames=c.get("aux_num_frames", 32),
            aux_alpha=c.get("alpha", 8), aux_crop=c.get("aux_crop", 224),
        )

    def _apply(self, state, params, batch, train, rng=None):
        from egot2x.train.state import merge_trees

        full = merge_trees(state.frozen, params) if state.frozen else params
        variables = {"params": full, "batch_stats": state.batch_stats}
        if state.quant:
            variables["quant"] = state.quant
        kwargs = dict(train=train)
        if train:
            kwargs.update(mutable=["batch_stats"], rngs={"dropout": rng})
        return state.apply_fn(
            variables, batch["frames"], [batch["slow"], batch["fast"]],
            **kwargs,
        )


class KeyframeLocalisation2Loader(_TwoLoaderMixin, KeyframeLocalisation):
    target = "keyframe"

    def train_step(self, state: TrainState, batch, rng):
        def loss_fn(params):
            logits, mutated = self._apply(state, params, batch, True, rng)
            logp = jax.nn.log_softmax(logits, axis=-1)  # (B, 16)
            tgt = jnp.argmax(batch["labels"], axis=-1)
            ce = -jnp.take_along_axis(logp, tgt[:, None], axis=-1)[:, 0]
            loss = jnp.mean(batch["state"].astype(jnp.float32) * ce)
            return loss, mutated

        (loss, mutated), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads)
        state = state.replace(batch_stats=mutated["batch_stats"])
        return state, {"loss": loss}

    def eval_step(self, state: TrainState, batch):
        logits = self._apply(state, state.params, batch, False)
        return {"preds": logits}


class StateChangeClassification2Loader(_TwoLoaderMixin, StateChangeClassification):
    target = "state"

    def train_step(self, state: TrainState, batch, rng):
        def loss_fn(params):
            logits, mutated = self._apply(state, params, batch, True, rng)
            logp = jax.nn.log_softmax(logits, axis=-1)
            loss = -jnp.mean(
                jnp.take_along_axis(logp, batch["state"][:, None], axis=-1))
            return loss, mutated

        (loss, mutated), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads)
        state = state.replace(batch_stats=mutated["batch_stats"])
        return state, {"loss": loss}

    def eval_step(self, state: TrainState, batch):
        logits = self._apply(state, state.params, batch, False)
        return {"logits": logits}
