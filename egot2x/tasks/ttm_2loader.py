"""TTM 2-loader task: EgoT2-s translation with frozen LAM/TTM/ASD backbones.

Behavioral reference: HHI/tasks/ttm/video_task_2loader.py:15-99 — same
weighted CE + per-segment mAP as the plain TTM task, but the batch is
(video, video_asd, audio, audio_asd, target) and the model is a Stage-II
translator. Backbone weights come from Stage-I checkpoints
(--lam_checkpoint/--ttm_checkpoint/--asd_checkpoint) and are excluded
from the optimizer via the structural frozen split — unlike the
reference, whose Adam iterates all params (video_task.py:65).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from egot2x.core.checkpoint import graft_backbone
from egot2x.core.registry import build_model
from egot2x.data.bucketing import BucketBatchLoader
from egot2x.data.ttm_2task import TtmTwoTaskDataset
from egot2x.tasks.lam import weighted_cross_entropy
from egot2x.tasks.ttm import TalkingToMe
from egot2x.train.optim import construct_optimizer
from egot2x.train.state import TrainState, split_params
from egot2x.translate.egot2s_hhi import FROZEN_KEYS

import egot2x.translate.egot2s_hhi  # noqa: F401 — register translators


class TalkingToMe2Loader(TalkingToMe):
    checkpoint_metric = "val_mAP"
    checkpoint_mode = "max"

    def __init__(self, cfg):
        self.cfg = cfg
        from egot2x.tasks.base import resolve_dtype

        if cfg.get("quant_trunks") and cfg.get("nofreeze"):
            raise ValueError(
                "quant_trunks requires frozen trunks: the int8 conv "
                "path has no gradient (nofreeze differentiates the "
                "backbones)")
        self.model = build_model(
            cfg.model,
            dtype=resolve_dtype(cfg),
            hidden_dim=cfg.get("hidden_dim", 256),
            num_heads=cfg.get("num_heads", 4),
            num_layers=cfg.get("num_layers", 3),
            dropout=cfg.get("dropout", 0.1),
            nofreeze=cfg.get("nofreeze", False),
            remat=cfg.get("remat", False),
            # int8 static-PTQ trunks for Stage-II training: the frozen
            # backbones' forward dominates the step and takes no
            # gradient, so the deployment int8 path (accuracy-gated by
            # tests/test_quant_gate.py) legally accelerates training too
            quant=cfg.get("quant_trunks", False),
        )
        self.class_weights = np.asarray(cfg.weights, dtype=np.float32)

    def _sample_inputs(self):
        c = self.cfg
        n = int(min(self.buckets))
        s = c.img_size
        return (
            jnp.zeros((1, n, s, s, 3), jnp.float32),       # video
            jnp.zeros((1, n, 112, 112), jnp.float32),      # video_asd
            jnp.zeros((1, int(n / 30.0 * 16000)), jnp.float32),  # audio
            jnp.zeros((1, 4 * n, 13), jnp.float32),        # audio_asd
        )

    def build_state(self, rng: jax.Array) -> TrainState:
        c = self.cfg
        variables = self.model.init(rng, *self._sample_inputs(), train=False)
        variables = dict(variables)
        # graft Stage-I backbone checkpoints when provided
        for key, flag, src in (
            ("lam_model", "lam_checkpoint", "trunk"),
            ("ttm_model", "ttm_checkpoint", "trunk"),
            ("asd_model", "asd_checkpoint", "talknet"),
        ):
            path = c.get(flag)
            if path and key in variables["params"]:
                variables = graft_backbone(variables, key, path, params_src=src)
        frozen_keys = () if c.get("nofreeze") else FROZEN_KEYS
        trainable, frozen = split_params(
            variables["params"], lambda k: k in frozen_keys
        )
        tx = construct_optimizer(trainable, method="adam", lr=c.lr,
                                 weight_decay=c.get("wd", 0.0))
        return TrainState.create(
            apply_fn=self.model.apply,
            params=trainable,
            frozen=frozen,
            tx=tx,
            batch_stats=variables.get("batch_stats", {}),
            quant=variables.get("quant", {}),
        )

    def _model_inputs(self, batch):
        return (batch["frames"], batch["video_asd"], batch["audio"],
                batch["audio_asd"])

    def train_step(self, state: TrainState, batch, rng):
        weights = jnp.asarray(self.class_weights)

        def loss_fn(params):
            from egot2x.train.state import merge_trees

            full = merge_trees(state.frozen, params) if state.frozen else params
            variables = {"params": full, "batch_stats": state.batch_stats}
            if state.quant:
                variables["quant"] = state.quant
            out, mutated = state.apply_fn(
                variables,
                *self._model_inputs(batch),
                train=True, mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            loss = weighted_cross_entropy(out, batch["label"], weights)
            return loss, mutated

        (loss, mutated), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads)
        state = state.replace(batch_stats=mutated["batch_stats"])
        return state, {"loss": loss}

    def eval_step(self, state: TrainState, batch):
        logits = state.apply_fn(state.variables(), *self._model_inputs(batch),
                                train=False)
        return {"logits": logits}

    def _dataset(self, split):
        c = self.cfg
        return TtmTwoTaskDataset(c.data_root, split=split, img_size=c.img_size)


class TalkingToMe2Task(TalkingToMe2Loader):
    """Single-loader translator task for the 2-task LAM+TTM fusion
    (reference trains TaskFusionMFTransformer2Task through the plain
    TalkingToMe task, HHI/scripts/run_ttm.py without --two_loader;
    batch = (video, audio))."""

    def _sample_inputs(self):
        c = self.cfg
        n = int(min(self.buckets))
        s = c.img_size
        return (
            jnp.zeros((1, n, s, s, 3), jnp.float32),
            jnp.zeros((1, int(n / 30.0 * 16000)), jnp.float32),
        )

    def _model_inputs(self, batch):
        return (batch["frames"], batch["audio"])

    def _dataset(self, split):
        from egot2x.data.ttm import TtmSegmentDataset

        c = self.cfg
        return TtmSegmentDataset(c.data_root, split=split, img_size=c.img_size)
