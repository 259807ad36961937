"""ASD 2-loader task: EgoT2-s ASD-as-target translation.

Behavioral reference: HHI/tasks/asd/video_task_taskspecific.py:17-77
(``ActiveSpeakerDetection2Loader``) — batch supplies both the ASD
streams (gray faces + MFCC) and the TTM-style streams (RGB crops + raw
wave) from the same tracks (train_loader_2task,
HHI/dataset/asd/dataLoader.py:155-260); the model is an ASD-target
translator returning per-frame features (B·T, output_dim) consumed by a
``lossAV(output_dim)`` head — per-frame 2-class CE with weights [1, 4];
validation is frame accuracy from the same head.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from egot2x.core.checkpoint import graft_backbone
from egot2x.data.asd import AsdTrialDataset
from egot2x.data.bucketing import BucketBatchLoader
from egot2x.tasks.asd import ASD_BUCKETS, ASD_CLASS_WEIGHTS, ActiveSpeakerDetection
from egot2x.train.state import TrainState, merge_trees
from egot2x.translate.egot2s_hhi import FROZEN_KEYS

import egot2x.translate.egot2s_hhi  # noqa: F401 — register translators


class _LossAVHead(nn.Module):
    """The reference's lossAV linear head folded into the model graph
    (HHI/tasks/asd/loss.py:11-30): features (N, D) → 2-class logits."""

    @nn.compact
    def __call__(self, feats):
        return nn.Dense(2, name="fc")(feats)


class _TranslatorWithHead(nn.Module):
    """ASD translator (per-frame features) + lossAV head."""

    model_name: str = "TaskFusionMFTransformer3TaskASD"
    hidden_dim: int = 128
    num_layers: int = 1
    num_heads: int = 4
    dropout: float = 0.1
    nofreeze: bool = False

    @nn.compact
    def __call__(self, video, video_asd, audio, audio_asd, train=False):
        from egot2x.core.registry import MODEL_REGISTRY

        translator_cls = MODEL_REGISTRY.get(self.model_name)
        feats = translator_cls(
            hidden_dim=self.hidden_dim, num_layers=self.num_layers,
            num_heads=self.num_heads, dropout=self.dropout,
            nofreeze=self.nofreeze, name="translator",
        )(video, video_asd, audio, audio_asd, train=train)
        return _LossAVHead(name="loss_av")(feats)  # (B·T, 2)


class ActiveSpeakerDetection2Loader(ActiveSpeakerDetection):
    checkpoint_metric = "val_acc"
    checkpoint_mode = "max"

    def __init__(self, cfg):
        self.cfg = cfg
        self.model = _TranslatorWithHead(
            model_name=cfg.get("model", "TaskFusionMFTransformer3TaskASD"),
            hidden_dim=cfg.get("hidden_dim", 128),
            num_layers=cfg.get("num_layers", 1),
            num_heads=cfg.get("num_heads", 4),
            dropout=cfg.get("dropout", 0.1),
            nofreeze=cfg.get("nofreeze", False),
        )

    def _sample_inputs(self):
        c = self.cfg
        n = int(min(ASD_BUCKETS))
        s = c.get("rgb_size", 224)
        return (
            jnp.zeros((1, n, s, s, 3), jnp.float32),   # video (RGB)
            jnp.zeros((1, n, 112, 112), jnp.float32),  # faces (gray)
            jnp.zeros((1, int(n / 30.0 * 16000)), jnp.float32),  # wave
            jnp.zeros((1, 4 * n, 13), jnp.float32),    # mfcc
        )

    def build_state(self, rng: jax.Array) -> TrainState:
        c = self.cfg
        variables = dict(self.model.init(rng, *self._sample_inputs(),
                                         train=False))
        for key, flag, src in (
            ("lam_model", "lam_checkpoint", "trunk"),
            ("ttm_model", "ttm_checkpoint", "trunk"),
            ("asd_model", "asd_checkpoint", "talknet"),
        ):
            path = c.get(flag)
            if path and key in variables["params"].get("translator", {}):
                # graft inside the 'translator' subtree
                sub = {"params": variables["params"]["translator"],
                       "batch_stats": variables.get("batch_stats", {}).get(
                           "translator", {})}
                sub = graft_backbone(sub, key, path, params_src=src)
                variables["params"] = dict(variables["params"],
                                           translator=sub["params"])
                if sub.get("batch_stats"):
                    bs = dict(variables.get("batch_stats", {}))
                    bs["translator"] = sub["batch_stats"]
                    variables["batch_stats"] = bs
        # frozen split happens inside the 'translator' subtree
        translator = variables["params"]["translator"]
        frozen_sub = {k: v for k, v in translator.items()
                      if k in FROZEN_KEYS and not c.get("nofreeze")}
        trainable_sub = {k: v for k, v in translator.items()
                         if k not in frozen_sub}
        trainable = dict(variables["params"], translator=trainable_sub)
        frozen = {"translator": frozen_sub} if frozen_sub else {}
        tx = optax.adam(c.lr)
        return TrainState.create(
            apply_fn=self.model.apply, params=trainable, frozen=frozen, tx=tx,
            batch_stats=variables.get("batch_stats", {}),
        )

    def _model_inputs(self, batch):
        return (batch["frames"], batch["faces"], batch["audio"], batch["mfcc"])

    def train_step(self, state: TrainState, batch, rng):
        weights = jnp.asarray(ASD_CLASS_WEIGHTS)

        def loss_fn(params):
            full = merge_trees(state.frozen, params) if state.frozen else params
            logits, mutated = state.apply_fn(
                {"params": full, "batch_stats": state.batch_stats},
                *self._model_inputs(batch), train=True,
                mutable=["batch_stats"], rngs={"dropout": rng},
            )
            labels = batch["labels"].reshape(-1)  # (B·T,)
            labels = labels[: logits.shape[0]]
            logp = jax.nn.log_softmax(logits, axis=-1)
            picked = jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
            w = weights[labels]
            loss = -(w * picked).sum() / w.sum()
            return loss, (mutated, logits, labels)

        (loss, (mutated, logits, labels)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads)
        state = state.replace(batch_stats=mutated["batch_stats"])
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return state, {"loss": loss, "acc": acc}

    def eval_step(self, state: TrainState, batch):
        full = merge_trees(state.frozen, state.params) if state.frozen \
            else state.params
        logits = state.apply_fn(
            {"params": full, "batch_stats": state.batch_stats},
            *self._model_inputs(batch), train=False)
        b, t = batch["labels"].shape
        labels = batch["labels"].reshape(-1)[: logits.shape[0]]
        correct = (jnp.argmax(logits, -1) == labels).astype(jnp.int32)
        per_item = correct.reshape(b, -1).sum(axis=1)
        totals = jnp.full((b,), correct.shape[0] // b, jnp.int32)
        return {"correct": per_item, "total": totals,
                "scores": jax.nn.softmax(logits, -1)[:, 1]}

    def _dataset(self, split):
        c = self.cfg
        return AsdTrialDataset(c.data_root, split=split, with_rgb=True,
                               rgb_size=c.get("rgb_size", 224))

    def train_loader(self):
        c = self.cfg
        return BucketBatchLoader(self._dataset("train"),
                                 frames_budget=c.batch_size,
                                 buckets=ASD_BUCKETS, mode="train",
                                 seed=c.seed, num_workers=c.num_workers,
                                 batch_divisor=self.batch_divisor)

    def val_loader(self):
        c = self.cfg
        return BucketBatchLoader(self._dataset("val"),
                                 frames_budget=c.batch_size,
                                 buckets=ASD_BUCKETS, mode="eval",
                                 num_workers=c.num_workers,
                                 batch_divisor=self.batch_divisor)
