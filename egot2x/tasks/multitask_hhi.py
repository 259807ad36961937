"""HHI EgoT2-g task: unified 3-task label-token translation.

Behavioral reference: HHI/tasks/multitask/video_tasktranslation.py:27-193
(``Unified3TaskTranslation``) — CombinedLoader over {lam, ttm, asd};
per step, one teacher-forced decode per task: loss = Σ_task
CE(model(streams, target[:, :-1], task), target[:, 1:]); validation runs
greedy ``predict`` per task and reports lam/ttm mAP-style accuracy and
asd frame accuracy. ``Unified3Task`` (video_task.py:27-183) is the
single-stream-encoding baseline using TaskPromptTransformer.

Static shapes: TTM/ASD use one fixed frame bucket so the combined step
compiles once.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from egot2x.core.checkpoint import graft_backbone
from egot2x.core.registry import build_model
from egot2x.data.asd import AsdSeqDataset
from egot2x.data.bucketing import BucketBatchLoader
from egot2x.data.combined import CombinedLoader
from egot2x.data.lam import LamSeqDataset
from egot2x.data.pipeline import BatchLoader
from egot2x.data.ttm_2task import TtmTwoTaskSeqDataset
from egot2x.metrics.map import run_evaluation
from egot2x.tasks.base import Task
from egot2x.train.optim import construct_optimizer
from egot2x.train.state import TrainState, merge_trees, split_params
from egot2x.translate.egot2g import HHI_G_FROZEN_KEYS
from egot2x.translate.vocab import build_hhi_vocab

import egot2x.translate.egot2g  # noqa: F401 — register models


def seq_ce(logits, targets):
    """CE over (B, S, V) logits vs (B, S) targets."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, targets[..., None], axis=-1))


class Unified3TaskTranslation(Task):
    checkpoint_metric = "val_loss"
    checkpoint_mode = "min"
    model_name = "TaskTranslationPromptTransformer"

    def __init__(self, cfg):
        self.cfg = cfg
        self.vocab = build_hhi_vocab()
        self.n_frames = int(cfg.get("mt_frames", 15))  # one fixed bucket
        self.model = build_model(
            self.model_name,
            vocab_size=len(self.vocab),
            hidden_dim=cfg.get("hidden_dim", 256),
            num_heads=cfg.get("num_heads", 4),
            num_layers=cfg.get("num_layers", 3),
            dropout=cfg.get("dropout", 0.1),
        )

    # -- data ---------------------------------------------------------------
    def _loaders(self, split):
        c = self.cfg
        mode = "train" if split == "train" else "eval"
        n = self.n_frames
        lam = BatchLoader(
            LamSeqDataset(self.vocab, c.lam_root, split=split, stride=1,
                          img_size=c.img_size),
            self.shardable_batch(c.get("lam_batch", 4)), mode=mode,
            seed=c.seed, num_workers=c.num_workers)
        ttm = BucketBatchLoader(
            TtmTwoTaskSeqDataset(self.vocab, c.ttm_root, split=split,
                                 img_size=c.img_size),
            frames_budget=c.get("ttm_budget", 2 * n), buckets=(n,),
            mode=mode, seed=c.seed, num_workers=c.num_workers,
            batch_divisor=self.batch_divisor)
        asd = BucketBatchLoader(
            AsdSeqDataset(self.vocab, c.asd_root, split=split, with_rgb=True,
                          rgb_size=c.img_size),
            frames_budget=c.get("asd_budget", 2 * n), buckets=(n,),
            mode=mode, seed=c.seed, num_workers=c.num_workers,
            batch_divisor=self.batch_divisor)
        return {"lam": lam, "ttm": ttm, "asd": asd}

    def train_loader(self):
        return CombinedLoader(self._loaders("train"))

    def val_loader(self):
        return CombinedLoader(self._loaders("val"))

    # -- state --------------------------------------------------------------
    def _sample_batches(self):
        c = self.cfg
        n = self.n_frames
        s = c.img_size
        wav = int(n / 30.0 * 16000)
        lam = {"frames": jnp.zeros((1, 7, s, s, 3), jnp.float32),
               "target_seq": jnp.zeros((1, 3), jnp.int32)}
        ttm = {"frames": jnp.zeros((1, n, s, s, 3), jnp.float32),
               "video_asd": jnp.zeros((1, n, 112, 112), jnp.float32),
               "audio": jnp.zeros((1, wav), jnp.float32),
               "audio_asd": jnp.zeros((1, 4 * n, 13), jnp.float32),
               "target_seq": jnp.zeros((1, 3), jnp.int32)}
        asd = {"frames": jnp.zeros((1, n, s, s, 3), jnp.float32),
               "faces": jnp.zeros((1, n, 112, 112), jnp.float32),
               "audio": jnp.zeros((1, wav), jnp.float32),
               "mfcc": jnp.zeros((1, 4 * n, 13), jnp.float32),
               "target_seq": jnp.zeros((1, n, 3), jnp.int32)}
        return lam, ttm, asd

    def _task_args(self, task, batch):
        """(video, video_asd, audio, audio_asd) for the prompt model."""
        if task == "lam":
            z = jnp.zeros((batch["frames"].shape[0], 1, 112, 112), jnp.float32)
            za = jnp.zeros((batch["frames"].shape[0], 4), jnp.float32)
            zm = jnp.zeros((batch["frames"].shape[0], 4, 13), jnp.float32)
            return (batch["frames"], z, za, zm)
        if task == "ttm":
            return (batch["frames"], batch["video_asd"], batch["audio"],
                    batch["audio_asd"])
        return (batch["frames"], batch["faces"], batch["audio"], batch["mfcc"])

    def build_state(self, rng: jax.Array) -> TrainState:
        c = self.cfg
        lam, ttm, asd = self._sample_batches()
        # initialize every task branch and merge: the single-stream
        # baseline (TaskPromptTransformer) only touches one backbone per
        # task, so a single init would leave the other branches without
        # parameters
        variables = dict(self.model.init(
            rng, *self._task_args("ttm", ttm), ttm["target_seq"][:, :-1],
            "ttm", train=False))
        for task, batch in (("lam", lam), ("asd", asd)):
            tgt = self._decode_target(task, batch)
            extra = self.model.init(rng, *self._task_args(task, batch),
                                    tgt[:, :-1], task, train=False)
            variables = merge_trees(dict(extra), variables)
        for key, flag, src in (
            ("lam_model", "lam_checkpoint", "trunk"),
            ("ttm_model", "ttm_checkpoint", "trunk"),
            ("asd_model", "asd_checkpoint", "talknet"),
        ):
            path = c.get(flag)
            if path and key in variables["params"]:
                variables = graft_backbone(variables, key, path, params_src=src)
        trainable, frozen = split_params(
            variables["params"], lambda k: k in HHI_G_FROZEN_KEYS)
        tx = construct_optimizer(trainable, method="adam", lr=c.lr)
        return TrainState.create(
            apply_fn=self.model.apply, params=trainable, frozen=frozen, tx=tx,
            batch_stats=variables.get("batch_stats", {}),
        )

    # -- steps --------------------------------------------------------------
    def _decode_target(self, task, batch):
        tgt = batch["target_seq"]
        if task == "asd":  # per-frame: (B, T, 3) → (B·T, 3)
            tgt = tgt.reshape(-1, tgt.shape[-1])
        return tgt

    def train_step(self, state: TrainState, batches, rng):
        def loss_fn(params):
            full = merge_trees(state.frozen, params) if state.frozen else params
            variables = {"params": full, "batch_stats": state.batch_stats}
            total = 0.0
            for ti, task in enumerate(("lam", "ttm", "asd")):
                batch = batches[task]
                tgt = self._decode_target(task, batch)
                logits = state.apply_fn(
                    variables, *self._task_args(task, batch), tgt[:, :-1], task,
                    train=True, rngs={"dropout": jax.random.fold_in(rng, ti)},
                )
                total = total + seq_ce(logits, tgt[:, 1:])
            return total

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        state = state.apply_gradients(grads)
        return state, {"loss": loss}

    def eval_step(self, state: TrainState, batches):
        variables = state.variables()
        out = {}
        for task in ("lam", "ttm", "asd"):
            batch = batches[task]
            logits2 = state.apply_fn(
                variables, *self._task_args(task, batch), task,
                method="predict")
            out[task] = logits2  # (B', 2) logits over ['0','1']
            tgt = self._decode_target(task, batch)
            tf_logits = state.apply_fn(
                variables, *self._task_args(task, batch), tgt[:, :-1], task,
                train=False)
            out[f"{task}_loss"] = seq_ce(tf_logits, tgt[:, 1:])
        return out

    # -- validation aggregation --------------------------------------------
    def start_validation(self):
        return {"correct": defaultdict(int), "total": defaultdict(int),
                "loss": [], "map": defaultdict(list)}

    def accumulate(self, ctx, outputs, batches):
        for task in ("lam", "ttm", "asd"):
            batch = batches[task]
            logits = np.asarray(outputs[task])
            tgt = np.asarray(batch["target_seq"])
            if task == "asd":
                labels = tgt.reshape(-1, 3)[:, 1]
            else:
                labels = tgt[:, 1]
            # vocab layout: '0' and '1' are the last two ids
            label01 = labels - (len(build_hhi_vocab()) - 2)
            pred = logits.argmax(axis=-1)
            ctx["correct"][task] += int((pred == label01).sum())
            ctx["total"][task] += len(pred)
            if task in ("lam", "ttm"):
                scores = np.exp(logits[:, 1]) / np.exp(logits).sum(axis=1)
                for i, s in enumerate(scores):
                    ctx["map"][task].append((int(label01[i]), float(s)))
            ctx["loss"].append(float(np.asarray(outputs[f"{task}_loss"])))

    def finalize_validation(self, ctx) -> Dict[str, float]:
        out = {"val_loss": float(np.mean(ctx["loss"])) if ctx["loss"] else 0.0}
        for task in ("lam", "ttm", "asd"):
            tot = max(ctx["total"][task], 1)
            out[f"val_{task}_acc"] = ctx["correct"][task] / tot
        for task in ("lam", "ttm"):
            rows = ctx["map"][task]
            if rows:
                # uids are assigned positionally AFTER the multi-host
                # context merge (base.merge_contexts concatenates the
                # per-process row lists): per-process synthetic uids
                # would collide across processes and run_evaluation's
                # uid-dedup would silently drop every process's rows
                # but one. Every row is a distinct sample here.
                labels, scores = zip(*rows)
                uids = [f"{task}{i}" for i in range(len(rows))]
                m, _ = run_evaluation(uids, np.asarray(labels),
                                      np.asarray(scores))
                out[f"val_{task}_mAP"] = m
        return out


class Unified3Task(Unified3TaskTranslation):
    """Single-task-encoding baseline (reference Unified3Task)."""

    model_name = "TaskPromptTransformer"
