"""HOI EgoT2-g task: unified 6-task label-token translation.

Behavioral reference: HOI/tasks/multitask/video_task.py:527-784
(``Unified6TaskTranslation``) — CombinedLoader over {pnr/oscc, action,
lta} aux-datasets; per step six teacher-forced decodes (pnr, oscc,
action_verb, action_noun, lta_verb, lta_noun), loss =
Σ ratio_i · CE(tokens); validation runs greedy ``predict`` per task and
scores through *vocab-subset* metrics: the argmax is taken over only
the task's legal tokens ('0'..'15' for pnr, True/False for oscc,
verb/noun name ids for action/lta), mirroring
PNRMetric/OSCCMetric/ARMetric/LTAMetric
(HOI/evaluation/pnr/metrics.py:139-257, lta_metrics.py:164-310).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from egot2x.core.registry import build_model
from egot2x.data.combined import CombinedLoader
from egot2x.data.hoi_2task import (
    LtaSeqDataset,
    PnrSeqDataset,
    RecognitionSeqDataset,
)
from egot2x.data.pipeline import BatchLoader
from egot2x.tasks.base import Task
from egot2x.tasks.multitask_hhi import seq_ce
from egot2x.train.optim import construct_optimizer
from egot2x.train.state import TrainState, merge_trees, split_params
from egot2x.translate.egot2g import HOI_G_FROZEN_KEYS
from egot2x.translate.vocab import (
    build_hoi_vocab,
    build_hoi_vocab_task12,
    map_label_to_action,
)

import egot2x.translate.egot2g  # noqa: F401

# (source batch name, target key, task string passed to the model)
DECODES = [
    ("pnr", "target_pnr", "pnr"),
    ("pnr", "target_oscc", "oscc"),
    ("action", "target_verb", "action"),
    ("action", "target_noun", "action"),
    ("lta", "target_verb", "lta"),
    ("lta", "target_noun", "lta"),
]


class Unified6TaskTranslation(Task):
    checkpoint_metric = "val_loss"
    checkpoint_mode = "min"
    # subset selection (reference tasks unify3task/unify4task/pnr_only/
    # oscc_only/... — HOI/scripts/multitask/run.py:18-62). Sources gate
    # the loaders; decode_rows gate which decodes train/validate.
    active_sources = ("pnr", "action", "lta")
    decode_rows = tuple(DECODES)

    def _active_decodes(self):
        return [r for r in self.decode_rows if r[0] in self.active_sources]

    def __init__(self, cfg):
        import os

        self.cfg = cfg
        tax = cfg.get("taxonomy") or os.path.join(cfg.lta_root,
                                                  "fho_lta_taxonomy.json")
        self.vocab = self._build_vocab(tax)
        self.verb_dict, self.noun_dict = map_label_to_action(tax)
        self.ratios = cfg.get("loss_ratios", [1.0] * 6)
        self.model = self._build_model(cfg)
        # vocab subsets for metric-time argmax restriction
        self.subsets = {
            "pnr": np.asarray([self.vocab[str(i)] for i in range(16)]),
            "oscc": np.asarray([self.vocab["False"], self.vocab["True"]]),
            "verb": np.unique([self.vocab[v] for v in self.verb_dict.values()]),
            "noun": np.unique([self.vocab[n] for n in self.noun_dict.values()]),
        }

    # -- model/vocab hooks (overridden by the dedicated subset tasks) -------
    def _build_vocab(self, taxonomy_path):
        return build_hoi_vocab(taxonomy_path)

    def _build_model(self, cfg):
        return build_model(
            "TaskTranslationPromptTransformer6Task",
            vocab_size=len(self.vocab),
            hidden_dim=cfg.get("hidden_dim", 256),
            num_heads=cfg.get("num_heads", 4),
            num_layers=cfg.get("num_layers", 3),
            dropout=cfg.get("dropout", 0.1),
            crop_size=cfg.get("pnr_crop", 225),
            alpha=cfg.get("alpha", 8),
            beta_inv=cfg.get("beta_inv", 8),
            feature_dim=cfg.get("lta_feature_dim", 2048),
            joint_bos=self.vocab["<unk>"],
        )

    # -- data ---------------------------------------------------------------
    def _loaders(self, split):
        c = self.cfg
        mode = "train" if split == "train" else "eval"
        common = dict(num_frames=c.get("num_frames", 32), alpha=c.get("alpha", 8),
                      crop_size=c.get("crop_size", 224),
                      pnr_frames=c.get("pnr_frames", 16),
                      pnr_crop=c.get("pnr_crop", 225), seed=c.seed)
        pnr = BatchLoader(
            PnrSeqDataset(self.vocab, c.pnr_root, split=split,
                          crop_size=c.get("pnr_crop", 225),
                          aux_num_frames=c.get("num_frames", 32),
                          aux_alpha=c.get("alpha", 8),
                          aux_crop=c.get("crop_size", 224)),
            self.shardable_batch(c.get("pnr_batch", 2)), mode=mode, seed=c.seed,
            num_workers=c.num_workers)
        action = BatchLoader(
            RecognitionSeqDataset(self.vocab, self.verb_dict, self.noun_dict,
                                  c.lta_root, split=split, **common),
            self.shardable_batch(c.get("action_batch", 2)), mode=mode, seed=c.seed,
            num_workers=c.num_workers)
        lta = BatchLoader(
            LtaSeqDataset(self.vocab, self.verb_dict, self.noun_dict,
                          c.lta_root, split=split,
                          num_input_clips=c.get("num_input_clips", 2),
                          num_actions=c.get("num_actions", 20), **common),
            self.shardable_batch(c.get("lta_batch", 2)), mode=mode, seed=c.seed,
            num_workers=c.num_workers)
        loaders = {"pnr": pnr, "action": action, "lta": lta}
        return {k: v for k, v in loaders.items() if k in self.active_sources}

    def train_loader(self):
        return CombinedLoader(self._loaders("train"))

    def val_loader(self):
        return CombinedLoader(self._loaders("val"))

    # -- model args ---------------------------------------------------------
    def _model_args(self, src, batch, task):
        if src == "lta":
            pathways = [batch["slow"], batch["fast"]]  # (B, N, ...)
            return (batch["frames_pnr"], pathways)
        pathways = [batch["slow"], batch["fast"]]
        return (batch["frames"] if src == "pnr" else batch["frames_pnr"],
                pathways)

    def build_state(self, rng: jax.Array) -> TrainState:
        c = self.cfg
        s = c.get("crop_size", 224)
        ps = c.get("pnr_crop", 225)
        t = c.get("num_frames", 32)
        a = c.get("alpha", 8)
        n = c.get("num_input_clips", 2)
        frames = jnp.zeros((1, c.get("pnr_frames", 16), ps, ps, 3), jnp.float32)
        pathways = [jnp.zeros((1, t // a, s, s, 3), jnp.float32),
                    jnp.zeros((1, t, s, s, 3), jnp.float32)]
        lta_frames = jnp.zeros((1, n, c.get("pnr_frames", 16), ps, ps, 3),
                               jnp.float32)
        lta_pathways = [jnp.zeros((1, n, t // a, s, s, 3), jnp.float32),
                        jnp.zeros((1, n, t, s, s, 3), jnp.float32)]
        tgt = jnp.zeros((1, 2), jnp.int32)
        # init one model-graph variant per active source family and
        # merge: the lta branch has extra submodules, and the dedicated
        # subset models (2Task / ActionTask) reject shapes for sources
        # they do not build backbones for
        inits = []
        if "pnr" in self.active_sources:
            inits.append((frames, pathways, "pnr"))
        elif "action" in self.active_sources:
            inits.append((frames, pathways, "action"))
        if "lta" in self.active_sources:
            inits.append((lta_frames, lta_pathways, "lta"))
        variables = None
        for f, pw, tname in inits:
            v = self.model.init(rng, f, pw, tgt, tname, train=False)
            variables = (dict(v) if variables is None else
                         merge_trees(v, dict(variables)))
        trainable, frozen = split_params(
            variables["params"], lambda k: k in HOI_G_FROZEN_KEYS
            or k in ("action_model", "lta_backbone", "lta_aggregator"))
        tx = construct_optimizer(trainable, method="adam", lr=c.lr)
        return TrainState.create(
            apply_fn=self.model.apply, params=trainable, frozen=frozen, tx=tx,
            batch_stats=variables.get("batch_stats", {}),
        )

    # -- steps --------------------------------------------------------------
    def train_step(self, state: TrainState, batches, rng):
        def loss_fn(params):
            full = merge_trees(state.frozen, params) if state.frozen else params
            variables = {"params": full, "batch_stats": state.batch_stats}
            total = 0.0
            for di, row in enumerate(self._active_decodes()):
                src, tkey, task = row
                batch = batches[src]
                tgt = batch[tkey]
                logits = state.apply_fn(
                    variables, *self._model_args(src, batch, task),
                    tgt[:, :-1], task, train=True,
                    rngs={"dropout": jax.random.fold_in(rng, di)},
                )
                # loss_ratios index the GLOBAL six-decode list, so a
                # subset task keeps each decode's configured weight
                # (rows outside DECODES — e.g. task12's joint action
                # decode — fall back to their local position)
                gi = DECODES.index(row) if row in DECODES else di
                ratio = self.ratios[gi] if gi < len(self.ratios) else 1.0
                total = total + ratio * seq_ce(logits, tgt[:, 1:])
            return total

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        state = state.apply_gradients(grads)
        return state, {"loss": loss}

    def eval_step(self, state: TrainState, batches):
        variables = state.variables()
        out = {}
        rows = self._active_decodes()
        names = {task for _, _, task in rows}
        # pnr/oscc: 1-step predict over full vocab
        for task in ("pnr", "oscc"):
            if task in names:
                out[task] = state.apply_fn(
                    variables, *self._model_args("pnr", batches["pnr"], task),
                    task, method="predict")
        if "action_joint" in names:
            # combined [action] verb noun decode (reference unify3task)
            preds = state.apply_fn(
                variables, *self._model_args("action", batches["action"],
                                             "action_joint"),
                "action_joint", method="predict")
            out["action_verb"] = preds["verb"]
            out["action_noun"] = preds["noun"]
        for src, task in (("action", "action"), ("lta", "lta")):
            if task not in names:
                continue
            preds = state.apply_fn(
                variables, *self._model_args(src, batches[src], task), task,
                method="predict")
            out[f"{task}_verb"] = preds["verb"]
            out[f"{task}_noun"] = preds["noun"]
        # teacher-forced loss — ratios index the GLOBAL decode list so
        # val_loss weights match the train objective for subset tasks
        total = 0.0
        for di, row in enumerate(rows):
            src, tkey, task = row
            batch = batches[src]
            tgt = batch[tkey]
            logits = state.apply_fn(
                variables, *self._model_args(src, batch, task), tgt[:, :-1],
                task, train=False)
            gi = DECODES.index(row) if row in DECODES else di
            ratio = self.ratios[gi] if gi < len(self.ratios) else 1.0
            total = total + ratio * seq_ce(logits, tgt[:, 1:])
        out["loss"] = total
        return out

    # -- validation ---------------------------------------------------------
    # Mirrors PNRMetric/OSCCMetric/ARMetric/LTAMetric
    # (HOI/evaluation/pnr/metrics.py:139-257, lta_metrics.py:164-310):
    # out-of-subset rate from the FULL-vocab argmax, accuracy from the
    # subset argmax, PNR keyframe localization error in SECONDS, and
    # unique-id dedup of samples repeated by max_size_cycle. (The
    # reference's compute() has its dedup `continue` commented out —
    # :200, :256 — so it only *logs* duplicates; we apply the intended
    # dedup by keeping each unique id's first occurrence.)
    def start_validation(self):
        return {"correct": defaultdict(int), "total": defaultdict(int),
                "oos": defaultdict(int), "loc_err": [], "loss": [],
                "seen": defaultdict(set)}

    def _subset_argmax(self, logits, subset):
        return subset[np.argmax(logits[:, subset], axis=-1)]

    @staticmethod
    def _fresh(ctx, key, uids):
        """Dedup mask: True where uid not seen before (first wins)."""
        mask = []
        for uid in uids:
            uid = str(uid)
            mask.append(uid not in ctx["seen"][key])
            ctx["seen"][key].add(uid)
        return np.asarray(mask, dtype=bool)

    def accumulate(self, ctx, outputs, batches):
        ctx["loss"].append(float(np.asarray(outputs["loss"])))
        pnr_batch = batches.get("pnr")
        for task, tkey in (("pnr", "target_pnr"), ("oscc", "target_oscc")):
            if task not in outputs:
                continue
            logits = np.asarray(outputs[task])
            subset = self.subsets["pnr" if task == "pnr" else "oscc"]
            keep = self._fresh(ctx, task, pnr_batch["unique_id"])
            full_pred = np.argmax(logits, axis=-1)
            ctx["oos"][task] += int((~np.isin(full_pred, subset))[keep].sum())
            pred_tok = self._subset_argmax(logits, subset)
            gold_tok = np.asarray(pnr_batch[tkey])[:, 1]
            ctx["correct"][task] += int((pred_tok == gold_tok)[keep].sum())
            ctx["total"][task] += int(keep.sum())
            if task == "pnr":
                # keyframe localization error in seconds
                # (PNRMetric.update, metrics.py:170-188)
                pred_idx = np.argmax(logits[:, subset], axis=-1)
                start = np.asarray(pnr_batch["clip_start_frame"], np.float64)
                end = np.asarray(pnr_batch["clip_end_frame"], np.float64)
                fps = np.asarray(pnr_batch["fps"], np.float64)
                pnr_frame = np.asarray(pnr_batch["pnr_frame"], np.float64)
                mapped = (end - start) / 16.0 * pred_idx
                gt = pnr_frame - start
                err_sec = np.abs(mapped - gt) / np.maximum(fps, 1e-6)
                valid = keep & (pnr_frame >= 0)
                ctx["loc_err"].extend(err_sec[valid].tolist())
        for src in ("action", "lta"):
            if f"{src}_verb" not in outputs:
                continue
            batch = batches[src]
            keep = (self._fresh(ctx, src, batch["clip_uid"])
                    if src == "lta" else
                    np.ones(len(batch["clip_uid"]), dtype=bool))
            for sub in ("verb", "noun"):
                logits = np.asarray(outputs[f"{src}_{sub}"])
                subset = self.subsets[sub]
                full_pred = np.argmax(logits, axis=-1)
                key = f"{src}_{sub}"
                ctx["oos"][key] += int((~np.isin(full_pred, subset))[keep].sum())
                pred_tok = self._subset_argmax(logits, subset)
                gold_tok = np.asarray(batch[f"target_{sub}"])[:, 1]
                ctx["correct"][key] += int((pred_tok == gold_tok)[keep].sum())
                ctx["total"][key] += int(keep.sum())

    def finalize_validation(self, ctx) -> Dict[str, float]:
        out = {"val_loss": float(np.mean(ctx["loss"])) if ctx["loss"] else 0.0}
        for key in ctx["total"]:
            n = max(ctx["total"][key], 1)
            out[f"val_{key}_acc"] = ctx["correct"][key] / n
            out[f"val_{key}_oos_rate"] = ctx["oos"][key] / n
        if ctx["loc_err"]:
            out["val_pnr_loc_err_sec"] = float(np.mean(ctx["loc_err"]))
        return out


class Unified3TaskTranslation(Unified6TaskTranslation):
    """pnr + oscc + ONE combined action decode (reference unify3task,
    video_task.py:169-203: target_seq = [<action>, verb, noun, </s>]
    via Ego4dRecognitionwithAuxTaskSequenceLabel — note the reference
    vocab has no 'action' token, so torchtext's default_index maps the
    BOS prompt to <unk>; our Vocab mirrors that)."""

    active_sources = ("pnr", "action")
    decode_rows = (
        ("pnr", "target_pnr", "pnr"),
        ("pnr", "target_oscc", "oscc"),
        ("action", "target_action", "action_joint"),
    )


class Unified4TaskTranslation(Unified6TaskTranslation):
    """pnr + oscc + separate action verb/noun decodes (reference
    unify4task, video_task.py:342-525)."""

    active_sources = ("pnr", "action")


class Unified4TaskTranslationAction(Unified6TaskTranslation):
    """action + lta verb/noun decodes via the DEDICATED 2-stream prompt
    model (reference unify4taskaction, video_task_action.py:19-31 →
    TaskTranslationPromptTransformer[Temporal]ActionTask,
    video_model_builder_action.py:21-215): only the AR/LTA backbones
    are built, so the parameter tree matches reference action-task
    checkpoints shape-exact. ``cfg.action_model_variant`` mirrors the
    reference ``args.model`` switch ('temporal' → the 2+2-token
    temporal variant, the usable default at hidden_dim 256)."""

    active_sources = ("action", "lta")

    def _build_model(self, cfg):
        return build_model(
            "TaskTranslationPromptTransformerActionTask",
            vocab_size=len(self.vocab),
            hidden_dim=cfg.get("hidden_dim", 256),
            num_heads=cfg.get("num_heads", 4),
            num_layers=cfg.get("num_layers", 3),
            dropout=cfg.get("dropout", 0.1),
            alpha=cfg.get("alpha", 8),
            beta_inv=cfg.get("beta_inv", 8),
            feature_dim=cfg.get("lta_feature_dim", 2048),
            temporal=cfg.get("action_model_variant", "temporal") == "temporal",
        )


class Task12Translation(Unified6TaskTranslation):
    """pnr + oscc only through the DEDICATED 2-backbone prompt model and
    the reduced 22-token vocab (reference task12,
    video_task_separate.py:298-306 → TaskTranslationPromptTransformer2Task,
    video_model_builder_2task.py:51-166): no SlowFast/LTA backbones are
    constructed, so compile time and parameters match the reference and
    its checkpoints import shape-exact."""

    active_sources = ("pnr",)

    def _build_vocab(self, taxonomy_path):
        return build_hoi_vocab_task12()

    def _build_model(self, cfg):
        return build_model(
            "TaskTranslationPromptTransformer2Task",
            vocab_size=len(self.vocab),
            hidden_dim=cfg.get("hidden_dim", 256),
            num_heads=cfg.get("num_heads", 4),
            num_layers=cfg.get("num_layers", 3),
            dropout=cfg.get("dropout", 0.1),
            crop_size=cfg.get("pnr_crop", 225),
        )


class PnrOnlyTaskTranslation(Unified6TaskTranslation):
    """Single pnr decode (reference pnr_only,
    video_task_separate.py:24-115)."""

    active_sources = ("pnr",)
    decode_rows = (("pnr", "target_pnr", "pnr"),)


class OsccOnlyTaskTranslation(Unified6TaskTranslation):
    """Single oscc decode (reference oscc_only,
    video_task_separate.py:117-208)."""

    active_sources = ("pnr",)
    decode_rows = (("pnr", "target_oscc", "oscc"),)


class ActionOnlyTranslation(Unified6TaskTranslation):
    """action decodes only (reference action_only)."""

    active_sources = ("action",)
