"""Checkpoint utilities: Orbax trees + Stage-I → Stage-II grafting.

The reference's rich load-side machinery (SURVEY.md §5: strip-``module.``
loaders, ``load_ckpt``/``load_parameters``, backbone-submodule grafting
at translator construction, HHI/utils/utils.py:21-73,
HOI/utils/multitask/load_model.py:10-116) maps here to pytree surgery:
restore a Stage-I checkpoint tree and graft its params/batch_stats
subtrees into a Stage-II translator's variables under the backbone key.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_tree(path: str, tree: Any) -> None:
    _checkpointer().save(os.path.abspath(path), tree, force=True)


def restore_tree(path: str) -> Any:
    return _checkpointer().restore(os.path.abspath(path))


def latest_epoch_dir(ckpt_root: str) -> str:
    """Resolve a Trainer checkpoint directory (.../checkpoints or a
    specific .../epoch_N) to the epoch dir recorded in last.json."""
    import json

    if os.path.basename(ckpt_root).startswith("epoch_"):
        return ckpt_root
    last = os.path.join(ckpt_root, "last.json")
    with open(last) as f:
        epoch = json.load(f)["epoch"]
    return os.path.join(ckpt_root, f"epoch_{epoch}")


def _set_subtree(tree: Dict, key: str, value: Any) -> Dict:
    out = dict(tree)
    out[key] = value
    return out


def graft_backbone(
    variables: Dict[str, Any],
    backbone_key: str,
    stage1_ckpt: str,
    params_src: Optional[str] = None,
) -> Dict[str, Any]:
    """Load a Stage-I Trainer checkpoint and graft it into ``variables``
    under ``backbone_key`` (e.g. 'lam_model').

    params_src: subtree key inside the stage-I params that corresponds to
    the backbone module ('trunk' for LAM/TTM BaselineLSTM, 'talknet' for
    TalkNetWithHeads, None = whole params tree).
    """
    state = restore_tree(latest_epoch_dir(stage1_ckpt))
    src_params = state["params"]
    src_stats = state.get("batch_stats", {}) or {}
    if params_src is not None:
        src_params = src_params[params_src]
        src_stats = src_stats.get(params_src, {}) if src_stats else {}

    out = dict(variables)
    params = dict(out["params"])
    tgt = params[backbone_key]
    # LAM/TTM backbones wrap the trunk under the same 'trunk' key; TalkNet
    # grafts the whole module tree.
    if params_src in ("trunk",) and "trunk" in tgt:
        params[backbone_key] = _set_subtree(tgt, "trunk", src_params)
    else:
        params[backbone_key] = src_params
    out["params"] = params
    if src_stats:
        stats = dict(out.get("batch_stats", {}))
        tgt_stats = stats.get(backbone_key, {})
        if params_src in ("trunk",) and "trunk" in tgt_stats:
            stats[backbone_key] = _set_subtree(tgt_stats, "trunk", src_stats)
        else:
            stats[backbone_key] = src_stats
        out["batch_stats"] = stats
    return out


def assert_tree_shapes_match(a: Any, b: Any, prefix: str = "") -> None:
    """Raise with the offending path if two pytrees differ in structure/shape."""
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = {jax.tree_util.keystr(p): v for p, v in jax.tree_util.tree_leaves_with_path(b)}
    for p, v in la:
        k = jax.tree_util.keystr(p)
        if k not in lb:
            raise ValueError(f"{prefix}missing leaf {k}")
        if np.shape(v) != np.shape(lb[k]):
            raise ValueError(
                f"{prefix}shape mismatch at {k}: {np.shape(v)} vs {np.shape(lb[k])}"
            )
