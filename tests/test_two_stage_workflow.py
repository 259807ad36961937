"""End-to-end two-stage CLI workflow (the EgoT2 paper in miniature).

Reference flow (/root/reference/README.md:175-196): train Stage-I
task-specific models, then launch Stage-II task translation with
``run_ttm.py --two_loader --lam_checkpoint ... --ttm_checkpoint ...
--asd_checkpoint ...``; the translator built on frozen Stage-I
backbones should match or beat the single-task finetune.

This test drives the REAL CLIs in-process on synthetic fixtures:

  1. Stage-I LAM (run_lam, BaselineLSTM), TTM (run_ttm,
     TTMBaselineLSTM — doubling as the FinetuneTTM baseline), and ASD
     (run_asd, TalkNetWithHeads) each train for a few epochs and write
     Trainer checkpoints.
  2. The grafted Stage-II init is checked BIT-EXACT: every leaf of the
     frozen lam/ttm trunk + asd TalkNet subtrees equals the Stage-I
     checkpoint values (params and batch_stats).
  3. Stage-II ``run_ttm --two_loader`` trains the 3-task translator
     from those checkpoints on a separable TTM fixture and must reach
     val mAP >= the Stage-I TTM finetune's val mAP (the paper's claim
     in miniature), exercising grafting + CLIs + metrics together.
"""

import os

import jax
import numpy as np
import pytest

from egot2x.core.checkpoint import latest_epoch_dir, restore_tree
from egot2x.data.synthetic import (make_asd_fixture, make_lam_fixture,
                                   make_ttm_fixture)

pytestmark = pytest.mark.slow


def _leaves_with_path(tree):
    return {jax.tree_util.keystr(p): np.asarray(v)
            for p, v in jax.tree_util.tree_leaves_with_path(tree)}


def _assert_tree_equal(actual, expected, where):
    a, e = _leaves_with_path(actual), _leaves_with_path(expected)
    assert a.keys() == e.keys(), where
    for k in e:
        np.testing.assert_array_equal(a[k], e[k], err_msg=f"{where}{k}")


def test_two_stage_cli_workflow(tmp_path, monkeypatch):
    from egot2x.cli import run_asd, run_lam, run_ttm

    monkeypatch.chdir(tmp_path)  # CLIs write logs/<task>/<output_dir>/
    lam_root = make_lam_fixture(str(tmp_path / "lam"), img_size=16)
    # ONE bucket of same-length segments with a label-correlated
    # brightness signal: genuinely separable train AND val (see
    # make_ttm_fixture docstring) so both Stage-II and the finetune
    # baseline converge to rail scores and the mAP comparison is
    # deterministic, not tie-break noise
    ttm_root = make_ttm_fixture(str(tmp_path / "ttm"), img_size=16,
                                seg_lens=[25] * 8, label_signal=60.0)
    asd_root = make_asd_fixture(str(tmp_path / "asd"), img_size=32)

    # ---- Stage I: three task-specific models via their real CLIs ----
    run_lam.main([
        "--data_root", lam_root, "--img_size", "16", "--train_stride", "1",
        "--val_stride", "1", "--epochs", "1", "--batch_size", "8",
        "--num_workers", "2", "--output_dir", "s1",
    ])
    ttm_metrics = run_ttm.main([
        "--data_root", ttm_root, "--img_size", "16", "--model",
        "TTMBaselineLSTM", "--epochs", "8", "--batch_size", "50",
        "--num_workers", "2", "--lr", "3e-3", "--weights", "0.5", "0.5",
        "--output_dir", "s1",
    ])
    run_asd.main([
        "--data_file_path", asd_root, "--epochs", "1", "--batch_size", "60",
        "--num_workers", "2", "--output_dir", "s1",
    ])
    lam_ck = os.path.join("logs", "lam", "s1", "checkpoints")
    ttm_ck = os.path.join("logs", "ttm", "s1", "checkpoints")
    asd_ck = os.path.join("logs", "asd", "s1", "checkpoints")
    for ck in (lam_ck, ttm_ck, asd_ck):
        assert os.path.exists(os.path.join(ck, "last.json")), ck

    # ---- grafted Stage-II init is bit-exact vs the Stage-I ckpts ----
    from egot2x.core.config import Config
    from egot2x.tasks.ttm_2loader import TalkingToMe2Loader

    cfg = Config(data_root=ttm_root, model="TaskFusionMFTransformer3Task",
                 weights=[0.5, 0.5], lr=3e-3, wd=0.0, batch_size=50,
                 num_workers=2, img_size=16, seed=0, hidden_dim=32,
                 num_layers=1, num_heads=4, dropout=0.0, nofreeze=False,
                 lam_checkpoint=lam_ck, ttm_checkpoint=ttm_ck,
                 asd_checkpoint=asd_ck)
    state = TalkingToMe2Loader(cfg).build_state(jax.random.key(0))
    for key, ck, src in (("lam_model", lam_ck, "trunk"),
                         ("ttm_model", ttm_ck, "trunk"),
                         ("asd_model", asd_ck, "talknet")):
        s1 = restore_tree(latest_epoch_dir(ck))
        frozen = state.frozen[key]
        tgt_p = frozen["trunk"] if src == "trunk" else frozen
        _assert_tree_equal(tgt_p, s1["params"][src], f"{key} params ")
        s1_stats = (s1.get("batch_stats") or {}).get(src)
        if s1_stats:
            tgt_s = state.batch_stats[key]
            if src == "trunk" and "trunk" in tgt_s:
                tgt_s = tgt_s["trunk"]
            _assert_tree_equal(tgt_s, s1_stats, f"{key} batch_stats ")

    # ---- Stage II: the translator CLI run the reference documents ----
    ts_metrics = run_ttm.main([
        "--two_loader", "--model", "TaskFusionMFTransformer3Task",
        "--data_root", ttm_root, "--img_size", "16", "--epochs", "8",
        "--batch_size", "50", "--num_workers", "2", "--lr", "3e-3",
        "--weights", "0.5", "0.5", "--hidden_dim", "32",
        "--num_layers", "1", "--num_heads", "4", "--dropout", "0.0",
        "--lam_checkpoint", lam_ck, "--ttm_checkpoint", ttm_ck,
        "--asd_checkpoint", asd_ck, "--output_dir", "s2",
    ])

    # the paper's claim in miniature: task translation >= single-task
    # finetune on the separable fixture (both saturate at mAP 1.0)
    assert ttm_metrics["val_mAP"] > 0.99, ttm_metrics
    assert ts_metrics["val_mAP"] >= ttm_metrics["val_mAP"], (
        ts_metrics, ttm_metrics)
