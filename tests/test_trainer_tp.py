"""Round-2 trainer hardening: tensor-parallel fit, precise BN hook,
checkpoint last-pointer survival (VERDICT r1 items #8/#9, ADVICE #2)."""

import jax
import numpy as np
import pytest

from egot2x.core.config import Config
from egot2x.data.synthetic import make_lam_fixture


@pytest.fixture(scope="module")
def lam_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("lam_tp")
    return make_lam_fixture(str(root), img_size=32)


def small_cfg(root):
    return Config(
        data_root=root, model="BaselineLSTM", weights=[0.136, 0.864],
        lr=1e-3, batch_size=8, num_workers=2, img_size=32,
        train_stride=1, val_stride=1, seed=0,
    )


def test_trainer_fit_model_parallel(lam_root, tmp_path):
    """Trainer.fit with model_parallel shards wide kernels over the
    model axis and still trains (the dryrun's sharding now lives in the
    Trainer, VERDICT r1 item #8)."""
    from egot2x.core.mesh import make_mesh
    from egot2x.tasks.lam import LookingAtMe
    from egot2x.train.trainer import Trainer

    task = LookingAtMe(small_cfg(lam_root))
    mesh = make_mesh(model=2)
    trainer = Trainer(task, max_epochs=1, fast_dev_run=True,
                      default_root_dir=str(tmp_path / "logs"), mesh=mesh,
                      log_every=1, model_parallel=True)
    state = trainer.fit()
    leaves = jax.tree_util.tree_leaves(state.params)
    n_sharded = sum(1 for l in leaves if not l.sharding.is_fully_replicated)
    assert n_sharded > 0, "expected model-axis-sharded params after fit"
    metrics = trainer.validate(state)
    assert np.isfinite(metrics["val_mAP"])


def test_tp_matches_dp_loss(lam_root, tmp_path):
    """One TP train step produces the same loss as pure DP."""
    from egot2x.core.mesh import (batch_sharding, make_mesh,
                                  shard_train_state)
    from egot2x.tasks.lam import LookingAtMe

    task = LookingAtMe(small_cfg(lam_root))
    batch_np = {
        "frames": np.random.default_rng(0).standard_normal(
            (8, 7, 32, 32, 3)).astype(np.float32),
        "label": np.zeros(8, dtype=np.int64),
    }
    losses = []
    for model in (1, 2):
        mesh = make_mesh(model=model)
        state = task.build_state(jax.random.key(0))
        state = shard_train_state(state, mesh, model_parallel=model > 1)
        sh = batch_sharding(mesh)
        batch = {k: jax.device_put(v, sh) for k, v in batch_np.items()}
        _, metrics = jax.jit(task.train_step, donate_argnums=0)(
            state, batch, jax.random.key(1))
        losses.append(float(metrics["loss"]))
    assert abs(losses[0] - losses[1]) < 1e-4


def test_precise_bn_hook(lam_root, tmp_path):
    """The precise-BN Trainer hook recomputes BN running stats from
    train batches (reference BN.USE_PRECISE_STATS)."""
    from egot2x.tasks.lam import LookingAtMe
    from egot2x.train.trainer import Trainer

    task = LookingAtMe(small_cfg(lam_root))
    trainer = Trainer(task, max_epochs=1, fast_dev_run=True,
                      default_root_dir=str(tmp_path / "logs"),
                      precise_bn_batches=2)
    state = task.build_state(jax.random.key(0))
    new_state = trainer._run_precise_bn(state)
    before = jax.tree_util.tree_leaves(state.batch_stats)
    after = jax.tree_util.tree_leaves(new_state.batch_stats)
    changed = any(not np.allclose(np.asarray(a), np.asarray(b))
                  for a, b in zip(before, after))
    assert changed, "precise BN left every running stat untouched"


def test_checkpoint_keeps_last_when_not_topk(tmp_path):
    """A just-saved epoch that ranks below top_k must survive pruning so
    last.json stays restorable (ADVICE r1 #2)."""
    import os

    from egot2x.tasks.lam import LookingAtMe
    from egot2x.train.trainer import CheckpointManager

    class _FakeState:
        def __init__(self, v):
            self.step = np.zeros((), np.int32)
            self.params = {"w": np.full(3, v, np.float32)}
            self.frozen = {}
            self.batch_stats = {}
            self.opt_state = {}

        def replace(self, **kw):
            for k, v in kw.items():
                setattr(self, k, v)
            return self

    mgr = CheckpointManager(str(tmp_path / "ck"), "val_mAP", mode="max",
                            top_k=2)
    # epochs 0,1 score high; epochs 2..4 non-improving
    scores = [0.9, 0.8, 0.1, 0.1, 0.1]
    for e, s in enumerate(scores):
        mgr.save(_FakeState(float(e)), e, {"val_mAP": s})
        # the just-saved epoch must always be on disk
        assert os.path.isdir(str(tmp_path / "ck" / f"epoch_{e}")), e
    # last.json points at epoch 4 and restores
    restored = mgr.restore(_FakeState(-1.0))
    assert restored.params["w"][0] == 4.0
    # top-k (0, 1) kept; intermediate non-improving epochs pruned
    assert os.path.isdir(str(tmp_path / "ck" / "epoch_0"))
    assert os.path.isdir(str(tmp_path / "ck" / "epoch_1"))
    assert not os.path.isdir(str(tmp_path / "ck" / "epoch_2"))
    assert not os.path.isdir(str(tmp_path / "ck" / "epoch_3"))
