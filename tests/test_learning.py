"""End-to-end learning sanity: the LAM training step actually learns —
loss on a fixed batch drops substantially with repeated updates (catches
gradient/optimizer plumbing bugs that shape tests cannot)."""

import jax
import numpy as np

from egot2x.core.config import Config


def test_lam_overfits_fixed_batch(tmp_path):
    from egot2x.data.synthetic import make_lam_fixture
    from egot2x.data.lam import LamClipDataset
    from egot2x.data.pipeline import BatchLoader
    from egot2x.tasks.lam import LookingAtMe

    root = make_lam_fixture(str(tmp_path / "lam"), img_size=16)
    cfg = Config(data_root=root, model="BaselineLSTM", weights=[0.5, 0.5],
                 lr=3e-3, batch_size=8, num_workers=2, img_size=16,
                 train_stride=1, val_stride=1, seed=0)
    task = LookingAtMe(cfg)
    state = task.build_state(jax.random.key(0))
    ds = LamClipDataset(root, split="train", stride=1, img_size=16)
    batch = next(iter(BatchLoader(ds, 8, mode="train", num_workers=2)))
    dev = {k: v for k, v in batch.items()
           if isinstance(v, np.ndarray) and v.dtype.kind in "biufc"}
    step = jax.jit(task.train_step, donate_argnums=0)
    losses = []
    for i in range(25):
        state, metrics = step(state, dev, jax.random.key(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < 0.5 * losses[0], losses[::6]


def test_translator_overfits_with_frozen_backbones(tmp_path):
    """EgoT2-s 2-task translator: loss drops on a fixed batch while the
    frozen backbone subtree stays bit-identical."""
    from egot2x.data.synthetic import make_ttm_fixture
    from egot2x.tasks.ttm_2loader import TalkingToMe2Task

    root = make_ttm_fixture(str(tmp_path / "ttm"), img_size=16)
    cfg = Config(data_root=root, model="TaskFusionMFTransformer2Task",
                 weights=[0.5, 0.5], lr=3e-3, wd=0.0, batch_size=30,
                 num_workers=2, img_size=16, seed=0, hidden_dim=32,
                 num_layers=1, num_heads=4, dropout=0.0, nofreeze=False,
                 lam_checkpoint=None, ttm_checkpoint=None, asd_checkpoint=None)
    task = TalkingToMe2Task(cfg)
    state = task.build_state(jax.random.key(0))
    frozen_before = jax.tree_util.tree_map(np.asarray, state.frozen)
    batch = next(iter(task.train_loader()))
    dev = {k: v for k, v in batch.items()
           if isinstance(v, np.ndarray) and v.dtype.kind in "biufc"}
    step = jax.jit(task.train_step, donate_argnums=0)
    losses = []
    for i in range(20):
        state, metrics = step(state, dev, jax.random.key(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < 0.6 * losses[0], losses[::5]
    # frozen backbones untouched by training
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_leaves_with_path(frozen_before),
            jax.tree_util.tree_leaves_with_path(
                jax.tree_util.tree_map(np.asarray, state.frozen))):
        np.testing.assert_array_equal(a, b)
