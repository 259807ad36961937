"""LAM end-to-end slice tests: index building, padding, mAP math,
training/eval steps, and 8-device data-parallel execution."""

import os

import jax
import numpy as np
import pytest

from egot2x.core.config import Config
from egot2x.data.lam import LamClipDataset, interpolate_track, make_dataset, pad_video
from egot2x.data.pipeline import BatchLoader
from egot2x.data.synthetic import make_lam_fixture
from egot2x.metrics.map import compute_average_precision, run_evaluation


@pytest.fixture(scope="module")
def lam_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("lam")
    return make_lam_fixture(str(root), img_size=32)


def small_cfg(root):
    return Config(
        data_root=root, model="BaselineLSTM", weights=[0.136, 0.864],
        lr=1e-3, batch_size=8, num_workers=2, img_size=32,
        train_stride=1, val_stride=1, seed=0,
    )


def test_interpolate_track_fills_gaps():
    track = [
        {"frameNumber": 1, "x": 0.0, "y": 0.0, "width": 10.0, "height": 10.0, "Person ID": "p"},
        {"frameNumber": 5, "x": 8.0, "y": 4.0, "width": 10.0, "height": 10.0, "Person ID": "p"},
    ]
    out = interpolate_track(track)
    assert [f["frameNumber"] for f in out] == [1, 2, 3, 4, 5]
    assert abs(out[2]["x"] - 4.0) < 1e-9  # linear midpoint
    assert abs(out[2]["y"] - 2.0) < 1e-9


def test_interpolate_track_drops_degenerate():
    track = [
        {"frameNumber": 0, "x": 0, "y": 0, "width": 5, "height": 5, "Person ID": "p"},
        {"frameNumber": 2, "x": 0, "y": 0, "width": 0, "height": 5, "Person ID": "p"},
        {"frameNumber": 3, "x": 0, "y": 0, "width": 5, "height": 5, "Person ID": ""},
    ]
    assert interpolate_track(track) == []


def test_pad_video_edge_pads_missing():
    v = np.zeros((7, 4, 4, 3), dtype=np.uint8)
    for i in (2, 3, 4):
        v[i] = i * 10
    out = pad_video(v)
    assert out.shape == (7, 4, 4, 3)
    assert (out[0] == 20).all() and (out[1] == 20).all()  # left edge-pad
    assert (out[5] == 40).all() and (out[6] == 40).all()  # right edge-pad


def test_make_dataset_index(lam_root):
    images, keyframes = make_dataset(
        os.path.join(lam_root, "train.list"),
        os.path.join(lam_root, "json"),
        os.path.join(lam_root, "gt"),
        stride=1,
    )
    assert len(images) > 0
    labels = {im[-1] for im in images}
    assert labels == {0, 1}  # fixture contains both classes


def test_dataset_item_shapes(lam_root):
    ds = LamClipDataset(lam_root, split="train", stride=1, img_size=32)
    item = ds[0]
    assert item["frames"].shape == (7, 32, 32, 3)
    assert item["frames"].dtype == np.float32
    assert ":" in item["uid"]


def test_batch_loader_static_shapes(lam_root):
    ds = LamClipDataset(lam_root, split="train", stride=1, img_size=32)
    loader = BatchLoader(ds, batch_size=4, mode="eval", num_workers=2)
    shapes = set()
    total_valid = 0
    for batch in loader:
        shapes.add(batch["frames"].shape)
        total_valid += batch["valid"].sum()
    assert len(shapes) == 1  # every batch identical shape
    assert total_valid == len(ds)


def test_average_precision_brute_force():
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 2, 50)
    scores = rng.random(50)
    order = np.argsort(-scores, kind="stable")
    l = labels[order]
    tp = np.cumsum(l)
    precision = tp / np.arange(1, 51)
    recall = tp / max(l.sum(), 1)
    ap = compute_average_precision(precision, recall)
    # brute force: integrate smoothed PR curve
    r = np.concatenate([[0], recall, [1]])
    p = np.concatenate([[0], precision, [0]])
    for i in range(len(p) - 2, -1, -1):
        p[i] = max(p[i], p[i + 1])
    ap_ref = sum((r[i] - r[i - 1]) * p[i] for i in range(1, len(r)) if r[i] != r[i - 1])
    assert abs(ap - ap_ref) < 1e-9


def test_run_evaluation_perfect_and_dedup():
    uids = ["a", "b", "c", "a"]  # duplicate uid 'a' must be dropped
    labels = [1, 0, 1, 0]
    scores = [0.9, 0.1, 0.8, 0.2]
    m_ap, acc = run_evaluation(uids, np.asarray(labels), np.asarray(scores))
    assert m_ap == 1.0
    assert acc == 1.0


def test_train_and_eval_step(lam_root):
    from egot2x.tasks.lam import LookingAtMe

    cfg = small_cfg(lam_root)
    task = LookingAtMe(cfg)
    state = task.build_state(jax.random.key(0))
    ds = LamClipDataset(lam_root, split="train", stride=1, img_size=32)
    loader = BatchLoader(ds, batch_size=8, mode="train", num_workers=2)
    batch = next(iter(loader))
    dev = {k: v for k, v in batch.items() if isinstance(v, np.ndarray) and v.dtype.kind in "biufc"}
    state2, metrics = jax.jit(task.train_step, donate_argnums=0)(
        state, dev, jax.random.key(1)
    )
    assert np.isfinite(float(metrics["loss"]))
    out = jax.jit(task.eval_step)(state2, dev)
    assert out["scores"].shape == (8,)


def test_data_parallel_8dev(lam_root):
    """Train step over an 8-device mesh: batch sharded on the data axis."""
    from egot2x.core.mesh import batch_sharding, make_mesh
    from egot2x.tasks.lam import LookingAtMe

    assert jax.device_count() == 8
    cfg = small_cfg(lam_root)
    task = LookingAtMe(cfg)
    state = task.build_state(jax.random.key(0))
    mesh = make_mesh()
    sh = batch_sharding(mesh)
    batch = {
        "frames": jax.device_put(
            np.random.default_rng(0).standard_normal((8, 7, 32, 32, 3)).astype(np.float32), sh
        ),
        "label": jax.device_put(np.zeros(8, dtype=np.int64), sh),
    }
    state2, metrics = jax.jit(task.train_step, donate_argnums=0)(
        state, batch, jax.random.key(1)
    )
    assert np.isfinite(float(metrics["loss"]))
    # params remain replicated after the update
    leaf = jax.tree_util.tree_leaves(state2.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_trainer_fit_on_8dev_mesh(lam_root, tmp_path):
    """Full Trainer.fit/validate on the 8-device CPU mesh (data parallel)."""
    from egot2x.tasks.lam import LookingAtMe
    from egot2x.train.trainer import Trainer

    cfg = small_cfg(lam_root)
    cfg.batch_size = 8  # divisible by the 8-device data axis
    task = LookingAtMe(cfg)
    trainer = Trainer(task, max_epochs=1, fast_dev_run=True,
                      default_root_dir=str(tmp_path / "logs"), log_every=1)
    assert trainer.mesh.devices.size == 8
    state = trainer.fit()
    metrics = trainer.validate(state)
    assert "val_mAP" in metrics


def test_strip_preprocessing_roundtrip(lam_root):
    """Preprocessed strips decode to (nearly) the same clips as raw reads;
    jpeg recompression allows small pixel differences."""
    from egot2x.data.lam import LamClipDataset, LamStripDataset, preprocess_lam_strips

    preprocess_lam_strips(lam_root, split="train", stride=1, img_size=32)
    raw = LamClipDataset(lam_root, split="train", stride=1, img_size=32)
    strips = LamStripDataset(lam_root, split="train", stride=1, img_size=32)
    a = raw[0]["frames"]
    b = strips[0]["frames"]
    assert a.shape == b.shape
    # normalized-space tolerance for jpeg recompression
    assert np.abs(a - b).mean() < 0.2


def test_trainer_gradient_histogram_hook(lam_root, tmp_path):
    """log_gradient_period captures raw grads through apply_gradients
    and records per-leaf histograms + a global norm (reference
    LOG_GRADIENT_PERIOD hook, HOI/tasks/lta/video_task.py:112-125)."""
    from egot2x.tasks.lam import LookingAtMe
    from egot2x.train.trainer import Trainer

    cfg = small_cfg(lam_root)
    cfg.batch_size = 8
    task = LookingAtMe(cfg)
    trainer = Trainer(task, max_epochs=1, fast_dev_run=True,
                      default_root_dir=str(tmp_path / "logs"), log_every=1,
                      log_gradient_period=1)
    state = trainer.fit()
    assert state.grad_stats is not None
    assert len(trainer.grad_history) >= 1
    rec = trainer.grad_history[0]
    assert rec["global_norm"] > 0.0
    n_param_leaves = len(jax.tree_util.tree_leaves(state.params))
    assert len(rec["leaves"]) == n_param_leaves
    some = next(iter(rec["leaves"].values()))
    assert len(some["hist"]) == 20 and some["norm"] >= 0.0
    # off by default: no capture buffer, no history
    task2 = LookingAtMe(cfg)
    trainer2 = Trainer(task2, max_epochs=1, fast_dev_run=True,
                       default_root_dir=str(tmp_path / "logs2"), log_every=1)
    state2 = trainer2.fit()
    assert state2.grad_stats is None
    assert trainer2.grad_history == []
