"""PNR/OSCC tests: ResNet3D shapes, sampling semantics, metrics, tasks."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egot2x.core.config import Config
from egot2x.data.pnr import PnrClipDataset, sample_frames
from egot2x.data.synthetic import make_pnr_fixture
from egot2x.metrics.pnr import keyframe_distance, state_change_accuracy
from egot2x.nn.resnet3d import ResNet3D, KeyframeLocalizationHead


@pytest.fixture(scope="module")
def pnr_root(tmp_path_factory):
    return make_pnr_fixture(str(tmp_path_factory.mktemp("pnr")), img_size=64)


def test_resnet3d_shape_walk(rng):
    """225-crop slow_layer5 must give 8x8 spatial at s5 with 2048 ch
    (the reference 8192-token head geometry)."""
    model = ResNet3D(arch="slow_layer5", depth=50)
    x = jnp.asarray(rng.standard_normal((1, 4, 225, 225, 3)), dtype=jnp.float32)
    v = model.init(jax.random.key(0), x)
    out = model.apply(v, x)
    assert out.shape == (1, 4, 8, 8, 2048)


def test_keyframe_head_token_dim(rng):
    head = KeyframeLocalizationHead(num_classes=1, spatial_pool=7)
    x = jnp.asarray(rng.standard_normal((2, 4, 8, 8, 2048)), dtype=jnp.float32)
    v = head.init(jax.random.key(0), x)
    tokens = head.apply(v, x, middle=True)
    assert tokens.shape == (2, 4, 2048 * 2 * 2)  # the 8192-d tokens
    logits = head.apply(v, x)
    assert logits.shape == (2, 4, 1)


def test_i3d_temporal_pool(rng):
    model = ResNet3D(arch="i3d", depth=50)
    x = jnp.asarray(rng.standard_normal((1, 8, 65, 65, 3)), dtype=jnp.float32)
    v = model.init(jax.random.key(0), x)
    out = model.apply(v, x)
    assert out.shape[1] == 4  # i3d pools time by 2 after res2


def test_sample_frames_count_and_range():
    frames, cands = sample_frames(100, 370, 16, 200)
    assert len(frames) == 16
    assert all(100 <= f < 370 for f in frames)
    # candidate distances match |frame - pnr|
    assert cands[0] == abs(frames[0] - 200)


def test_dataset_item(pnr_root):
    ds = PnrClipDataset(pnr_root, split="val", crop_size=65)
    item = ds[0]
    assert item["frames"].shape == (16, 65, 65, 3)
    assert item["labels"].shape == (16,)
    if item["state"] == 1:
        assert item["labels"].sum() == 1.0  # one-hot at keyframe


def test_train_window_keeps_pnr(pnr_root):
    ds = PnrClipDataset(pnr_root, split="train", crop_size=65)
    for idx in range(len(ds)):
        for _ in range(3):
            item = ds[idx]
            if item["state"] == 1:
                assert item["clip_start_frame"] <= item["pnr_frame"] <= item["clip_end_frame"]


def test_keyframe_distance_exact():
    # pred argmax at position 4 of 16, clip 100..260 (160 frames), pnr 140
    preds = np.zeros((1, 16))
    preds[0, 4] = 1.0
    s, n = keyframe_distance(preds, np.array([1]), np.array([2.0]),
                             np.array([100]), np.array([260]), np.array([140]))
    # mapped = 160/16*4 = 40 frames; gt = 40 frames; err = 0
    assert n == 1 and s == 0.0


def test_state_change_accuracy():
    preds = np.array([[0.1, 0.9], [0.8, 0.2]])
    c, t = state_change_accuracy(preds, np.array([1, 1]))
    assert (c, t) == (1, 2)


def test_oscc_task_step(pnr_root):
    from egot2x.tasks.pnr import StateChangeClassification

    cfg = Config(data_root=pnr_root, lr=1e-4, wd=1e-4, batch_size=2,
                 num_workers=2, seed=0, crop_size=65)
    task = StateChangeClassification(cfg)
    state = task.build_state(jax.random.key(0))
    batch = next(iter(task.train_loader()))
    dev = {k: v for k, v in batch.items()
           if isinstance(v, np.ndarray) and v.dtype.kind in "biufc"}
    state2, metrics = jax.jit(task.train_step, donate_argnums=0)(
        state, dev, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))


def test_dual_head_shapes(pnr_root, rng):
    from egot2x.core.registry import build_model
    import egot2x.models.pnr  # noqa

    model = build_model("DualHeadResNet", crop_size=65)
    x = jnp.asarray(rng.standard_normal((1, 16, 65, 65, 3)), dtype=jnp.float32)
    v = model.init(jax.random.key(0), x, train=False)
    kf, st = model.apply(v, x, train=False)
    assert kf.shape == (1, 16)
    assert st.shape == (1, 2)
