"""STA (vestigial surface): RoIAlign, RoI head model, box AP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egot2x.metrics.sta import box_ap, box_iou
from egot2x.ops.roi_align import roi_align


def test_roi_align_constant_region():
    # a feature map constant inside the box → every bin equals that value
    feat = jnp.zeros((1, 16, 16, 2))
    feat = feat.at[:, 4:12, 4:12, :].set(3.0)
    boxes = jnp.asarray([[0, 5.0, 5.0, 11.0, 11.0]])
    out = roi_align(feat, boxes, resolution=4, spatial_scale=1.0)
    assert out.shape == (1, 4, 4, 2)
    np.testing.assert_allclose(np.asarray(out), 3.0, atol=1e-5)


def test_roi_align_matches_torchvision():
    tv = pytest.importorskip("torchvision")
    import torch

    rng = np.random.default_rng(0)
    feat = rng.standard_normal((1, 3, 20, 24)).astype(np.float32)  # NCHW
    boxes = np.asarray([[0, 2.0, 3.0, 18.0, 15.0],
                        [0, 0.5, 0.5, 10.0, 10.0]], dtype=np.float32)
    ref = tv.ops.roi_align(torch.from_numpy(feat), torch.from_numpy(boxes),
                           output_size=5, spatial_scale=1.0, sampling_ratio=1,
                           aligned=True).numpy()  # (N, C, 5, 5)
    ours = roi_align(jnp.asarray(np.transpose(feat, (0, 2, 3, 1))),
                     jnp.asarray(boxes), resolution=5, spatial_scale=1.0)
    np.testing.assert_allclose(np.asarray(ours),
                               np.transpose(ref, (0, 2, 3, 1)),
                               rtol=1e-4, atol=1e-4)


def test_sta_model_shapes(rng):
    from egot2x.core.registry import build_model
    import egot2x.models.sta  # noqa

    model = build_model("ShortTermAnticipationSlowFast", num_verbs=7, alpha=4)
    slow = jnp.asarray(rng.standard_normal((1, 2, 64, 64, 3)), dtype=jnp.float32)
    fast = jnp.asarray(rng.standard_normal((1, 8, 64, 64, 3)), dtype=jnp.float32)
    boxes = jnp.asarray([[0, 4.0, 4.0, 40.0, 40.0], [0, 8.0, 8.0, 60.0, 50.0]])
    v = model.init(jax.random.key(0), [slow, fast], boxes, train=False)
    verb, ttc = model.apply(v, [slow, fast], boxes, train=False)
    assert verb.shape == (2, 7)
    np.testing.assert_allclose(np.asarray(verb).sum(-1), 1.0, rtol=1e-4)
    assert (np.asarray(ttc) >= 0).all()


def test_box_iou_and_ap():
    a = np.array([[0, 0, 10, 10.0]])
    b = np.array([[5, 5, 15, 15.0], [0, 0, 10, 10.0]])
    iou = box_iou(a, b)[0]
    assert abs(iou[1] - 1.0) < 1e-9
    assert abs(iou[0] - 25.0 / 175.0) < 1e-9
    # perfect detector → AP 1
    ap = box_ap([b], [np.array([0.9, 0.8])], [b])
    assert ap == 1.0
    # detector that misses everything → AP 0
    ap0 = box_ap([a], [np.array([0.9])], [np.array([[50, 50, 60, 60.0]])])
    assert ap0 == 0.0


def test_sta_dataset(tmp_path):
    from egot2x.data.pipeline import BatchLoader
    from egot2x.data.sta import Ego4dStaDataset, sta_transform
    from egot2x.data.synthetic import make_sta_fixture

    root = make_sta_fixture(str(tmp_path / "sta"))
    for split in ("train", "val"):
        ds = Ego4dStaDataset(root, split=split, num_frames=8, alpha=4,
                             crop_size=64, jitter_scales=(72, 96),
                             max_boxes=6)
        assert len(ds) == 4
        item = ds[0]
        assert item["slow"].shape == (2, 64, 64, 3)
        assert item["fast"].shape == (8, 64, 64, 3)
        assert item["boxes"].shape == (6, 4)
        assert item["box_valid"].dtype == bool
        n_valid = int(item["box_valid"].sum())
        assert n_valid >= 2  # 2 detections (+GT appended at train)
        # at least one detection should match the (jittered-copy) GT box
        if split == "train":
            assert (item["verb"][:n_valid] >= 0).any()
            assert item["ttc"][item["ttc_valid"]].min() > 0
        # ignore labels padded with -100
        assert (item["verb"][n_valid:] == -100).all()
    # static-shape batches stack cleanly
    loader = BatchLoader(ds, batch_size=2, mode="eval")
    batch = next(iter(loader))
    assert batch["boxes"].shape == (2, 6, 4)
    assert batch["slow"].shape == (2, 2, 64, 64, 3)


def test_sta_transform_boxes_follow_crop():
    from egot2x.data.sta import sta_transform

    rng = np.random.default_rng(0)
    frames = np.zeros((2, 100, 140, 3), np.float32)
    frames[:, 40:60, 60:90] = 255.0  # bright region == the box
    boxes = np.array([[60.0, 40.0, 90.0, 60.0]], np.float32)
    out, tb = sta_transform(frames, boxes.copy(), "val", 64, (72, 96), rng)
    assert out.shape == (2, 64, 64, 3)
    # the transformed box must still cover the bright region's center
    x0, y0, x1, y1 = tb[0]
    cy, cx = np.unravel_index(out[0].sum(-1).argmax(), out[0].sum(-1).shape)
    assert x0 - 2 <= cx <= x1 + 2 and y0 - 2 <= cy <= y1 + 2


def test_sta_task_trains(tmp_path):
    """One train step + validation of the STA task on the fixture."""
    from egot2x.core.config import Config
    from egot2x.data.synthetic import make_sta_fixture
    from egot2x.tasks.sta import ShortTermAnticipationTask

    root = make_sta_fixture(str(tmp_path / "sta"))
    cfg = Config(data_root=root, lr=0.01, wd=1e-4, batch_size=2,
                 num_workers=1, seed=0, crop_size=64, num_frames=8,
                 alpha=4, num_verbs=10, max_boxes=6,
                 jitter_scales=(72, 96))
    task = ShortTermAnticipationTask(cfg)
    state = task.build_state(jax.random.key(0))
    batch = next(iter(task.train_loader()))
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()
                 if isinstance(v, np.ndarray) and v.dtype.kind in "biufc"}
    state, metrics = jax.jit(task.train_step, donate_argnums=0)(
        state, dev_batch, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
    assert 0.0 <= float(metrics["verb_accuracy"]) <= 1.0
    # eval + aggregation produce the checkpoint metric
    ctx = task.start_validation()
    vb = next(iter(task.val_loader()))
    out = jax.jit(task.eval_step)(
        state, {k: jnp.asarray(v) for k, v in vb.items()
                if isinstance(v, np.ndarray) and v.dtype.kind in "biufc"})
    task.accumulate(ctx, jax.device_get(out), vb)
    res = task.finalize_validation(ctx)
    assert "val_map_box" in res and 0.0 <= res["val_map_box"] <= 1.0
