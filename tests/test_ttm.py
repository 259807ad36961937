"""TTM dataset/bucketing/task tests."""

import os

import jax
import numpy as np
import pytest

from egot2x.core.config import Config
from egot2x.data.bucketing import BucketBatchLoader, assign_buckets
from egot2x.data.synthetic import make_ttm_fixture
from egot2x.data.ttm import TtmSegmentDataset, make_dataset, normalize_audio


@pytest.fixture(scope="module")
def ttm_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ttm"))
    return make_ttm_fixture(root, img_size=24)


def test_make_dataset_semantics(ttm_root):
    segs, crops = make_dataset(
        os.path.join(ttm_root, "train.list"),
        os.path.join(ttm_root, "json"),
        os.path.join(ttm_root, "gt"),
        is_train=True,
    )
    lengths = [s[4] - s[3] + 1 for s in segs]
    assert all(l >= 15 for l in lengths)  # train drops short segments
    assert max(lengths) <= 151  # long segments were chunked
    labels = {s[2] for s in segs}
    assert labels == {0, 1}  # 'tags' presence maps to label 1
    # the 160-frame fixture segment must have produced a chunk
    idxs = [s[5] for s in segs]
    assert len(idxs) >= len(set(idxs))


def test_eval_keeps_short_segments(ttm_root):
    segs, _ = make_dataset(
        os.path.join(ttm_root, "val.list"),
        os.path.join(ttm_root, "json"),
        os.path.join(ttm_root, "gt"),
        is_train=False,
    )
    assert len(segs) > 0


def test_normalize_audio_rms():
    x = np.random.default_rng(0).standard_normal(1000).astype(np.float32)
    y = normalize_audio(x)
    assert abs(np.sqrt(np.mean(y ** 2)) - 0.1) < 1e-3


def test_assign_buckets():
    buckets = (15, 30, 60, 90, 120, 150)
    lengths = np.array([10, 15, 29, 30, 100, 149, 150, 200])
    b = assign_buckets(lengths, buckets)
    np.testing.assert_array_equal(b, [0, 0, 0, 1, 3, 4, 5, 5])


def test_bucket_loader_static_shapes(ttm_root):
    ds = TtmSegmentDataset(ttm_root, split="train", img_size=24)
    loader = BucketBatchLoader(ds, frames_budget=120, mode="train", seed=0,
                               num_workers=2)
    seen = {}
    for batch in loader:
        t = batch["frames"].shape[1]
        key = (t, batch["frames"].shape[0])
        seen.setdefault(t, key)
        assert seen[t] == key  # same bucket → identical batch shape
        # audio length consistent with frame bucket
        assert batch["audio"].shape[1] == int(t / 30.0 * 16000)
    assert len(seen) >= 2  # fixture spans multiple buckets


def test_bucket_loader_eval_covers_all(ttm_root):
    ds = TtmSegmentDataset(ttm_root, split="val", img_size=24)
    loader = BucketBatchLoader(ds, frames_budget=120, mode="eval", num_workers=2)
    n = sum(int(b["valid"].sum()) for b in loader)
    assert n == len(ds)


def test_bucket_divisor():
    class Fake:
        lengths = np.arange(20) + 15

        def __len__(self):
            return 20

        def get_item(self, i, n):
            return {"x": np.zeros(n, np.float32)}

    loader = BucketBatchLoader(Fake(), frames_budget=400, mode="train",
                               batch_divisor=8, num_workers=1)
    for base in (15, 30, 60):
        assert loader.batch_size_for(base) % 8 == 0


def test_ttm_task_train_and_segment_averaging(ttm_root):
    from egot2x.tasks.ttm import TalkingToMe

    cfg = Config(data_root=ttm_root, model="TTMBaselineLSTM",
                 weights=[0.266, 0.734], lr=1e-3, wd=0.0, batch_size=60,
                 num_workers=2, img_size=24, seed=0)
    task = TalkingToMe(cfg)
    state = task.build_state(jax.random.key(0))
    loader = task.train_loader()
    batch = next(iter(loader))
    dev = {k: v for k, v in batch.items()
           if isinstance(v, np.ndarray) and v.dtype.kind in "biufc"}
    state2, metrics = jax.jit(task.train_step, donate_argnums=0)(
        state, dev, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))

    # segment averaging: two chunks of one segment → averaged logits
    ctx = task.start_validation()
    fake_out = {"logits": np.array([[2.0, 0.0], [0.0, 2.0]])}
    fake_batch = {"seg_id": ["u:0", "u:0"], "label": np.array([1, 1]),
                  "start": np.array([0, 150]), "end": np.array([149, 200]),
                  "valid": np.array([True, True])}
    task.accumulate(ctx, fake_out, fake_batch)
    m = task.finalize_validation(ctx)
    # mean logits = [1, 1] → p1 = 0.5
    assert abs(0.5 - np.exp(0) / (np.exp(0) + np.exp(0))) < 1e-9
    assert "val_mAP" in m
