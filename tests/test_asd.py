"""ASD/TalkNet tests: module shapes, MFCC host/device parity, task step."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egot2x.audio.mfcc import mfcc, mfcc_np
from egot2x.core.config import Config
from egot2x.data.asd import AsdTrialDataset, normalize_audio_int16, overlap_noise
from egot2x.data.bucketing import BucketBatchLoader
from egot2x.data.synthetic import make_asd_fixture


@pytest.fixture(scope="module")
def asd_root(tmp_path_factory):
    return make_asd_fixture(str(tmp_path_factory.mktemp("asd")), img_size=40)


def test_mfcc_np_matches_jax(rng):
    x = rng.standard_normal(6000).astype(np.float32)
    a = mfcc_np(x, num_frames=40)
    b = np.asarray(mfcc(jnp.asarray(x), num_frames=40))
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)


def test_overlap_noise_snr():
    rng = np.random.default_rng(0)
    a = rng.standard_normal(1000).astype(np.float32) * 0.1
    n = rng.standard_normal(500).astype(np.float32) * 0.5
    out = overlap_noise(a, n, snr_db=0.0)
    assert out.shape == a.shape
    assert np.isfinite(out).all()


def test_audio_encoder_time_rate(rng):
    from egot2x.nn.talknet import AudioEncoder

    enc = AudioEncoder()
    t = 16
    x = jnp.asarray(rng.standard_normal((2, 4 * t, 13)), dtype=jnp.float32)
    v = enc.init(jax.random.key(0), x)
    out = enc.apply(v, x)
    assert out.shape == (2, t, 128)  # 4T mfcc steps → T frames


def test_talknet_full_shapes(rng):
    from egot2x.models.asd import TalkNetWithHeads

    model = TalkNetWithHeads()
    t = 8
    mfcc_in = jnp.asarray(rng.standard_normal((1, 4 * t, 13)), dtype=jnp.float32)
    faces = jnp.asarray(rng.uniform(0, 255, (1, t, 112, 112)), dtype=jnp.float32)
    v = model.init(jax.random.key(0), mfcc_in, faces)
    out = model.apply(v, mfcc_in, faces)
    assert out["logits_av"].shape == (1, t, 2)
    assert out["logits_a"].shape == (1, t, 2)
    assert out["logits_v"].shape == (1, t, 2)


def test_asd_dataset_items(asd_root):
    ds = AsdTrialDataset(asd_root, split="train")
    assert len(ds) > 0
    item = ds.get_item(0, 30)
    assert item["mfcc"].shape == (120, 13)
    assert item["faces"].shape == (30, 112, 112)
    assert item["labels"].shape == (30,)
    assert set(np.unique(item["labels"])) <= {0, 1}


def test_asd_loader_and_train_step(asd_root):
    from egot2x.tasks.asd import ActiveSpeakerDetection

    cfg = Config(data_root=asd_root, lr=1e-4, lr_decay=1.0, batch_size=40,
                 num_workers=2, seed=0)
    task = ActiveSpeakerDetection(cfg)
    state = task.build_state(jax.random.key(0))
    batch = next(iter(task.train_loader()))
    dev = {k: v for k, v in batch.items()
           if isinstance(v, np.ndarray) and v.dtype.kind in "biufc"}
    state2, metrics = jax.jit(task.train_step, donate_argnums=0)(
        state, dev, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
    assert 0.0 <= float(metrics["acc"]) <= 1.0


def test_frame_weighted_ce_matches_torch():
    torch = pytest.importorskip("torch")
    from egot2x.tasks.asd import frame_weighted_ce

    rng = np.random.default_rng(0)
    logits = rng.standard_normal((4, 6, 2)).astype(np.float32)
    labels = rng.integers(0, 2, (4, 6))
    ours = float(frame_weighted_ce(jnp.asarray(logits), jnp.asarray(labels),
                                   np.asarray([1.0, 4.0], np.float32)))
    crit = torch.nn.CrossEntropyLoss(weight=torch.tensor([1.0, 4.0]))
    theirs = float(crit(torch.from_numpy(logits.reshape(-1, 2)),
                        torch.from_numpy(labels.reshape(-1))))
    assert abs(ours - theirs) < 1e-5
