"""SlowFast / AR / LTA tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egot2x.core.config import Config
from egot2x.data.lta import Ego4dLtaDataset, Ego4dRecognitionDataset, to_pathways
from egot2x.data.synthetic import make_lta_fixture
from egot2x.metrics.lta import aued, edit_distance, levenshtein, topk_accuracies
from egot2x.nn.slowfast import SlowFast


@pytest.fixture(scope="module")
def lta_root(tmp_path_factory):
    return make_lta_fixture(str(tmp_path_factory.mktemp("lta")), img_size=48)


def test_slowfast_feature_shapes(rng):
    model = SlowFast(alpha=4, beta_inv=8)
    slow = jnp.asarray(rng.standard_normal((1, 2, 64, 64, 3)), dtype=jnp.float32)
    fast = jnp.asarray(rng.standard_normal((1, 8, 64, 64, 3)), dtype=jnp.float32)
    v = model.init(jax.random.key(0), [slow, fast])
    s5_slow, s5_fast = model.apply(v, [slow, fast])
    assert s5_slow.shape == (1, 2, 2, 2, 2048)
    assert s5_fast.shape == (1, 8, 2, 2, 256)


def test_multitask_slowfast_heads(rng):
    from egot2x.core.registry import build_model
    import egot2x.models.ar_lta  # noqa

    model = build_model("MultiTaskSlowFast", num_classes=(7, 9), alpha=4)
    slow = jnp.asarray(rng.standard_normal((2, 2, 64, 64, 3)), dtype=jnp.float32)
    fast = jnp.asarray(rng.standard_normal((2, 8, 64, 64, 3)), dtype=jnp.float32)
    v = model.init(jax.random.key(0), [slow, fast], train=False)
    verb, noun = model.apply(v, [slow, fast], train=False)
    assert verb.shape == (2, 7) and noun.shape == (2, 9)
    feats = model.apply(v, [slow, fast], train=False, middle=True)
    assert feats[0].shape[-1] == 2048 and feats[1].shape[-1] == 256


def test_forecasting_generate(rng):
    from egot2x.core.registry import build_model
    import egot2x.models.ar_lta  # noqa

    model = build_model("ForecastingEncoderDecoder", num_classes=(7, 9),
                        num_actions=4, feature_dim=64, alpha=4,
                        aggregator="TransformerAggregator")
    slow = jnp.asarray(rng.standard_normal((1, 2, 2, 64, 64, 3)), dtype=jnp.float32)
    fast = jnp.asarray(rng.standard_normal((1, 2, 8, 64, 64, 3)), dtype=jnp.float32)
    v = model.init(jax.random.key(0), [slow, fast], train=False)
    verb, noun = model.apply(v, [slow, fast], train=False)
    assert verb.shape == (1, 4, 7) and noun.shape == (1, 4, 9)
    preds = model.apply(v, [slow, fast], k=3, rng=jax.random.key(1),
                        method="generate")
    assert preds[0].shape == (1, 3, 4)
    assert (np.asarray(preds[0]) < 7).all()
    # k=1 must be deterministic argmax
    p1a = model.apply(v, [slow, fast], k=1, method="generate")
    p1b = model.apply(v, [slow, fast], k=1, method="generate")
    np.testing.assert_array_equal(np.asarray(p1a[0]), np.asarray(p1b[0]))


def test_levenshtein_and_ed():
    assert levenshtein(np.array([1, 2, 3]), np.array([1, 2, 3])) == 0
    assert levenshtein(np.array([1, 2, 3]), np.array([1, 3])) == 1
    assert levenshtein(np.array([1, 2]), np.array([3, 4])) == 2
    preds = np.array([[[1, 3], [2, 2], [3, 3]]])  # (1, Z=3, K=2)
    labels = np.array([[1, 2, 3]])
    # k=0 column matches exactly → min dist 0
    assert edit_distance(preds, labels) == 0.0


def test_aued_monotone_keys():
    rng = np.random.default_rng(0)
    preds = rng.integers(0, 5, (4, 6, 3))
    labels = rng.integers(0, 5, (4, 6))
    out = aued(preds, labels)
    assert "AUED" in out and "ED_5" in out
    assert 0.0 <= out["ED_5"] <= 1.0


def test_topk():
    preds = np.array([[0.1, 0.5, 0.4], [0.9, 0.05, 0.05]])
    labels = np.array([1, 2])
    top1, top2 = topk_accuracies(preds, labels, [1, 2])
    assert top1 == 50.0
    assert top2 == 50.0


def test_recognition_dataset(lta_root):
    ds = Ego4dRecognitionDataset(lta_root, split="train", num_frames=8,
                                 alpha=4, crop_size=48)
    item = ds[0]
    assert item["slow"].shape == (2, 48, 48, 3)
    assert item["fast"].shape == (8, 48, 48, 3)


def test_lta_dataset_structure(lta_root):
    ds = Ego4dLtaDataset(lta_root, split="train", num_input_clips=2,
                         num_actions=20, num_frames=8, alpha=4, crop_size=48)
    assert len(ds) > 0
    item = ds[0]
    assert item["slow"].shape[0] == 2  # N input clips
    assert item["verb"].shape == (20,)
    assert item["noun"].shape == (20,)


def test_to_pathways():
    frames = np.arange(8)[:, None, None, None] * np.ones((8, 2, 2, 3))
    slow, fast = to_pathways(frames, alpha=4)
    assert fast.shape[0] == 8 and slow.shape[0] == 2
