"""EgoT2-s HOI translator tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egot2x.core.registry import build_model
from egot2x.train.state import split_params
from egot2x.translate.egot2s_hoi import HOI_FROZEN_KEYS, adaptive_avg_pool_time

import egot2x.translate.egot2s_hoi  # noqa: F401

S = 65  # pnr crop
AC = 64  # action crop
T_PNR = 16
T_FAST = 8
ALPHA = 4


def _pnr_frames(rng, b=1):
    return jnp.asarray(rng.uniform(0, 255, (b, T_PNR, S, S, 3)), dtype=jnp.float32)


def _pathways(rng, b=1, clips=None):
    shape_s = (b, T_FAST // ALPHA, AC, AC, 3)
    shape_f = (b, T_FAST, AC, AC, 3)
    if clips:
        shape_s = (b, clips) + shape_s[1:]
        shape_f = (b, clips) + shape_f[1:]
    return [jnp.asarray(rng.standard_normal(shape_s), dtype=jnp.float32),
            jnp.asarray(rng.standard_normal(shape_f), dtype=jnp.float32)]


def test_adaptive_pool_time_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(0).standard_normal((2, 32, 6)).astype(np.float32)
    ours = np.asarray(adaptive_avg_pool_time(jnp.asarray(x), 8))
    # torch AdaptiveAvgPool1d over the time axis
    t = torch.nn.AdaptiveAvgPool1d(8)(torch.from_numpy(x).permute(0, 2, 1))
    theirs = t.permute(0, 2, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_pnr_oscc_translator_outputs(rng):
    for target, n_out in [("keyframe", 16), ("state", 2)]:
        model = build_model("TaskFusionMFTransformer3TaskDropout",
                            target=target, crop_size=S, feature_dim=64,
                            num_layers=1, alpha=ALPHA)
        frames = _pnr_frames(rng)
        pw = _pathways(rng)
        v = model.init(jax.random.key(0), frames, pw, train=False)
        out = model.apply(v, frames, pw, train=False)
        assert out.shape == (1, n_out), target
        # token count: 16 pnr + 16 oscc + T_FAST/α slow + 8 fast
        trainable, frozen = split_params(
            v["params"], lambda k: k in HOI_FROZEN_KEYS)
        assert {"pnr_model", "oscc_model", "action_model"} <= set(frozen)


def test_ar_translator_two_heads(rng):
    model = build_model("ARTaskFusionMFTransformer3Task",
                        num_classes=(7, 9), crop_size=S, feature_dim=64,
                        num_layers=1, alpha=ALPHA)
    pw = _pathways(rng)
    frames = _pnr_frames(rng)
    v = model.init(jax.random.key(0), pw, frames, train=False)
    verb, noun = model.apply(v, pw, frames, train=False)
    assert verb.shape == (1, 7) and noun.shape == (1, 9)


def test_lta_2task_translator_generate(rng):
    model = build_model("TaskFusionMFTransformer2TaskLTA",
                        num_classes=(7, 9), num_actions=4, feature_dim=64,
                        num_input_clips=2, alpha=ALPHA)
    pw = _pathways(rng, clips=2)
    v = model.init(jax.random.key(0), pw, train=False)
    verb, noun = model.apply(v, pw, train=False)
    assert verb.shape == (1, 4, 7)
    preds = model.apply(v, pw, k=3, rng=jax.random.key(1), method="generate")
    assert preds[0].shape == (1, 3, 4)


def test_lta_4task_translator(rng):
    model = build_model("TaskFusionMFTransformerLTA4Task",
                        num_classes=(7, 9), num_actions=4, feature_dim=64,
                        num_input_clips=2, crop_size=S, alpha=ALPHA)
    pw = _pathways(rng, clips=2)
    frames_pnr = jnp.asarray(
        np.random.default_rng(1).uniform(0, 255, (1, 2, T_PNR, S, S, 3)),
        dtype=jnp.float32)
    v = model.init(jax.random.key(0), pw, frames_pnr, train=False)
    verb, noun = model.apply(v, pw, frames_pnr, train=False)
    assert verb.shape == (1, 4, 7)
    trainable, frozen = split_params(v["params"], lambda k: k in HOI_FROZEN_KEYS)
    assert {"pnr_model", "oscc_model", "action_model", "lta_model"} == \
        set(frozen) & set(HOI_FROZEN_KEYS)
    # the AR feature head must remain trainable
    assert "action_head" in trainable


def test_transfer_baselines(rng):
    frames = _pnr_frames(rng)
    pw = _pathways(rng)
    k2s = build_model("Keyframe2State", crop_size=S, alpha=ALPHA)
    v = k2s.init(jax.random.key(0), frames, train=False)
    assert k2s.apply(v, frames, train=False).shape == (1, 2)
    s2k = build_model("State2Keyframe", crop_size=S, alpha=ALPHA)
    v = s2k.init(jax.random.key(0), frames, train=False)
    assert s2k.apply(v, frames, train=False).shape == (1, 16)
    a2s = build_model("Action2State", crop_size=S, alpha=ALPHA, feature_dim=64)
    v = a2s.init(jax.random.key(0), frames, pw, train=False)
    assert a2s.apply(v, frames, pw, train=False).shape == (1, 2)
