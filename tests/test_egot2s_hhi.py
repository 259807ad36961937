"""EgoT2-s HHI translator tests: shapes, frozen split, checkpoint graft."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egot2x.core.config import Config
from egot2x.core.registry import build_model
from egot2x.train.state import split_params

import egot2x.translate.egot2s_hhi as hhi  # registers models

T = 15
S = 32


def _inputs(rng, batch=2):
    return (
        jnp.asarray(rng.standard_normal((batch, T, S, S, 3)), dtype=jnp.float32),
        jnp.asarray(rng.uniform(0, 255, (batch, T, 112, 112)), dtype=jnp.float32),
        jnp.asarray(rng.standard_normal((batch, T * 16000 // 30)), dtype=jnp.float32),
        jnp.asarray(rng.standard_normal((batch, 4 * T, 13)), dtype=jnp.float32),
    )


@pytest.fixture(scope="module")
def three_task(rng_factory=None):
    rng = np.random.default_rng(0)
    model = build_model("TaskFusionMFTransformer3Task", hidden_dim=64,
                        num_layers=1, num_heads=4)
    inputs = _inputs(rng)
    variables = model.init(jax.random.key(0), *inputs, train=False)
    return model, variables, inputs


def test_3task_logits_shape(three_task):
    model, variables, inputs = three_task
    out = model.apply(variables, *inputs, train=False)
    assert out.shape == (2, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_3task_param_split(three_task):
    model, variables, _ = three_task
    trainable, frozen = split_params(variables["params"],
                                     lambda k: k in hhi.FROZEN_KEYS)
    assert set(frozen) == {"lam_model", "ttm_model", "asd_model"}
    assert "core" in trainable and "head_fc" in trainable
    # translator trainable params are small vs frozen backbones
    count = lambda t: sum(np.size(l) for l in jax.tree_util.tree_leaves(t))
    assert count(trainable) < count(frozen)


def test_3task_no_grad_through_backbones(three_task):
    model, variables, inputs = three_task
    trainable, frozen = split_params(variables["params"],
                                     lambda k: k in hhi.FROZEN_KEYS)

    def loss(tr):
        full = {**frozen, **tr}
        out = model.apply({"params": full,
                           "batch_stats": variables["batch_stats"]},
                          *inputs, train=False)
        return out.sum()

    g = jax.grad(loss)(trainable)
    # grads exist and are finite for translator params
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(np.abs(np.asarray(l)).sum()) > 0 for l in leaves)


def test_2task_translator(rng):
    model = build_model("TaskFusionMFTransformer2Task", hidden_dim=64,
                        num_layers=1)
    video = jnp.asarray(rng.standard_normal((2, T, S, S, 3)), dtype=jnp.float32)
    audio = jnp.asarray(rng.standard_normal((2, 8000)), dtype=jnp.float32)
    v = model.init(jax.random.key(0), video, audio, train=False)
    out = model.apply(v, video, audio, train=False)
    assert out.shape == (2, 2)


def test_asd_variant_frame_level(rng):
    model = build_model("TaskFusionMFTransformer3TaskASD", hidden_dim=64,
                        num_layers=1)
    inputs = _inputs(rng)
    v = model.init(jax.random.key(0), *inputs, train=False)
    out = model.apply(v, *inputs, train=False)
    assert out.shape == (2 * T, 64)  # (B*T_asd, hidden_dim)


def test_baselines_shapes(rng):
    inputs = _inputs(rng)
    for name in ["FinetuneTTM", "LAM2TTM", "ASD2TTM", "TaskFusionLFLinear3Task"]:
        model = build_model(name, hidden_dim=32, hidden_dim2=48)
        v = model.init(jax.random.key(0), *inputs, train=False)
        out = model.apply(v, *inputs, train=False)
        assert out.shape == (2, 2), name


def test_graft_backbone_roundtrip(tmp_path, rng):
    """Stage-I LAM checkpoint leaves appear verbatim in the translator."""
    from egot2x.core.checkpoint import graft_backbone, save_tree
    from egot2x.tasks.lam import LookingAtMe

    cfg = Config(data_root="", model="BaselineLSTM", weights=[0.5, 0.5],
                 lr=1e-3, batch_size=2, num_workers=1, img_size=S,
                 train_stride=1, val_stride=1, seed=0)
    task = LookingAtMe(cfg)
    state = task.build_state(jax.random.key(1))
    ckpt = tmp_path / "epoch_0"
    save_tree(str(ckpt), {"params": state.params,
                          "batch_stats": state.batch_stats})

    model = build_model("TaskFusionMFTransformer2Task", hidden_dim=32,
                        num_layers=1)
    video = jnp.zeros((1, T, S, S, 3), jnp.float32)
    audio = jnp.zeros((1, 8000), jnp.float32)
    variables = dict(model.init(jax.random.key(0), video, audio, train=False))
    grafted = graft_backbone(variables, "lam_model", str(ckpt), params_src="trunk")

    src = state.params["trunk"]["base_model"]["conv1"]["kernel"]
    dst = grafted["params"]["lam_model"]["trunk"]["base_model"]["conv1"]["kernel"]
    np.testing.assert_array_equal(np.asarray(src), np.asarray(dst))
    # grafted variables still run
    out = model.apply(grafted, video, audio, train=False)
    assert out.shape == (1, 2)


def test_asd_2loader_task_step():
    """ASD-target translation: frozen split inside 'translator' +
    per-frame lossAV head training step."""
    import os
    import tempfile

    from egot2x.core.config import Config
    from egot2x.data.synthetic import make_asd_fixture
    from egot2x.tasks.asd_2loader import ActiveSpeakerDetection2Loader

    root = os.path.join(tempfile.gettempdir(), "egot2x_asd2l_fixture")
    if not os.path.exists(os.path.join(root, "csv", "active_speaker_train.csv")):
        make_asd_fixture(root, img_size=40)
    cfg = Config(data_root=root, lr=1e-4, batch_size=40, num_workers=2,
                 seed=0, rgb_size=48, hidden_dim=64, num_layers=1)
    task = ActiveSpeakerDetection2Loader(cfg)
    state = task.build_state(jax.random.key(0))
    assert "translator" in state.frozen
    assert set(state.frozen["translator"]) == {"lam_model", "ttm_model",
                                               "asd_model"}
    batch = next(iter(task.train_loader()))
    dev = {k: v for k, v in batch.items()
           if isinstance(v, np.ndarray) and v.dtype.kind in "biufc"}
    state2, metrics = jax.jit(task.train_step, donate_argnums=0)(
        state, dev, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
