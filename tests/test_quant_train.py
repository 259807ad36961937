"""int8 frozen-trunk Stage-II training (``--quant_trunks``).

The Stage-II step is dominated by the FROZEN Stage-I trunks' forward
(the translator backward is tiny and the trunks take no gradient), so
the deployment int8 static-PTQ path — accuracy-gated against float by
tests/test_quant_gate.py — can legally accelerate training too. No
reference analogue (pure fp32 torch); the reference regime this speeds
up is HHI/scripts/run_ttm.py --two_loader.

Covers: the state-carried ``quant`` collection (build_state,
train_step, eval_step), first-batch calibration (task.calibrate_state
and the Trainer.fit hook), learning on the separable fixture,
checkpoint round-trip of the calibrated scales, and the
quant×nofreeze guard.
"""

import os

import jax
import numpy as np
import pytest

from egot2x.core.config import Config


def _cfg(root, **overrides):
    base = dict(
        data_root=root, model="TaskFusionMFTransformer3Task",
        weights=[0.5, 0.5], lr=3e-3, wd=0.0, batch_size=30,
        num_workers=2, img_size=16, seed=0, hidden_dim=32,
        num_layers=1, num_heads=4, dropout=0.0, nofreeze=False,
        quant_trunks=True, lam_checkpoint=None, ttm_checkpoint=None,
        asd_checkpoint=None,
    )
    base.update(overrides)
    return Config(base)


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    from egot2x.data.synthetic import make_ttm_fixture

    return make_ttm_fixture(
        str(tmp_path_factory.mktemp("ttm_q") / "ttm"), img_size=16,
        seg_lens=[25] * 8, label_signal=60.0)


def test_quant_trunks_step_calibration_and_learning(fixture_root):
    from egot2x.tasks.ttm_2loader import TalkingToMe2Loader

    task = TalkingToMe2Loader(_cfg(fixture_root))
    state = task.build_state(jax.random.key(0))
    scales = jax.tree_util.tree_leaves(state.quant)
    assert scales, "quant_trunks state must carry the quant collection"
    assert all(float(s) == 0.0 for s in scales), "fresh scales start at 0"

    batches = [{k: v for k, v in b.items()
                if isinstance(v, np.ndarray) and v.dtype.kind in "biufc"}
               for b in task.train_loader()]
    state = task.calibrate_state(state, batches[0])
    assert all(float(s) > 0.0 for s in jax.tree_util.tree_leaves(state.quant))

    frozen0 = jax.device_get(state.frozen)
    step = jax.jit(task.train_step, donate_argnums=0)
    losses = []
    for i in range(10):
        for j, b in enumerate(batches):
            state, m = step(state, b, jax.random.key(i * 7 + j))
            losses.append(float(m["loss"]))
    assert np.all(np.isfinite(losses))
    # the translator learns ON the int8 trunk features
    assert losses[-1] < losses[0] * 0.5, (
        f"no learning on int8 features: {losses[0]:.4f} -> {losses[-1]:.4f}")
    # frozen trunks untouched by the optimizer
    for (p0, p1) in zip(jax.tree_util.tree_leaves(frozen0),
                        jax.tree_util.tree_leaves(jax.device_get(state.frozen))):
        np.testing.assert_array_equal(p0, p1)
    # eval runs the same int8 path from state.variables()
    logits = np.asarray(task.eval_step(state, batches[0])["logits"])
    assert np.isfinite(logits).all()


def test_trainer_calibrates_and_checkpoints_quant(fixture_root, tmp_path):
    from egot2x.tasks.ttm_2loader import TalkingToMe2Loader
    from egot2x.train.trainer import Trainer

    task = TalkingToMe2Loader(_cfg(fixture_root))
    trainer = Trainer(task, max_epochs=1, log_every=10,
                      default_root_dir=str(tmp_path / "logs"))
    state = trainer.fit()
    q = jax.device_get(state.quant)
    assert all(float(s) > 0.0 for s in jax.tree_util.tree_leaves(q)), (
        "Trainer.fit must calibrate uncalibrated quant scales before "
        "the first step")
    # the calibrated scales ride in the checkpoint
    fresh = task.build_state(jax.random.key(0))
    restored = trainer.ckpt.restore(fresh)
    for a, b in zip(jax.tree_util.tree_leaves(q),
                    jax.tree_util.tree_leaves(jax.device_get(restored.quant))):
        np.testing.assert_allclose(a, b)
    assert os.path.isdir(os.path.join(trainer.root, "checkpoints"))


def test_quant_trunks_nofreeze_raises(fixture_root):
    from egot2x.tasks.ttm_2loader import TalkingToMe2Loader

    with pytest.raises(ValueError, match="quant_trunks"):
        TalkingToMe2Loader(_cfg(fixture_root, nofreeze=True))


def test_hoi_quant_trunks_step(tmp_path):
    """ts_pnr 2-loader (the HEAVIEST trunks) with int8 frozen backbones:
    calibration captures scales, one step trains the translator only."""
    import jax.numpy as jnp

    from egot2x.tasks.pnr_2loader import KeyframeLocalisation2Loader

    cfg = Config(
        data_root="/nonexistent", task="keyframe_localisation2loader",
        lr=1e-3, wd=0.0, batch_size=2, num_workers=0, seed=0,
        crop_size=33, aux_crop=32, aux_num_frames=8, alpha=4, beta_inv=8,
        translation_features=32, translation_layers=1,
        quant_trunks=True,
        pnr_checkpoint=None, oscc_checkpoint=None, action_checkpoint=None,
    )
    task = KeyframeLocalisation2Loader(cfg)
    state = task.build_state(jax.random.key(0))
    assert jax.tree_util.tree_leaves(state.quant), "3D quant scales missing"

    t = task.num_frames
    rng = np.random.default_rng(0)
    batch = {
        "frames": jnp.asarray(rng.uniform(0, 1, (2, t, 33, 33, 3)),
                              jnp.float32),
        "slow": jnp.asarray(rng.standard_normal((2, 2, 32, 32, 3)),
                            jnp.float32),
        "fast": jnp.asarray(rng.standard_normal((2, 8, 32, 32, 3)),
                            jnp.float32),
        "labels": jnp.asarray(np.eye(t, dtype=np.float32)[np.zeros(2, int)]),
        "state": jnp.ones((2,), jnp.int32),
    }
    state = task.calibrate_state(state, batch)
    assert all(float(s) > 0.0 for s in jax.tree_util.tree_leaves(state.quant))
    frozen0 = jax.device_get(state.frozen)
    state, m = jax.jit(task.train_step, donate_argnums=0)(
        state, batch, jax.random.key(1))
    assert np.isfinite(float(m["loss"]))
    for (p0, p1) in zip(jax.tree_util.tree_leaves(frozen0),
                        jax.tree_util.tree_leaves(jax.device_get(state.frozen))):
        np.testing.assert_array_equal(p0, p1)
