"""int8 static-PTQ for the HOI 3-D trunks (QuantConv3D).

Mirrors tests/test_quant.py's trunk-level checks for the 2-D path and
adds a ts_pnr-translator accuracy gate on the synthetic PNR geometry:
the quantized model must track the float model's logits (cosine) and
its argmax decisions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egot2x.nn.quant import QuantConv3D, assert_calibrated, calibrate_variables


def _cosine(a, b):
    a, b = np.asarray(a, np.float64).ravel(), np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def test_quantconv3d_matches_float(rng):
    conv = QuantConv3D(16, (3, 3, 3), strides=(1, 2, 2),
                       padding=[(1, 1), (1, 1), (1, 1)])
    x = jnp.asarray(rng.standard_normal((2, 4, 8, 8, 8)).astype(np.float32))
    variables = conv.init(jax.random.key(0), x)
    # calibrate captures act_max and returns the float forward
    y_float, mutated = conv.apply(variables, x, calibrate=True,
                                  mutable=["quant"])
    variables = {**variables, "quant": mutated["quant"]}
    assert float(jax.tree_util.tree_leaves(variables["quant"])[0]) > 0
    y_int8 = conv.apply(variables, x)
    assert y_int8.shape == y_float.shape
    assert _cosine(y_int8, y_float) > 0.999


def test_resnet3d_quant_trunk_cosine(rng):
    from egot2x.models.pnr import StateChangeClsResNet

    x = jnp.asarray(
        rng.uniform(0, 255, (1, 2, 65, 65, 3)).astype(np.float32))
    mf = StateChangeClsResNet(crop_size=65, quant=False)
    variables = mf.init(jax.random.key(0), x)
    # randomized BN stats: identity stats would under-exercise the
    # dequant→BN fusion path
    bs = jax.tree_util.tree_map(
        lambda v: v + jnp.asarray(
            rng.uniform(0.05, 0.2, v.shape).astype(np.float32)),
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": bs}
    y_float = mf.apply(variables, x, train=False)

    mq = StateChangeClsResNet(crop_size=65, quant=True)
    qvars = mq.init(jax.random.key(0), x)
    qvars = {**variables, "quant": qvars["quant"]}
    with pytest.raises(ValueError):
        assert_calibrated(qvars)  # uncalibrated scales must fail loudly
    qvars = calibrate_variables(mq, qvars, x, train=False)
    assert_calibrated(qvars)
    y_int8 = mq.apply(qvars, x, train=False)
    assert _cosine(y_int8, y_float) > 0.99
    # calibration forward IS the float forward
    y_cal, _ = mq.apply(qvars, x, train=False, calibrate=True,
                        mutable=["quant"])
    np.testing.assert_allclose(np.asarray(y_cal), np.asarray(y_float),
                               rtol=1e-5, atol=1e-5)


def test_ts_pnr_translator_quant_gate(rng):
    """Accuracy gate on the full ts_pnr 3-task translator (the HOI
    inference bench config): float-vs-int8 logit cosine and argmax
    agreement on PNR-fixture-shaped inputs."""
    from egot2x.core.registry import build_model
    import egot2x.translate.egot2s_hoi  # noqa: F401

    b, t_pnr, s_pnr, s_act, t_fast, alpha = 2, 4, 65, 64, 8, 4
    frames = jnp.asarray(
        rng.uniform(0, 255, (b, t_pnr, s_pnr, s_pnr, 3)).astype(np.float32))
    pathways = [
        jnp.asarray(rng.uniform(
            -1, 1, (b, t_fast // alpha, s_act, s_act, 3)).astype(np.float32)),
        jnp.asarray(rng.uniform(
            -1, 1, (b, t_fast, s_act, s_act, 3)).astype(np.float32)),
    ]
    kw = dict(target="state", feature_dim=64, num_layers=1,
              crop_size=s_pnr, alpha=alpha, beta_inv=8)
    mf = build_model("TaskFusionMFTransformer3TaskDropout", quant=False, **kw)
    variables = mf.init(jax.random.key(0), frames, pathways, train=False)
    y_float = mf.apply(variables, frames, pathways, train=False)

    mq = build_model("TaskFusionMFTransformer3TaskDropout", quant=True, **kw)
    qvars = mq.init(jax.random.key(0), frames, pathways, train=False)
    qvars = {"params": variables["params"],
             "batch_stats": variables["batch_stats"],
             "quant": qvars["quant"]}
    qvars = calibrate_variables(mq, qvars, frames, pathways, train=False)
    assert_calibrated(qvars)
    y_int8 = mq.apply(qvars, frames, pathways, train=False)
    assert y_int8.shape == y_float.shape == (b, 2)
    assert _cosine(y_int8, y_float) > 0.99
    assert (np.argmax(np.asarray(y_int8), -1)
            == np.argmax(np.asarray(y_float), -1)).all()
