"""int8 static-PTQ path: float-parity gate (egot2x.nn.quant)."""

import jax
import jax.numpy as jnp
import numpy as np

from egot2x.nn.quant import QuantConv, calibrate_variables
from egot2x.nn.resnet2d import ResNet2D


def test_quantconv_param_layout_matches_nn_conv(rng):
    """QuantConv must keep nn.Conv's param layout so float checkpoints
    and torch-import rules apply unchanged."""
    from flax import linen as nn

    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    qc = QuantConv(8, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
    cv = nn.Conv(8, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                 use_bias=False)
    vq = qc.init(jax.random.key(0), x)
    vc = cv.init(jax.random.key(0), x)
    assert vq["params"]["kernel"].shape == vc["params"]["kernel"].shape
    # calibrated float pass == plain conv bit-for-bit
    vq = {"params": vc["params"], "quant": vq["quant"]}
    out_cal, _ = qc.apply(vq, x, calibrate=True, mutable=["quant"])
    np.testing.assert_allclose(np.asarray(out_cal),
                               np.asarray(cv.apply(vc, x)), atol=1e-6)


def test_resnet2d_int8_close_to_float(rng):
    """Calibrated int8 resnet18 forward stays close to the float model
    (random weights are the PTQ worst case; trained weights do better)."""
    m_f = ResNet2D(num_classes=16)
    m_q = ResNet2D(num_classes=16, quant=True)
    x = jnp.asarray(rng.standard_normal((4, 64, 64, 3)), jnp.float32)
    vf = m_f.init(jax.random.key(0), x)
    vq0 = m_q.init(jax.random.key(0), x)
    assert (jax.tree_util.tree_structure(vf["params"])
            == jax.tree_util.tree_structure(vq0["params"]))
    vq = {"params": vf["params"], "batch_stats": vf["batch_stats"],
          "quant": vq0["quant"]}
    vq = calibrate_variables(m_q, vq, x)
    # every conv captured a scale
    scales = jax.tree_util.tree_leaves(vq["quant"])
    assert all(float(s) > 0 for s in scales), "uncalibrated act_max left"
    out_f = np.asarray(m_f.apply(vf, x))
    out_q = np.asarray(m_q.apply(vq, x))
    cos = float((out_f * out_q).sum()
                / (np.linalg.norm(out_f) * np.linalg.norm(out_q) + 1e-9))
    assert cos > 0.995, f"int8 deviates from float: cosine={cos}"
