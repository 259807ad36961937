"""Fused dual-stem deployment path (egot2x.nn.fused_stem).

The flagship translator's LAM + TTM-video trunks consume the SAME
frames; under int8 inference their two 7x7/2 stems can run as ONE
(7, 7, 3, 128) conv whose int8 output map is full lane density
(measured −2.8% on the dual trunk, tools/exp_grouped_trunk.py).
These tests pin the deployment contract:

  * the fused path is numerically equivalent to the separate-stem path
    on the SAME trained/calibrated variables (not bit-exact — the
    128-wide conv and the per-channel-vector quantize divisor can flip
    int8 values by one quantum near rounding boundaries; the logits
    must stay essentially identical);
  * the fused flag is inert everywhere outside int8 inference (init,
    calibration, training all take the separate path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egot2x.core.registry import build_model
from egot2x.nn.quant import calibrate_variables


def _cosine(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


@pytest.fixture(scope="module")
def flagship_setup():
    import egot2x.translate.egot2s_hhi  # noqa: F401

    kw = dict(hidden_dim=32, num_layers=1, num_heads=4, dropout=0.0,
              quant=True, dtype=jnp.bfloat16)
    model = build_model("TaskFusionMFTransformer3Task", **kw)
    fused = build_model("TaskFusionMFTransformer3Task", fuse_stems=True,
                        **kw)
    rng = np.random.default_rng(0)
    b, t, img = 2, 5, 32
    inputs = (
        jnp.asarray(rng.standard_normal((b, t, img, img, 3)), jnp.float32),
        jnp.asarray(rng.uniform(0, 255, (b, t, 112, 112)), jnp.float32),
        jnp.asarray(rng.standard_normal((b, t * 16000 // 30)), jnp.float32),
        jnp.asarray(rng.standard_normal((b, 4 * t, 13)), jnp.float32),
    )
    variables = model.init(jax.random.key(0), *inputs, train=False)
    variables = calibrate_variables(model, dict(variables), *inputs,
                                    train=False)
    return model, fused, variables, inputs


def test_fused_stem_matches_separate(flagship_setup):
    model, fused, variables, inputs = flagship_setup
    ref = model.apply(variables, *inputs, train=False)
    out = fused.apply(variables, *inputs, train=False)
    assert out.shape == ref.shape
    ref = np.asarray(ref, np.float32)
    out = np.asarray(out, np.float32)
    assert _cosine(ref, out) > 0.999
    # one int8 quantum at the stem must not move bf16 logits materially
    np.testing.assert_allclose(out, ref, rtol=0.05, atol=0.05)


def test_fused_stem_matches_separate_u8_feed(flagship_setup):
    model, fused, variables, _ = flagship_setup
    rng = np.random.default_rng(1)
    b, t, img = 2, 5, 32
    inputs = (
        jnp.asarray(rng.integers(0, 256, (b, t, img, img, 3)), jnp.uint8),
        jnp.asarray(rng.uniform(0, 255, (b, t, 112, 112)), jnp.float32),
        jnp.asarray(rng.standard_normal((b, t * 16000 // 30)), jnp.float32),
        jnp.asarray(rng.standard_normal((b, 4 * t, 13)), jnp.float32),
    )
    ref = np.asarray(model.apply(variables, *inputs, train=False),
                     np.float32)
    out = np.asarray(fused.apply(variables, *inputs, train=False),
                     np.float32)
    assert _cosine(ref, out) > 0.999
    np.testing.assert_allclose(out, ref, rtol=0.05, atol=0.05)


def test_fused_flag_inert_at_init_and_calibration(flagship_setup):
    """init and calibration under fuse_stems=True must produce the same
    variable structure as the separate model (the fused path only
    activates for bound int8 inference)."""
    model, fused, variables, inputs = flagship_setup
    v2 = fused.init(jax.random.key(0), *inputs, train=False)
    ref_td = jax.tree_util.tree_structure(jax.tree_util.tree_map(
        np.shape, dict(variables)))
    new_td = jax.tree_util.tree_structure(jax.tree_util.tree_map(
        np.shape, dict(v2)))
    assert ref_td == new_td
    # calibration with the fused flag still runs (separate path) and
    # refreshes every scale
    v3 = calibrate_variables(fused, dict(v2), *inputs, train=False)
    assert all(float(s) > 0
               for s in jax.tree_util.tree_leaves(v3["quant"]))
