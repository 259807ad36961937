"""uint8 device-feed parity: norm-folded stems == host normalization.

The deployment pipeline ships RAW uint8 frames to the device
(tools/bench_e2e.py) and the models fold the normalization affine into
their stem conv weights — nn/resnet2d.py ``_StemConv(fold_norm=True)``
for ImageNet RGB trunks, nn/talknet.py ``_Stem3DConv(fold_norm=(a, b))``
for the grayscale visual frontend's ``(x/255 − 0.4161)/0.1688`` — so
the input rides HBM and the host link at 1/4 the bytes and no
normalized copy is ever materialized. The fold is exact (conv is
linear; a batch-1 constant map carries the zero-padding border
correction). These tests pin the contract: a uint8 feed must produce
the same outputs as the host-normalized float feed up to float
rounding, and float feeds must be untouched.
"""

import jax
import jax.numpy as jnp
import numpy as np

from egot2x.data.lam import normalize_frames
from egot2x.nn.resnet2d import ResNet2D, normalize_u8_frames
from egot2x.nn.talknet import VisualFrontend


def test_normalize_u8_matches_host():
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (2, 3, 8, 8, 3), dtype=np.uint8)
    got = np.asarray(normalize_u8_frames(jnp.asarray(u8)))
    want = normalize_frames(u8)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_normalize_u8_noop_on_float():
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 4, 4, 3)),
                    jnp.float32)
    assert normalize_u8_frames(x) is x


def test_resnet2d_u8_feed_matches_float_feed():
    model = ResNet2D(stage_sizes=(1, 1), num_classes=4, fc2_features=8,
                     width=8)
    rng = np.random.default_rng(2)
    u8 = rng.integers(0, 256, (3, 16, 16, 3), dtype=np.uint8)
    variables = model.init(jax.random.key(0), jnp.asarray(u8), train=False)
    out_u8 = np.asarray(model.apply(variables, jnp.asarray(u8), train=False))
    out_f = np.asarray(model.apply(
        variables, jnp.asarray(normalize_frames(u8)), train=False))
    np.testing.assert_allclose(out_u8, out_f, rtol=0, atol=1e-5)


def test_talknet_visual_u8_feed_matches_float_feed():
    model = VisualFrontend()
    rng = np.random.default_rng(3)
    u8 = rng.integers(0, 256, (1, 2, 112, 112), dtype=np.uint8)
    f32 = u8.astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(f32), train=False)
    out_u8 = np.asarray(model.apply(variables, jnp.asarray(u8), train=False))
    out_f = np.asarray(model.apply(variables, jnp.asarray(f32), train=False))
    np.testing.assert_allclose(out_u8, out_f, rtol=0, atol=1e-5)


def test_flagship_translator_u8_feed_matches_float_feed():
    """Full flagship: uint8 video + video_asd feed == host-normalized feed.

    Covers the norm-folded stems end to end: the RGB stream fans out to
    the LAM and TTM trunks as raw uint8 (each folds the ImageNet affine,
    egot2s_hhi.py) plus TalkNet's folded grayscale stem.
    """
    from egot2x.core.registry import build_model
    import egot2x.translate.egot2s_hhi  # noqa: F401  (registers models)

    t = 15
    model = build_model("TaskFusionMFTransformer3Task", hidden_dim=32,
                        num_layers=1, num_heads=4)
    rng = np.random.default_rng(4)
    rgb_u8 = rng.integers(0, 256, (2, t, 32, 32, 3), dtype=np.uint8)
    asd_u8 = rng.integers(0, 256, (2, t, 112, 112), dtype=np.uint8)
    audio = jnp.asarray(rng.standard_normal((2, t * 16000 // 30)),
                        jnp.float32)
    mfcc = jnp.asarray(rng.standard_normal((2, 4 * t, 13)), jnp.float32)
    f_inputs = (jnp.asarray(normalize_frames(rgb_u8)),
                jnp.asarray(asd_u8, jnp.float32), audio, mfcc)
    u_inputs = (jnp.asarray(rgb_u8), jnp.asarray(asd_u8), audio, mfcc)
    variables = model.init(jax.random.key(0), *f_inputs, train=False)
    out_f = np.asarray(model.apply(variables, *f_inputs, train=False))
    out_u = np.asarray(model.apply(variables, *u_inputs, train=False))
    np.testing.assert_allclose(out_u, out_f, rtol=0, atol=2e-4)


def test_flagship_quant_u8_feed_matches_float_feed():
    """The benched config exactly: quant=True (int8 static PTQ) + uint8
    video feed. Same calibrated variables, u8 vs host-normalized float
    feed — the quantizer consumes identical normalized activations, so
    logits must agree to float rounding.
    """
    import jax.numpy as jnp2
    from egot2x.core.registry import build_model
    from egot2x.nn.quant import calibrate_variables
    import egot2x.translate.egot2s_hhi  # noqa: F401

    t = 15
    model = build_model("TaskFusionMFTransformer3Task", hidden_dim=32,
                        num_layers=1, num_heads=4, quant=True,
                        dtype=jnp2.bfloat16)
    rng = np.random.default_rng(5)
    rgb_u8 = rng.integers(0, 256, (2, t, 32, 32, 3), dtype=np.uint8)
    asd_u8 = rng.integers(0, 256, (2, t, 112, 112), dtype=np.uint8)
    audio = jnp.asarray(rng.standard_normal((2, t * 16000 // 30)),
                        jnp.float32)
    mfcc = jnp.asarray(rng.standard_normal((2, 4 * t, 13)), jnp.float32)
    f_inputs = (jnp.asarray(normalize_frames(rgb_u8)),
                jnp.asarray(asd_u8, jnp.float32), audio, mfcc)
    u_inputs = (jnp.asarray(rgb_u8), jnp.asarray(asd_u8), audio, mfcc)
    variables = model.init(jax.random.key(0), *f_inputs, train=False)
    variables = calibrate_variables(model, variables, *f_inputs,
                                    train=False)
    out_f = np.asarray(model.apply(variables, *f_inputs, train=False),
                       np.float32)
    out_u = np.asarray(model.apply(variables, *u_inputs, train=False),
                       np.float32)
    # bf16 compute: identical quantized trunks, rounding-only delta
    np.testing.assert_allclose(out_u, out_f, rtol=0, atol=5e-2)
    assert np.isfinite(out_u).all()


def test_videostem_u8_fold_matches_host_normalize():
    """HOI 3D stem: raw uint8 + folded Ego4D normalize == host
    normalize_clip float feed (nn/resnet3d.py VideoStem default)."""
    from egot2x.data.lta import normalize_clip
    from egot2x.nn.resnet3d import VideoStem

    model = VideoStem(width=8, temp_kernel=3)
    rng = np.random.default_rng(6)
    u8 = rng.integers(0, 256, (2, 4, 16, 16, 3), dtype=np.uint8)
    variables = model.init(jax.random.key(0), jnp.asarray(u8), train=False)
    out_u8 = np.asarray(model.apply(variables, jnp.asarray(u8), train=False))
    out_f = np.asarray(model.apply(
        variables, jnp.asarray(normalize_clip(u8)), train=False))
    np.testing.assert_allclose(out_u8, out_f, rtol=0, atol=1e-4)


def test_videostem_u8_raw_cast_matches_float255():
    """PNR raw-[0,255] convention (input_norm=None): a uint8 feed is a
    pure cast — bit-identical to the float [0,255] feed."""
    from egot2x.nn.resnet3d import VideoStem

    model = VideoStem(width=8, temp_kernel=3, input_norm=None)
    rng = np.random.default_rng(7)
    u8 = rng.integers(0, 256, (2, 4, 16, 16, 3), dtype=np.uint8)
    variables = model.init(jax.random.key(0), jnp.asarray(u8), train=False)
    out_u8 = np.asarray(model.apply(variables, jnp.asarray(u8), train=False))
    out_f = np.asarray(model.apply(
        variables, jnp.asarray(u8, jnp.float32), train=False))
    np.testing.assert_array_equal(out_u8, out_f)


def test_slowfast_u8_pathways_match_float(tmp_path):
    """SlowFast consumes the loader's raw-uint8 [slow, fast] pathways ==
    host-normalized float pathways (both stems fold)."""
    from egot2x.data.lta import normalize_clip
    from egot2x.nn.slowfast import SlowFast

    model = SlowFast(width_per_group=8, alpha=4, beta_inv=8,
                     num_block_temp_kernel=(1, 1, 1, 1))
    rng = np.random.default_rng(8)
    slow_u8 = rng.integers(0, 256, (1, 1, 32, 32, 3), dtype=np.uint8)
    fast_u8 = rng.integers(0, 256, (1, 4, 32, 32, 3), dtype=np.uint8)
    u_in = [jnp.asarray(slow_u8), jnp.asarray(fast_u8)]
    f_in = [jnp.asarray(normalize_clip(slow_u8)),
            jnp.asarray(normalize_clip(fast_u8))]
    variables = model.init(jax.random.key(0), u_in, train=False)
    out_u = model.apply(variables, u_in, train=False)
    out_f = model.apply(variables, f_in, train=False)
    for u, f in zip(out_u, out_f):
        np.testing.assert_allclose(np.asarray(u), np.asarray(f),
                                   rtol=0, atol=5e-4)


def test_mvit_u8_feed_matches_float_feed():
    """MViT normalizes integer input in-jit (Ego4D stats) == the host
    normalize_clip float feed."""
    from egot2x.data.lta import normalize_clip
    from egot2x.nn.mvit import MViT

    model = MViT(embed_dim=16, depth=2, num_heads=1, num_classes=(5,),
                 num_frames=4, dim_mul_blocks=(1,), head_mul_blocks=(1,),
                 q_pool_blocks=(1,), drop_path_rate=0.0, dropout_rate=0.0)
    rng = np.random.default_rng(9)
    u8 = rng.integers(0, 256, (1, 4, 32, 32, 3), dtype=np.uint8)
    variables = model.init(jax.random.key(0), jnp.asarray(u8), train=False)
    out_u8 = model.apply(variables, jnp.asarray(u8), train=False)
    out_f = model.apply(variables, jnp.asarray(normalize_clip(u8)),
                        train=False)
    np.testing.assert_allclose(np.asarray(out_u8[0]), np.asarray(out_f[0]),
                               rtol=0, atol=1e-4)


def test_fold_gradients_match_float_path():
    """The folds sit in the TRAINING path (loaders ship uint8), so the
    kernel gradients through the folded stems must equal the gradients
    of the explicit-normalize float path (both terms are linear in the
    kernel; equality is float-rounding only)."""
    from egot2x.data.lta import normalize_clip
    from egot2x.nn.resnet3d import VideoStem

    model = VideoStem(width=8, temp_kernel=3)
    rng = np.random.default_rng(10)
    u8 = rng.integers(0, 256, (2, 4, 16, 16, 3), dtype=np.uint8)
    variables = model.init(jax.random.key(0), jnp.asarray(u8), train=False)

    def loss_u8(params):
        out = model.apply({**variables, "params": params},
                          jnp.asarray(u8), train=False)
        return jnp.sum(out * out)

    def loss_f(params):
        out = model.apply({**variables, "params": params},
                          jnp.asarray(normalize_clip(u8)), train=False)
        return jnp.sum(out * out)

    g_u8 = jax.grad(loss_u8)(variables["params"])
    g_f = jax.grad(loss_f)(variables["params"])
    flat_u8 = jax.tree_util.tree_leaves(g_u8)
    flat_f = jax.tree_util.tree_leaves(g_f)
    for a, b in zip(flat_u8, flat_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-3)


def test_resnet2d_u8_fused_stem_matches_float():
    """fold_norm composes with the space-to-depth stem transform: the
    folded kernel rides the same re-indexing and the bias map is built
    by the same padded conv."""
    model = ResNet2D(stage_sizes=(1,), num_classes=4, fc2_features=8,
                     width=8, fused_stem=True)
    rng = np.random.default_rng(11)
    u8 = rng.integers(0, 256, (2, 17, 17, 3), dtype=np.uint8)
    variables = model.init(jax.random.key(0), jnp.asarray(u8), train=False)
    out_u8 = np.asarray(model.apply(variables, jnp.asarray(u8), train=False))
    out_f = np.asarray(model.apply(
        variables, jnp.asarray(normalize_frames(u8)), train=False))
    np.testing.assert_allclose(out_u8, out_f, rtol=0, atol=1e-5)


def test_packed_phase_pool_grad_under_jit():
    """Regression (round 4): the pool's -inf init must be a CONCRETE
    python scalar. A jnp.asarray(-inf, dtype) init becomes a traced
    constant under jit, JAX's monoid pattern-match misses it and binds
    the generic reduce_window_p, which has no autodiff rule — nofreeze
    training (jit(value_and_grad) through the frozen-eval TalkNet)
    then fails to linearize."""
    from egot2x.nn.talknet import _packed_phase_pool

    f = jax.jit(jax.grad(
        lambda y: jnp.sum(_packed_phase_pool(y)).astype(jnp.float32)))
    g = f(jnp.ones((1, 8, 8, 8), jnp.bfloat16))
    assert g.shape == (1, 8, 8, 8)
    assert bool(jnp.isfinite(g.astype(jnp.float32)).all())
