"""Shape/numeric tests for core nn modules, incl. torch-parity checks for
the BiLSTM and post-LN transformer layers (torch CPU is available)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egot2x.nn.common import (
    MultiHeadAttention,
    PositionalEncoding,
    TransformerDecoder,
    TransformerEncoder,
    sinusoidal_positional_encoding,
)
from egot2x.nn.lstm import BiLSTM, LSTMLayer
from egot2x.nn.resnet2d import ResNet2D, resnet18


def test_resnet18_shapes(rng):
    model = resnet18(num_classes=256)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), dtype=jnp.float32)
    variables = model.init(jax.random.key(0), x)
    out = model.apply(variables, x)
    assert out.shape == (2, 256)
    feats = model.apply(variables, x, features_only=True)
    assert feats.shape == (2, 512)


def test_resnet18_batchnorm_train_updates(rng):
    model = resnet18(num_classes=8)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), dtype=jnp.float32)
    variables = model.init(jax.random.key(0), x)
    out, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 8)
    # running stats moved away from init
    leaf = jax.tree_util.tree_leaves(mutated["batch_stats"])[0]
    assert np.isfinite(np.asarray(leaf)).all()


def test_lstm_matches_torch(rng):
    torch = pytest.importorskip("torch")
    b, t, d, h = 3, 5, 8, 16
    x = rng.standard_normal((b, t, d)).astype(np.float32)

    tl = torch.nn.LSTM(d, h, num_layers=1, batch_first=True, bidirectional=False)
    layer = LSTMLayer(hidden=h)
    params = layer.init(jax.random.key(0), jnp.asarray(x))["params"]
    # copy torch weights into ours (torch stores (4H, D); we store (D, 4H))
    params = {
        "w_ih": jnp.asarray(tl.weight_ih_l0.detach().numpy().T),
        "w_hh": jnp.asarray(tl.weight_hh_l0.detach().numpy().T),
        "b_ih": jnp.asarray(tl.bias_ih_l0.detach().numpy()),
        "b_hh": jnp.asarray(tl.bias_hh_l0.detach().numpy()),
    }
    ours = np.asarray(layer.apply({"params": params}, jnp.asarray(x)))
    theirs = tl(torch.from_numpy(x))[0].detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_bilstm_matches_torch(rng):
    torch = pytest.importorskip("torch")
    b, t, d = 2, 7, 12
    h = 12  # torch bidirectional multi-layer feeds 2h into next layer
    x = rng.standard_normal((b, t, d)).astype(np.float32)
    tl = torch.nn.LSTM(d, h, num_layers=2, batch_first=True, bidirectional=True)
    model = BiLSTM(hidden=h, num_layers=2)
    params = model.init(jax.random.key(0), jnp.asarray(x))["params"]
    new_params = {}
    for layer in range(2):
        for direction, tag in [(0, "fwd"), (1, "bwd")]:
            sfx = f"_reverse" if direction else ""
            new_params[f"l{layer}_{tag}"] = {
                "w_ih": jnp.asarray(getattr(tl, f"weight_ih_l{layer}{sfx}").detach().numpy().T),
                "w_hh": jnp.asarray(getattr(tl, f"weight_hh_l{layer}{sfx}").detach().numpy().T),
                "b_ih": jnp.asarray(getattr(tl, f"bias_ih_l{layer}{sfx}").detach().numpy()),
                "b_hh": jnp.asarray(getattr(tl, f"bias_hh_l{layer}{sfx}").detach().numpy()),
            }
    ours = np.asarray(model.apply({"params": new_params}, jnp.asarray(x)))
    theirs = tl(torch.from_numpy(x))[0].detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_positional_encoding_matches_reference_formula():
    pe = np.asarray(sinusoidal_positional_encoding(50, 16))
    pos, i = 7, 3
    np.testing.assert_allclose(
        pe[pos, 2 * i], np.sin(pos * np.exp(2 * i * (-np.log(10000.0) / 16))),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        pe[pos, 2 * i + 1], np.cos(pos * np.exp(2 * i * (-np.log(10000.0) / 16))),
        rtol=1e-5,
    )


def test_transformer_encoder_shapes(rng):
    model = TransformerEncoder(num_layers=2, d_model=32, num_heads=4,
                               dim_feedforward=64)
    x = jnp.asarray(rng.standard_normal((2, 10, 32)), dtype=jnp.float32)
    variables = model.init(jax.random.key(0), x)
    out = model.apply(variables, x)
    assert out.shape == (2, 10, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_transformer_encoder_matches_torch(rng):
    torch = pytest.importorskip("torch")
    d, heads, ff = 16, 4, 32
    x = rng.standard_normal((2, 6, d)).astype(np.float32)

    tlayer = torch.nn.TransformerEncoderLayer(d, heads, ff, dropout=0.0,
                                              batch_first=True)
    tlayer.eval()
    model = TransformerEncoder(num_layers=1, d_model=d, num_heads=heads,
                               dim_feedforward=ff, dropout=0.0)
    variables = model.init(jax.random.key(0), jnp.asarray(x))

    # map torch weights → ours
    with torch.no_grad():
        in_w = tlayer.self_attn.in_proj_weight.numpy()
        in_b = tlayer.self_attn.in_proj_bias.numpy()
    qw, kw, vw = np.split(in_w, 3, axis=0)
    qb, kb, vb = np.split(in_b, 3, axis=0)
    p = {
        "layers_0": {
            "self_attn": {
                "q_proj": {"kernel": jnp.asarray(qw.T), "bias": jnp.asarray(qb)},
                "k_proj": {"kernel": jnp.asarray(kw.T), "bias": jnp.asarray(kb)},
                "v_proj": {"kernel": jnp.asarray(vw.T), "bias": jnp.asarray(vb)},
                "out_proj": {
                    "kernel": jnp.asarray(tlayer.self_attn.out_proj.weight.detach().numpy().T),
                    "bias": jnp.asarray(tlayer.self_attn.out_proj.bias.detach().numpy()),
                },
            },
            "norm1": {"scale": jnp.asarray(tlayer.norm1.weight.detach().numpy()),
                      "bias": jnp.asarray(tlayer.norm1.bias.detach().numpy())},
            "norm2": {"scale": jnp.asarray(tlayer.norm2.weight.detach().numpy()),
                      "bias": jnp.asarray(tlayer.norm2.bias.detach().numpy())},
            "linear1": {"kernel": jnp.asarray(tlayer.linear1.weight.detach().numpy().T),
                        "bias": jnp.asarray(tlayer.linear1.bias.detach().numpy())},
            "linear2": {"kernel": jnp.asarray(tlayer.linear2.weight.detach().numpy().T),
                        "bias": jnp.asarray(tlayer.linear2.bias.detach().numpy())},
        }
    }
    ours = np.asarray(model.apply({"params": p}, jnp.asarray(x)))
    theirs = tlayer(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_decoder_causal_masking(rng):
    model = TransformerDecoder(num_layers=1, d_model=16, num_heads=2,
                               dim_feedforward=32, dropout=0.0)
    tgt = jnp.asarray(rng.standard_normal((1, 4, 16)), dtype=jnp.float32)
    mem = jnp.asarray(rng.standard_normal((1, 6, 16)), dtype=jnp.float32)
    variables = model.init(jax.random.key(0), tgt, mem)
    out1 = model.apply(variables, tgt, mem)
    # perturb the future: position 0 output must not change
    tgt2 = tgt.at[:, -1].add(100.0)
    out2 = model.apply(variables, tgt2, mem)
    np.testing.assert_allclose(out1[:, 0], out2[:, 0], rtol=1e-4, atol=1e-5)
    assert not np.allclose(out1[:, -1], out2[:, -1])


def test_s2d_stem_exact(rng):
    from egot2x.nn.resnet2d import _s2d_stem_conv

    for size in (224, 65, 64, 33):
        x = jnp.asarray(rng.standard_normal((1, size, size, 3)), dtype=jnp.float32)
        k = jnp.asarray(rng.standard_normal((7, 7, 3, 64)), dtype=jnp.float32)
        ref = jax.lax.conv_general_dilated(
            x, k, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        fused = _s2d_stem_conv(x, k, jnp.float32)
        assert ref.shape == fused.shape
        np.testing.assert_allclose(np.asarray(ref), np.asarray(fused),
                                   rtol=1e-4, atol=1e-4)
