"""Round-2 EgoT2-s HOI translator variants (VERDICT missing item #3).

Covers the AR-side transfer models (lta_models_transfer.py), LTA-side
transfer models (lta_models_lta_transfer.py), the PNR-side simple_vit /
late-fusion 3-task variants (video_model_transfer_3task.py), and the
shared-LN head tying fix."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egot2x.core.registry import build_model
from egot2x.train.state import split_params
from egot2x.translate.egot2s_hoi import HOI_FROZEN_KEYS

import egot2x.translate.egot2s_hoi  # noqa: F401

S = 65
AC = 64
T_PNR = 16
T_FAST = 8
ALPHA = 4


def _pnr_frames(rng, b=1, clips=None):
    shape = (b, T_PNR, S, S, 3)
    if clips:
        shape = (b, clips) + shape[1:]
    return jnp.asarray(rng.uniform(0, 255, shape), dtype=jnp.float32)


def _pathways(rng, b=1, clips=None):
    shape_s = (b, T_FAST // ALPHA, AC, AC, 3)
    shape_f = (b, T_FAST, AC, AC, 3)
    if clips:
        shape_s = (b, clips) + shape_s[1:]
        shape_f = (b, clips) + shape_f[1:]
    return [jnp.asarray(rng.standard_normal(shape_s), dtype=jnp.float32),
            jnp.asarray(rng.standard_normal(shape_f), dtype=jnp.float32)]


def test_pnr_simple_vit_variant(rng):
    model = build_model("TaskFusionMFTransformer3TaskPnr",
                        target="state", crop_size=S, feature_dim=64,
                        depth=1, dim_head=16, mlp_dim=32, alpha=ALPHA)
    frames, pw = _pnr_frames(rng), _pathways(rng)
    v = model.init(jax.random.key(0), frames, pw, train=False)
    assert model.apply(v, frames, pw, train=False).shape == (1, 2)
    # pre-LN encoder params present; shared LN means no separate head_ln
    assert "transformer" in v["params"]
    assert "head_ln" not in v["params"]


def test_pnr_lf_variants(rng):
    frames, pw = _pnr_frames(rng), _pathways(rng)
    lf = build_model("TaskFusionLFLinear3TaskPnr", target="keyframe",
                     crop_size=S, feature_dim=64, alpha=ALPHA)
    v = lf.init(jax.random.key(0), frames, pw, train=False)
    assert lf.apply(v, frames, pw, train=False).shape == (1, 16)

    simple = build_model("TaskFusionLFLinear3TaskSimple", target="state",
                         crop_size=S, feature_dim=32, alpha=ALPHA)
    v = simple.init(jax.random.key(0), frames, pw, train=False)
    assert simple.apply(v, frames, pw, train=False).shape == (1, 2)
    # AR feature head stays trainable (freeze_backbone_params semantics)
    trainable, frozen = split_params(
        v["params"], lambda k: k in HOI_FROZEN_KEYS)
    assert "action_head" in trainable and "action_model" in frozen

    lft = build_model("TaskFusionLFTransformer3TaskDropout", target="state",
                      crop_size=S, feature_dim=32, num_layers=1, alpha=ALPHA)
    v = lft.init(jax.random.key(0), frames, pw, train=False)
    assert lft.apply(v, frames, pw, train=False).shape == (1, 2)


def test_finetune_action_and_lta2action(rng):
    pw_single = _pathways(rng)
    fa = build_model("FinetuneAction", num_classes=(7, 9), alpha=ALPHA)
    v = fa.init(jax.random.key(0), pw_single, train=False)
    verb, noun = fa.apply(v, pw_single, train=False)
    assert verb.shape == (1, 7) and noun.shape == (1, 9)

    pw = _pathways(rng, clips=2)
    l2a = build_model("LTA2Action", num_classes=(7, 9), feature_dim=32,
                      num_input_clips=2, alpha=ALPHA)
    v = l2a.init(jax.random.key(0), pw, train=False)
    verb, noun = l2a.apply(v, pw, train=False)
    assert verb.shape == (1, 7) and noun.shape == (1, 9)
    _, frozen = split_params(v["params"], lambda k: k in HOI_FROZEN_KEYS)
    assert "lta_model" in frozen


def test_ar_2task_transformer(rng):
    pw = _pathways(rng, clips=2)
    model = build_model("TaskFusionMFTransformer2TaskAR", num_classes=(7, 9),
                        feature_dim=32, num_layers=1, num_input_clips=2,
                        alpha=ALPHA)
    v = model.init(jax.random.key(0), pw, train=False)
    verb, noun = model.apply(v, pw, train=False)
    assert verb.shape == (1, 7) and noun.shape == (1, 9)
    # 18-token sequence: T_FAST/ALPHA slow + 8 fast + 2 lta
    assert v["params"]["core"]["pe"].shape[1] == T_FAST // ALPHA + 8 + 2


def test_lta_transfer_variants(rng):
    pw = _pathways(rng, clips=2)
    frames = _pnr_frames(rng, clips=2)

    ft = build_model("FinetuneLTA", num_classes=(7, 9), num_actions=4,
                     num_input_clips=2, alpha=ALPHA)
    v = ft.init(jax.random.key(0), pw, train=False)
    verb, noun = ft.apply(v, pw, train=False)
    assert verb.shape == (1, 4, 7) and noun.shape == (1, 4, 9)
    preds = ft.apply(v, pw, k=2, rng=jax.random.key(1), method="generate")
    assert preds[0].shape == (1, 2, 4)

    for name, key in [("Keyframe2LTA", "pnr_model"),
                      ("State2LTA", "oscc_model")]:
        m = build_model(name, num_classes=(7, 9), num_actions=4,
                        feature_dim=32, crop_size=S, alpha=ALPHA)
        v = m.init(jax.random.key(0), pw, frames, train=False)
        verb, noun = m.apply(v, pw, frames, train=False)
        assert verb.shape == (1, 4, 7), name
        _, frozen = split_params(v["params"], lambda k: k in HOI_FROZEN_KEYS)
        assert key in frozen, name


def test_lf_linear_4task(rng):
    pw = _pathways(rng, clips=2)
    frames = _pnr_frames(rng, clips=2)
    m = build_model("TaskFusionLFLinear4Task", num_classes=(7, 9),
                    num_actions=4, feature_dim=32, crop_size=S, alpha=ALPHA)
    v = m.init(jax.random.key(0), pw, frames, train=False)
    verb, noun = m.apply(v, pw, frames, train=False)
    assert verb.shape == (1, 4, 7) and noun.shape == (1, 4, 9)
    trainable, frozen = split_params(v["params"], lambda k: k in HOI_FROZEN_KEYS)
    assert {"pnr_model", "oscc_model", "action_model", "lta_model"} <= set(frozen)
    assert "action_head" in trainable


def test_seq_decoder_2task(rng):
    vocab_size, verbs, nouns = 24, list(range(2, 9)), list(range(9, 18))
    pw = _pathways(rng, clips=2)
    m = build_model("TaskFusionMFTransformer2TaskSeqDecoder",
                    vocab_size=vocab_size, verb_ids=verbs, noun_ids=nouns,
                    verb_bos=0, noun_bos=1, feature_dim=32, num_layers=1,
                    num_input_clips=2, alpha=ALPHA)
    tgt = jnp.zeros((1, 3), jnp.int32)
    v = m.init(jax.random.key(0), pw, tgt, train=False)
    out = m.apply(v, pw, tgt, train=False)
    assert out.shape == (1, 3, vocab_size)
    preds_v, preds_n = m.apply(v, pw, method="predict")
    assert preds_v.shape == (1, 1, len(verbs))
    assert preds_n.shape == (1, 1, len(nouns))


def test_shared_head_ln_tied(rng):
    """The ts_pnr translator must use ONE LayerNorm for both the pre-PE
    normalization and the head (reference Sequential(self.ln, Linear))."""
    model = build_model("TaskFusionMFTransformer3TaskDropout",
                        target="state", crop_size=S, feature_dim=64,
                        num_layers=1, alpha=ALPHA)
    frames, pw = _pnr_frames(rng), _pathways(rng)
    v = model.init(jax.random.key(0), frames, pw, train=False)
    assert "head_ln" not in v["params"]
    assert "ln" in v["params"]["core"]
    # scaling core/ln must change the head input (proof it feeds the head)
    out0 = model.apply(v, frames, pw, train=False)
    v2 = jax.tree_util.tree_map(lambda x: x, v)
    import flax

    v2 = flax.core.unfreeze(v2) if hasattr(flax.core, "unfreeze") else v2
    v2["params"]["core"]["ln"]["scale"] = (
        v["params"]["core"]["ln"]["scale"] * 3.0)
    out1 = model.apply(v2, frames, pw, train=False)
    assert not np.allclose(np.asarray(out0), np.asarray(out1))


def test_simple_vit_encoder_torch_parity(rng):
    """Forward parity of SimpleViTEncoder against a torch replica of the
    reference simple_vit Transformer (HOI/models/pnr/simple_vit.py:55-107)."""
    torch = pytest.importorskip("torch")
    from egot2x.nn.simple_vit import SimpleViTEncoder

    dim, heads, dim_head, mlp_dim, depth = 16, 2, 8, 24, 2
    enc = SimpleViTEncoder(dim, depth, heads, dim_head, mlp_dim)
    x = rng.standard_normal((2, 5, dim)).astype(np.float32)
    v = enc.init(jax.random.key(0), jnp.asarray(x))

    class TAttention(torch.nn.Module):
        def __init__(self):
            super().__init__()
            inner = heads * dim_head
            self.norm = torch.nn.LayerNorm(dim)
            self.to_qkv = torch.nn.Linear(dim, inner * 3, bias=False)
            self.to_out = torch.nn.Linear(inner, dim, bias=False)

        def forward(self, x):
            x = self.norm(x)
            qkv = self.to_qkv(x).chunk(3, dim=-1)
            b, n, _ = x.shape
            q, k, v = [t.reshape(b, n, heads, dim_head).permute(0, 2, 1, 3)
                       for t in qkv]
            dots = torch.matmul(q, k.transpose(-1, -2)) * dim_head ** -0.5
            out = torch.matmul(dots.softmax(dim=-1), v)
            out = out.permute(0, 2, 1, 3).reshape(b, n, heads * dim_head)
            return self.to_out(out)

    class TFF(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.net = torch.nn.Sequential(
                torch.nn.LayerNorm(dim), torch.nn.Linear(dim, mlp_dim),
                torch.nn.GELU(), torch.nn.Linear(mlp_dim, dim))

        def forward(self, x):
            return self.net(x)

    layers = [(TAttention(), TFF()) for _ in range(depth)]
    with torch.no_grad():
        for i, (attn, ff) in enumerate(layers):
            pa = v["params"][f"attn_{i}"]
            attn.norm.weight.copy_(torch.from_numpy(np.asarray(pa["norm"]["scale"])))
            attn.norm.bias.copy_(torch.from_numpy(np.asarray(pa["norm"]["bias"])))
            attn.to_qkv.weight.copy_(torch.from_numpy(np.asarray(pa["to_qkv"]["kernel"])).T)
            attn.to_out.weight.copy_(torch.from_numpy(np.asarray(pa["to_out"]["kernel"])).T)
            pf = v["params"][f"ff_{i}"]
            ff.net[0].weight.copy_(torch.from_numpy(np.asarray(pf["norm"]["scale"])))
            ff.net[0].bias.copy_(torch.from_numpy(np.asarray(pf["norm"]["bias"])))
            ff.net[1].weight.copy_(torch.from_numpy(np.asarray(pf["fc1"]["kernel"])).T)
            ff.net[1].bias.copy_(torch.from_numpy(np.asarray(pf["fc1"]["bias"])))
            ff.net[3].weight.copy_(torch.from_numpy(np.asarray(pf["fc2"]["kernel"])).T)
            ff.net[3].bias.copy_(torch.from_numpy(np.asarray(pf["fc2"]["bias"])))

        tx = torch.from_numpy(x)
        for attn, ff in layers:
            tx = attn(tx) + tx
            tx = ff(tx) + tx

    ours = np.asarray(enc.apply(v, jnp.asarray(x)))
    np.testing.assert_allclose(ours, tx.numpy(), rtol=2e-4, atol=2e-5)
