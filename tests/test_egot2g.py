"""EgoT2-g vocab + prompt model tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egot2x.core.registry import build_model
from egot2x.translate.vocab import (
    Vocab,
    build_hhi_vocab,
    build_hoi_vocab,
    map_label_to_action,
    vocab_idx_to_orig,
)

import egot2x.translate.egot2g  # noqa: F401


def test_hhi_vocab_layout():
    v = build_hhi_vocab()
    # specials first (torchtext special_first=True)
    assert v.itos[:2] == ["</s>", "<unk>"]
    assert v.itos[-2:] == ["0", "1"]  # label ids last (predict slices -2:)
    assert v["ttm"] == 2 and v["lam"] == 3 and v["asd"] == 4
    assert v["nope"] == v["<unk>"]


def test_hoi_vocab(tmp_path):
    import json

    tax = tmp_path / "tax.json"
    tax.write_text(json.dumps({
        "verbs": ["take_(get)", "put_(place)"],
        "nouns": ["bag_(bag)", "ball"],
    }))
    v = build_hoi_vocab(str(tax))
    assert v["pnr"] == 0 and v["oscc"] == 1
    assert v["take"] > v["15"]
    verbs, nouns = vocab_idx_to_orig(v, str(tax))
    assert len(verbs) == 2 and len(nouns) == 2
    assert v.lookup_token(verbs[0]) == "take"


def test_vocab_dedup_keeps_first():
    v = Vocab(["a", "b", "a", "c"])
    assert len(v) == 3
    assert v["a"] == 0


T, S = 8, 32


def _hhi_inputs(rng, b=2):
    wav = T * 16000 // 30
    return (
        jnp.asarray(rng.standard_normal((b, T, S, S, 3)), dtype=jnp.float32),
        jnp.asarray(rng.uniform(0, 255, (b, T, 112, 112)), dtype=jnp.float32),
        jnp.asarray(rng.standard_normal((b, wav)), dtype=jnp.float32),
        jnp.asarray(rng.standard_normal((b, 4 * T, 13)), dtype=jnp.float32),
    )


@pytest.fixture(scope="module")
def hhi_model():
    v = build_hhi_vocab()
    model = build_model("TaskTranslationPromptTransformer",
                        vocab_size=len(v), hidden_dim=64, num_layers=1)
    rng = np.random.default_rng(0)
    inputs = _hhi_inputs(rng)
    tgt = jnp.zeros((2, 2), jnp.int32)
    variables = model.init(jax.random.key(0), *inputs, tgt, "ttm", train=False)
    return model, variables, inputs


def test_hhi_prompt_teacher_forcing(hhi_model):
    model, variables, inputs = hhi_model
    tgt = jnp.asarray([[2, 5], [2, 6]], jnp.int32)  # [ttm, label]
    out = model.apply(variables, *inputs, tgt, "ttm", train=False)
    assert out.shape == (2, 2, 7)  # (B, S, vocab)


def test_hhi_prompt_predict_binary(hhi_model):
    model, variables, inputs = hhi_model
    out = model.apply(variables, *inputs, "ttm", method="predict")
    assert out.shape == (2, 2)  # logits over ['0','1']
    # lam task uses only the video stream
    out_lam = model.apply(variables, *inputs, "lam", method="predict")
    assert out_lam.shape == (2, 2)


def test_hhi_prompt_asd_per_frame(hhi_model):
    model, variables, inputs = hhi_model
    out = model.apply(variables, *inputs, "asd", method="predict")
    assert out.shape == (2 * T, 2)  # one decode per frame


def test_hoi_prompt_6task(tmp_path, rng):
    import json

    tax = tmp_path / "tax.json"
    tax.write_text(json.dumps({
        "verbs": [f"v{i}" for i in range(5)],
        "nouns": [f"n{i}" for i in range(6)],
    }))
    v = build_hoi_vocab(str(tax))
    model = build_model("TaskTranslationPromptTransformer6Task",
                        vocab_size=len(v), hidden_dim=64, num_layers=1,
                        crop_size=S + 1, alpha=4)
    frames = jnp.asarray(rng.uniform(0, 255, (1, T, S + 1, S + 1, 3)),
                         dtype=jnp.float32)
    pathways = [jnp.asarray(rng.standard_normal((1, 2, S, S, 3)), dtype=jnp.float32),
                jnp.asarray(rng.standard_normal((1, 8, S, S, 3)), dtype=jnp.float32)]
    tgt = jnp.zeros((1, 2), jnp.int32)
    variables = model.init(jax.random.key(0), frames, pathways, tgt, "pnr",
                           train=False)
    out = model.apply(variables, frames, pathways, tgt, "pnr", train=False)
    assert out.shape == (1, 2, len(v))
    pred = model.apply(variables, frames, pathways, "pnr", method="predict")
    assert pred.shape == (1, len(v))
    preds = model.apply(variables, frames, pathways, "action", method="predict")
    assert set(preds) == {"verb", "noun"}


def test_hoi_prompt_2task(rng):
    """Dedicated task12 model: only pnr/oscc backbones are built
    (reference video_model_builder_2task.py:51-166)."""
    from egot2x.translate.vocab import build_hoi_vocab_task12

    v = build_hoi_vocab_task12()
    assert v["pnr"] == 0 and v["oscc"] == 1 and len(v) == 22
    model = build_model("TaskTranslationPromptTransformer2Task",
                        vocab_size=len(v), hidden_dim=64, num_layers=1,
                        crop_size=S + 1)
    frames = jnp.asarray(rng.uniform(0, 255, (1, T, S + 1, S + 1, 3)),
                         dtype=jnp.float32)
    tgt = jnp.zeros((1, 2), jnp.int32)
    variables = model.init(jax.random.key(0), frames, None, tgt, "pnr",
                           train=False)
    # no SlowFast/LTA backbones in the tree — the model builds only what
    # a reference 2task checkpoint carries
    top = set(variables["params"])
    assert {"pnr_model", "oscc_model", "proj_pnr", "proj_oscc",
            "core"} <= top
    assert not top & {"recognition_model", "action_model", "lta_backbone",
                      "lta_aggregator"}
    assert variables["params"]["core"]["task_embed"].shape == (1, 2, 64)
    out = model.apply(variables, frames, None, tgt, "oscc", train=False)
    assert out.shape == (1, 2, len(v))
    pred = model.apply(variables, frames, None, "pnr", method="predict")
    assert pred.shape == (1, len(v))


@pytest.mark.parametrize("temporal", [False, True])
def test_hoi_prompt_action_task(rng, temporal):
    """Dedicated unify4taskaction model: AR/LTA backbones only
    (reference video_model_builder_action.py:21-215)."""
    dim = 32 if not temporal else 64  # base variant: unprojected LTA tokens
    model = build_model("TaskTranslationPromptTransformerActionTask",
                        vocab_size=30, hidden_dim=dim, num_layers=1,
                        alpha=4, feature_dim=32, temporal=temporal)
    pw = [jnp.asarray(rng.standard_normal((1, 2, S, S, 3)), jnp.float32),
          jnp.asarray(rng.standard_normal((1, 8, S, S, 3)), jnp.float32)]
    lta_pw = [p[:, None].repeat(2, axis=1) for p in pw]
    tgt = jnp.zeros((1, 2), jnp.int32)
    variables = model.init(jax.random.key(0), None, pw, tgt, "action",
                           train=False)
    lta_vars = model.init(jax.random.key(0), None, lta_pw, tgt, "lta",
                          train=False)
    from egot2x.train.state import merge_trees

    variables = jax.tree_util.tree_map(
        lambda a: a, merge_trees(lta_vars, dict(variables)))
    assert "pnr_model" not in variables["params"]
    out = model.apply(variables, None, pw, tgt, "action_verb", train=False)
    assert out.shape == (1, 2, 30)
    out = model.apply(variables, None, lta_pw, tgt, "lta_noun", train=False)
    assert out.shape == (1, 2, 30)
    preds = model.apply(variables, None, lta_pw, "lta", method="predict")
    assert set(preds) == {"verb", "noun"}
    assert preds["verb"].shape == (1, 30)
