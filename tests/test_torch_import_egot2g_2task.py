"""Full-model forward-parity golden for the EgoT2-g task12 prompt model.

Builds the reference ``TaskTranslationPromptTransformer2Task``
(HOI/models/multitask/video_model_builder_2task.py:51-166) end-to-end
in raw torch.nn — both frozen ResNet3D backbones, the 8192→D stream
projections, LN + task embeddings + sinusoidal PE encoding, the torch
TransformerEncoder over the concatenated 2·T token streams, and the
causal CustomDecoderLayer decoder with √dim-scaled vocab embeddings —
imports its real state_dict through ``egot2g_2task_rules``, and
asserts numerically identical teacher-forced logits. First full torch
golden for the EgoT2-g prompt family (the HHI/HOI prompt models share
this exact core wiring through ``_PromptCore``).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from egot2x.core.torch_import import (  # noqa: E402
    egot2g_2task_rules,
    partial_match_load,
    tree_paths,
)
from test_torch_import_ts_pnr import (  # noqa: E402
    S_PNR,
    T_PNR,
    TorchPNRBackbone,
    _randomize_bn,
)

V, D, L, HEADS = 22, 64, 1, 4


class TorchSinusoidalPE(tnn.Module):
    """Reference PositionalEncoding (video_model_builder_2task.py:27-48):
    seq-first (max_len, 1, d) buffer named ``pe``."""

    def __init__(self, d_model, max_len=200):
        super().__init__()
        pe = torch.zeros(max_len, d_model)
        position = torch.arange(0, max_len, dtype=torch.float).unsqueeze(1)
        div = torch.exp(torch.arange(0, d_model, 2).float()
                        * (-math.log(10000.0) / d_model))
        pe[:, 0::2] = torch.sin(position * div)
        pe[:, 1::2] = torch.cos(position * div)
        self.register_buffer("pe", pe.unsqueeze(0).transpose(0, 1))

    def forward(self, x):  # (S, B, D)
        return x + self.pe[: x.size(0)]


class TorchPrompt2Task(tnn.Module):
    def __init__(self):
        super().__init__()
        self.transformer_encoder = tnn.TransformerEncoder(
            tnn.TransformerEncoderLayer(D, HEADS, dropout=0.1), L)
        self.transformer_decoder = tnn.TransformerDecoder(
            tnn.TransformerDecoderLayer(D, HEADS, dropout=0.1), L)
        self.proj_pnr = tnn.Linear(8192, D)
        self.proj_oscc = tnn.Linear(8192, D)
        self.fc = tnn.Linear(D, V)
        self.ln = tnn.LayerNorm(D)
        self.task_embed = tnn.Parameter(torch.randn(1, 2, D))
        self.pos_embed = TorchSinusoidalPE(D)
        self.embedding = tnn.Embedding(V, D)
        self.pnr_model = TorchPNRBackbone("Keyframe_localisation_head", 1)
        self.oscc_model = TorchPNRBackbone("State_detection_head", 2)

    def encode_prepare(self, x, task_id):
        x = self.ln(x) + self.task_embed[:, task_id, :]
        return self.pos_embed(x.permute(1, 0, 2))

    def forward(self, video, target):
        f1 = self.proj_pnr(self.pnr_model.forward_middle(video))
        f2 = self.proj_oscc(self.oscc_model.forward_middle(video))
        x = torch.cat((self.encode_prepare(f1, 0),
                       self.encode_prepare(f2, 1)), dim=0)
        encoded = self.transformer_encoder(x)
        sy = target.size(1)
        y = self.embedding(target.permute(1, 0)) * math.sqrt(D)
        y = self.pos_embed(y)
        mask = torch.triu(torch.full((sy, sy), float("-inf")), diagonal=1)
        out = self.transformer_decoder(y, encoded, mask)
        return self.fc(out)  # (S_y, B, V)


def test_egot2g_2task_full_model_forward_parity(rng):
    from egot2x.core.registry import build_model
    import egot2x.translate.egot2g  # noqa: F401

    tmodel = TorchPrompt2Task()
    _randomize_bn(tmodel, rng)
    tmodel.eval()
    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    model = build_model("TaskTranslationPromptTransformer2Task",
                        vocab_size=V, hidden_dim=D, num_heads=HEADS,
                        num_layers=L, crop_size=S_PNR)
    frames = rng.uniform(-1, 1, (2, T_PNR, S_PNR, S_PNR, 3)).astype(np.float32)
    target = rng.integers(0, V, (2, 3))
    init_vars = model.init(jax.random.key(0), jnp.asarray(frames), None,
                           jnp.asarray(target), "pnr", train=False)
    # Stage-I head projections are dead under middle=True and absent
    # from the flax tree — prune them like the reference's
    # partial-match loads
    translated = partial_match_load(state, egot2g_2task_rules(num_layers=L),
                                    tree_paths(init_vars))
    leftovers = [k for k in translated["unused"]
                 if "num_batches_tracked" not in k and k != "pos_embed.pe"]
    assert leftovers == [], leftovers
    for coll in ("params", "batch_stats"):
        a = sorted(jax.tree_util.keystr(p) for p, _ in
                   jax.tree_util.tree_leaves_with_path(init_vars[coll]))
        b = sorted(jax.tree_util.keystr(p) for p, _ in
                   jax.tree_util.tree_leaves_with_path(translated[coll]))
        assert a == b, set(a) ^ set(b)

    ours = np.asarray(model.apply(
        {"params": translated["params"],
         "batch_stats": translated["batch_stats"]},
        jnp.asarray(frames), None, jnp.asarray(target), "pnr", train=False))
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(frames).permute(0, 4, 1, 2, 3),
                        torch.from_numpy(target))
    theirs = theirs.permute(1, 0, 2).numpy()  # (S, B, V) -> (B, S, V)
    assert ours.shape == theirs.shape == (2, 3, V)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-3)
