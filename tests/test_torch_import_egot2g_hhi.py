"""Full-model forward-parity goldens for the HHI EgoT2-g prompt models.

Builds the reference ``TaskTranslationPromptTransformer`` (3-stream)
and ``TaskPromptTransformer`` (single-stream baseline) end-to-end in
raw torch.nn (HHI/models/multitask/task_prompt_model.py:39-293): frozen
LAM/TTM resnet18 token extractors + full TalkNet, per-stream 256→D
projections sharing one encode-LN + task embeddings + sinusoidal PE,
torch TransformerEncoder/Decoder prompt core (the reference
CustomDecoderLayer is output-identical to the standard layer — it only
forces need_weights), the ASD frame-regroup of encoder memory, and the
causal teacher-forced decode. Imports the real state_dict through
``egot2g_hhi_rules`` and asserts numerically matching logits on all
three task dispatches.

This was the last EgoT2-g composite without a numeric golden (round-3
verdict weak #5): it pins the stream concat order (lam, ttm, asd —
NOTE: different from the EgoT2-s flagship's ttm-first), the task-embed
index assignment, and the (B·T, 3, D) ASD memory regroup.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from egot2x.core.torch_import import (  # noqa: E402
    egot2g_hhi_rules,
    partial_match_load,
    tree_paths,
)
from test_torch_import import TorchResNet18, _randomize_bn_stats  # noqa: E402
from test_torch_import_egot2s_ttm import (  # noqa: E402
    TorchSinusoidalPE,
    TTalkNet,
)

V, D, HEADS, L = 7, 64, 4, 1
B, T, IMG = 2, 4, 64
TASK_IDS = {"lam": 3, "ttm": 2, "asd": 4}


class TorchHHIPromptBase(tnn.Module):
    """Shared parameter surface of both HHI prompt models."""

    def __init__(self):
        super().__init__()
        self.transformer_encoder = tnn.TransformerEncoder(
            tnn.TransformerEncoderLayer(D, HEADS, dropout=0.1), L)
        self.transformer_decoder = tnn.TransformerDecoder(
            tnn.TransformerDecoderLayer(D, HEADS, dropout=0.1), L)
        self.ln = tnn.LayerNorm(D)
        self.task_embed = tnn.Parameter(torch.randn(1, 3, D))
        self.pos_embed = TorchSinusoidalPE(D)
        self.embedding = tnn.Embedding(V, D)
        self.proj_lam = tnn.Linear(256, D)
        self.proj_ttm = tnn.Linear(256, D)
        self.proj_asd = tnn.Linear(256, D)
        self.fc = tnn.Linear(D, V)
        self.lam_model = tnn.Module()
        self.lam_model.base_model = TorchResNet18(256)
        self.lam_model.lstm = tnn.LSTM(256, 256, bidirectional=True,
                                       num_layers=2, batch_first=True)
        self.ttm_model = tnn.Module()
        self.ttm_model.video_encoder = TorchResNet18(256)
        self.ttm_model.lstm = tnn.LSTM(256, 256, bidirectional=True,
                                       num_layers=2, batch_first=True)
        self.ttm_model.audio_encoder = tnn.Linear(64, 512)  # pruned keys
        self.asd_model = TTalkNet()

    def encode_prepare(self, x, task_id):
        x = self.ln(x) + self.task_embed[:, task_id, :]
        return self.pos_embed(x.permute(1, 0, 2))

    def _lam_tokens(self, video):
        n, t = video.shape[:2]
        return self.lam_model.base_model(
            video.reshape(n * t, 3, IMG, IMG)).view(n, t, 256)

    def _ttm_tokens(self, video):
        n, t = video.shape[:2]
        return self.ttm_model.video_encoder(
            video.reshape(n * t, 3, IMG, IMG)).view(n, t, 256)

    def decode(self, y, encoded_x):
        sy = y.size(1)
        y = self.embedding(y.permute(1, 0)) * math.sqrt(D)
        y = self.pos_embed(y)
        mask = torch.triu(torch.full((sy, sy), float("-inf")), diagonal=1)
        return self.fc(self.transformer_decoder(y, encoded_x, mask))

    def forward(self, video, video_asd, audio_asd, target, task):
        encoded_x = self.encode(video, video_asd, audio_asd, task)
        return self.decode(target, encoded_x)  # (S, B', V)


class TorchTranslationPrompt(TorchHHIPromptBase):
    """3-stream encode (task_prompt_model.py:230-260)."""

    def encode(self, video, video_asd, audio_asd, task):
        if task == "lam":
            x = self.encode_prepare(self.proj_lam(self._lam_tokens(video)), 0)
        else:
            asd_feat = self.asd_model.forward_av(audio_asd, video_asd)
            x1 = self.encode_prepare(
                self.proj_lam(self._lam_tokens(video)), 0)
            x2 = self.encode_prepare(
                self.proj_ttm(self._ttm_tokens(video)), 1)
            x3 = self.encode_prepare(self.proj_asd(asd_feat), 2)
            x = torch.cat((x1, x2, x3), dim=0)
        encoded_x = self.transformer_encoder(x)
        if task == "asd":
            e = encoded_x.permute(1, 0, 2)
            t = e.shape[1] // 3
            parts = [e[:, i * t:(i + 1) * t, :].reshape(-1, D)
                     for i in range(3)]
            encoded_x = torch.stack(parts, dim=0)  # (3, B*T, D)
        return encoded_x


class TorchSinglePrompt(TorchHHIPromptBase):
    """Single-stream baseline encode (task_prompt_model.py:115-131)."""

    def encode(self, video, video_asd, audio_asd, task):
        if task == "lam":
            x = self.encode_prepare(self.proj_lam(self._lam_tokens(video)), 0)
        elif task == "ttm":
            x = self.encode_prepare(self.proj_ttm(self._ttm_tokens(video)), 1)
        else:
            asd_feat = self.asd_model.forward_av(audio_asd, video_asd)
            x = self.encode_prepare(self.proj_asd(asd_feat), 2)
        encoded_x = self.transformer_encoder(x)
        if task == "asd":
            encoded_x = encoded_x.permute(1, 0, 2).reshape(1, -1, D)
        return encoded_x


def _randomize_all_bn(tmodel, rng):
    _randomize_bn_stats(tmodel, rng)
    for m in tmodel.modules():  # 1d/3d BNs (TalkNet)
        if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm3d)):
            with torch.no_grad():
                m.running_mean.copy_(torch.from_numpy(
                    rng.standard_normal(m.running_mean.shape)
                    .astype(np.float32) * 0.05))
                m.running_var.copy_(torch.from_numpy(
                    rng.uniform(0.8, 1.2, m.running_var.shape)
                    .astype(np.float32)))


@pytest.mark.parametrize("torch_cls,flax_name", [
    (TorchTranslationPrompt, "TaskTranslationPromptTransformer"),
    (TorchSinglePrompt, "TaskPromptTransformer"),
])
def test_egot2g_hhi_full_model_forward_parity(rng, torch_cls, flax_name):
    from egot2x.core.registry import build_model
    import egot2x.translate.egot2g  # noqa: F401

    tmodel = torch_cls()
    _randomize_all_bn(tmodel, rng)
    tmodel.eval()
    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    model = build_model(flax_name, vocab_size=V, hidden_dim=D,
                        num_heads=HEADS, num_layers=L, dropout=0.1)
    video = rng.standard_normal((B, T, IMG, IMG, 3)).astype(np.float32)
    video_asd = rng.uniform(0, 255, (B, T, 112, 112)).astype(np.float32)
    audio = np.zeros((B, T * 16000 // 30), np.float32)  # dead: middle=True
    audio_asd = rng.standard_normal((B, 4 * T, 13)).astype(np.float32)
    target = rng.integers(0, V, (B, 2))
    target_asd = rng.integers(0, V, (B * T, 2))

    # flax materializes setup() submodules lazily — the single-stream
    # baseline builds only the dispatched branch per call, so init all
    # three tasks and merge the trees
    import flax.core

    def _merge(a, b):
        out = dict(a)
        for k, v in b.items():
            out[k] = _merge(out[k], v) if isinstance(out.get(k), dict) else v
        return out

    init_vars = {}
    for task in ("lam", "ttm", "asd"):
        tgt = target_asd if task == "asd" else target
        v = model.init(jax.random.key(0), jnp.asarray(video),
                       jnp.asarray(video_asd), jnp.asarray(audio),
                       jnp.asarray(audio_asd), jnp.asarray(tgt),
                       task, train=False)
        init_vars = _merge(init_vars, flax.core.unfreeze(dict(v)))
    translated = partial_match_load(state, egot2g_hhi_rules(L),
                                    tree_paths(init_vars))
    dead = ("lam_model.lstm.", "ttm_model.lstm.", "ttm_model.audio_encoder.",
            "pos_embed.pe")
    leftovers = [k for k in translated["unused"]
                 if "num_batches_tracked" not in k
                 and not k.startswith(dead)]
    assert leftovers == [], leftovers
    for coll in ("params", "batch_stats"):
        a = sorted(jax.tree_util.keystr(p) for p, _ in
                   jax.tree_util.tree_leaves_with_path(init_vars[coll]))
        b = sorted(jax.tree_util.keystr(p) for p, _ in
                   jax.tree_util.tree_leaves_with_path(translated[coll]))
        assert a == b, set(a) ^ set(b)

    variables = {"params": translated["params"],
                 "batch_stats": translated["batch_stats"]}
    for task in ("lam", "ttm", "asd"):
        tgt = target_asd if task == "asd" else target
        ours = np.asarray(model.apply(
            variables, jnp.asarray(video), jnp.asarray(video_asd),
            jnp.asarray(audio), jnp.asarray(audio_asd), jnp.asarray(tgt),
            task, train=False))
        with torch.no_grad():
            theirs = tmodel(torch.from_numpy(video).permute(0, 1, 4, 2, 3),
                            torch.from_numpy(video_asd),
                            torch.from_numpy(audio_asd),
                            torch.from_numpy(tgt), task)
        theirs = theirs.permute(1, 0, 2).numpy()  # (S, B', V) -> (B', S, V)
        assert ours.shape == theirs.shape == (tgt.shape[0], 2, V), task
        np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-3,
                                   err_msg=f"{flax_name}/{task}")
