"""Full-model forward-parity golden for the FLAGSHIP EgoT2-s TTM 3-task
translator — the benched model.

Builds the reference ``TaskFusionMFTransformer3Task``
(HHI/models/ttm/model_taskspecific.py:198-245) end-to-end in raw
torch.nn: the frozen LAM and TTM resnet18 per-frame token extractors,
the FULL TalkNet (per-sample 3D visual frontend + TCN + conv1D, the
SE-ResNet34 audio encoder with the reference's conv→relu→bn block
order, cross A↔V and self-AV attention), the three 256→D stream
projections sharing one encode-LN + task embeddings + sinusoidal PE,
the torch TransformerEncoder over the concatenated token streams, and
the ``linear_head`` LayerNorm+Linear. Imports its real state_dict
through ``egot2s_ttm_rules`` (the published ``egot2s_*`` checkpoint
family) and asserts numerically matching logits.

This subsumes the per-module goldens for the wiring bugs they cannot
see: stream concat order (ttm, lam, asd), shared-vs-head LN mapping,
task-embedding index assignment, and the TalkNet A/V cross-attention
src/tar orientation. The backbone submodules the flax tree never
constructs under ``middle=True`` (LAM/TTM BiLSTMs, TTM audio encoder)
are present in the torch checkpoint and exercised as pruned keys.

The torch 3D visual stem here follows the repo's documented semantics
(per-sample temporal window — PARITY.md: the reference's flattened
(B·T) view leaks frames across batch elements at segment boundaries).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from egot2x.core.torch_import import (  # noqa: E402
    egot2s_ttm_rules,
    partial_match_load,
    tree_paths,
)
from test_torch_import import TorchResNet18, _randomize_bn_stats  # noqa: E402
from test_torch_import_talknet import TVisual  # noqa: E402

D, HEADS, LAYERS = 64, 4, 1
B, T, IMG = 2, 4, 64


class TAttention(tnn.Module):
    """Reference attentionLayer (HHI/models/asd/attentionLayer.py:12-42)."""

    def __init__(self, d, h):
        super().__init__()
        self.self_attn = tnn.MultiheadAttention(d, h, dropout=0.1)
        self.linear1 = tnn.Linear(d, d * 4)
        self.linear2 = tnn.Linear(d * 4, d)
        self.norm1 = tnn.LayerNorm(d)
        self.norm2 = tnn.LayerNorm(d)

    def forward(self, src, tar):
        src, tar = src.transpose(0, 1), tar.transpose(0, 1)
        src = self.norm1(src + self.self_attn(tar, src, src)[0])
        src = self.norm2(src + self.linear2(F.relu(self.linear1(src))))
        return src.transpose(0, 1)


class TSEAudioBlock(tnn.Module):
    """Reference SEBasicBlock (audioEncoder.py:11-41) — NOTE the quirky
    conv1 → relu → bn1 order."""

    def __init__(self, inp, out, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(inp, out, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(out)
        self.conv2 = tnn.Conv2d(out, out, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(out)
        self.se = tnn.Module()
        self.se.fc = tnn.Sequential(
            tnn.Linear(out, out // 8), tnn.ReLU(),
            tnn.Linear(out // 8, out), tnn.Sigmoid())
        self.downsample = None
        if stride != 1 or inp != out:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inp, out, 1, stride, bias=False),
                tnn.BatchNorm2d(out))

    def forward(self, x):
        res = x if self.downsample is None else self.downsample(x)
        y = self.bn1(F.relu(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        s = self.se.fc(y.mean((2, 3))).view(y.size(0), y.size(1), 1, 1)
        return F.relu(y * s + res)


class TAudioEncoder(tnn.Module):
    """Reference audioEncoder (audioEncoder.py:60-114): SE-ResNet
    [3,4,6,3] × filters [16,32,64,128] over (B, 1, 13 mfcc, 4T)."""

    def __init__(self):
        super().__init__()
        f = [16, 32, 64, 128]
        self.conv1 = tnn.Conv2d(1, f[0], 7, (2, 1), 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(f[0])
        blocks = [3, 4, 6, 3]
        strides = [1, (2, 2), (2, 2), (1, 1)]
        inp = f[0]
        for i in range(4):
            layer = [TSEAudioBlock(inp, f[i], strides[i])]
            layer += [TSEAudioBlock(f[i], f[i]) for _ in range(blocks[i] - 1)]
            setattr(self, f"layer{i + 1}", tnn.Sequential(*layer))
            inp = f[i]

    def forward(self, x):  # (B, 1, 13, 4T)
        x = F.relu(self.bn1(self.conv1(x)))
        for i in range(1, 5):
            x = getattr(self, f"layer{i}")(x)
        x = x.mean(dim=2)          # (B, 128, T')
        return x.transpose(1, 2)   # (B, T', 128)


class TTalkNet(TVisual):
    """Full reference talkNetModel (talkNetModel.py:16-73), extending the
    per-sample visual replica with the audio encoder and A/V attention."""

    def __init__(self):
        super().__init__()
        self.audioEncoder = TAudioEncoder()
        self.crossA2V = TAttention(128, 8)
        self.crossV2A = TAttention(128, 8)
        self.selfAV = TAttention(256, 8)

    def forward_av(self, mfcc, faces):
        a = self.audioEncoder(mfcc.unsqueeze(1).transpose(2, 3))
        v = super().forward(faces)  # TVisual: (B, T, 128)
        t = min(a.size(1), v.size(1))
        a, v = a[:, :t], v[:, :t]
        x1 = self.crossA2V(src=a, tar=v)
        x2 = self.crossV2A(src=v, tar=a)
        av = self.selfAV(src=torch.cat((x1, x2), 2),
                         tar=torch.cat((x1, x2), 2))
        return av  # (B, T, 256)


class TorchSinusoidalPE(tnn.Module):
    """Reference PositionalEncoding (model_taskspecific.py:131-152)."""

    def __init__(self, d_model, max_len=1000):
        super().__init__()
        pe = torch.zeros(max_len, d_model)
        pos = torch.arange(0, max_len, dtype=torch.float).unsqueeze(1)
        div = torch.exp(torch.arange(0, d_model, 2).float()
                        * (-math.log(10000.0) / d_model))
        pe[:, 0::2] = torch.sin(pos * div)
        pe[:, 1::2] = torch.cos(pos * div)
        self.register_buffer("pe", pe.unsqueeze(0).transpose(0, 1))

    def forward(self, x):  # (S, B, D)
        return x + self.pe[: x.size(0), :]


class TorchFlagship3Task(tnn.Module):
    """Reference TaskFusionMFTransformer3Task
    (model_taskspecific.py:198-245) with the full frozen-backbone
    checkpoint surface: the LAM/TTM BiLSTMs and a TTM audio-encoder
    stand-in exist only as state_dict keys (dead under middle=True)."""

    def __init__(self):
        super().__init__()
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
        self.proj_lam = tnn.Linear(256, D)
        self.proj_ttm = tnn.Linear(256, D)
        self.proj_asd = tnn.Linear(256, D)
        self.task_embed = tnn.Parameter(torch.randn(1, 3, D))
        self.pos_embed = TorchSinusoidalPE(D)
        self.transformer_encoder = tnn.TransformerEncoder(
            tnn.TransformerEncoderLayer(D, HEADS, dropout=0.1), LAYERS)
        self.ln = tnn.LayerNorm(D)
        self.linear_head = tnn.Sequential(tnn.LayerNorm(D), tnn.Linear(D, 2))

    def encode_prepare(self, x, task_id):
        x = self.ln(x) + self.task_embed[:, task_id, :]
        return self.pos_embed(x.permute(1, 0, 2))

    def forward(self, video, video_asd, audio_asd):
        n, t = video.shape[:2]
        frames = video.reshape(n * t, 3, IMG, IMG)
        lam_out = self.lam_model.base_model(frames).view(n, t, 256)
        ttm_out = self.ttm_model.video_encoder(frames).view(n, t, 256)
        asd_out = self.asd_model.forward_av(audio_asd, video_asd)
        x1 = self.encode_prepare(self.proj_ttm(ttm_out), 0)
        x2 = self.encode_prepare(self.proj_lam(lam_out), 1)
        x3 = self.encode_prepare(self.proj_asd(asd_out), 2)
        out = self.transformer_encoder(torch.cat((x1, x2, x3), dim=0))
        return self.linear_head(out.mean(dim=0))


class TorchFlagship2Task(tnn.Module):
    """Reference TaskFusionMFTransformer2Task
    (model_taskspecific.py:155-194): LAM + TTM streams only."""

    def __init__(self):
        super().__init__()
        self.lam_model = tnn.Module()
        self.lam_model.base_model = TorchResNet18(256)
        self.lam_model.lstm = tnn.LSTM(256, 256, bidirectional=True,
                                       num_layers=2, batch_first=True)
        self.ttm_model = tnn.Module()
        self.ttm_model.video_encoder = TorchResNet18(256)
        self.ttm_model.lstm = tnn.LSTM(256, 256, bidirectional=True,
                                       num_layers=2, batch_first=True)
        self.ttm_model.audio_encoder = tnn.Linear(64, 512)  # pruned keys
        self.proj_lam = tnn.Linear(256, D)
        self.proj_ttm = tnn.Linear(256, D)
        self.task_embed = tnn.Parameter(torch.randn(1, 2, D))
        self.pos_embed = TorchSinusoidalPE(D)
        self.transformer_encoder = tnn.TransformerEncoder(
            tnn.TransformerEncoderLayer(D, HEADS, dropout=0.1), LAYERS)
        self.ln = tnn.LayerNorm(D)
        self.linear_head = tnn.Sequential(tnn.LayerNorm(D), tnn.Linear(D, 2))

    def encode_prepare(self, x, task_id):
        x = self.ln(x) + self.task_embed[:, task_id, :]
        return self.pos_embed(x.permute(1, 0, 2))

    def forward(self, video):
        n, t = video.shape[:2]
        frames = video.reshape(n * t, 3, IMG, IMG)
        lam_out = self.lam_model.base_model(frames).view(n, t, 256)
        ttm_out = self.ttm_model.video_encoder(frames).view(n, t, 256)
        x1 = self.encode_prepare(self.proj_ttm(ttm_out), 0)
        x2 = self.encode_prepare(self.proj_lam(lam_out), 1)
        out = self.transformer_encoder(torch.cat((x1, x2), dim=0))
        return self.linear_head(out.mean(dim=0))


def test_egot2s_ttm_2task_forward_parity(rng):
    from egot2x.core.torch_import import egot2s_ttm_2task_rules
    from egot2x.core.registry import build_model
    import egot2x.translate.egot2s_hhi  # noqa: F401

    tmodel = TorchFlagship2Task()
    _randomize_bn_stats(tmodel, rng)
    tmodel.eval()
    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    model = build_model("TaskFusionMFTransformer2Task", hidden_dim=D,
                        num_heads=HEADS, num_layers=LAYERS, dropout=0.1)
    video = rng.standard_normal((B, T, IMG, IMG, 3)).astype(np.float32)
    audio = np.zeros((B, T * 16000 // 30), np.float32)  # dead: middle=True

    init_vars = model.init(jax.random.key(0), jnp.asarray(video),
                           jnp.asarray(audio), train=False)
    translated = partial_match_load(state, egot2s_ttm_2task_rules(LAYERS),
                                    tree_paths(init_vars))
    dead = ("lam_model.lstm.", "ttm_model.lstm.", "ttm_model.audio_encoder.",
            "pos_embed.pe")
    leftovers = [k for k in translated["unused"]
                 if "num_batches_tracked" not in k
                 and not k.startswith(dead)]
    assert leftovers == [], leftovers

    ours = np.asarray(model.apply(
        {"params": translated["params"],
         "batch_stats": translated["batch_stats"]},
        jnp.asarray(video), jnp.asarray(audio), train=False))
    with torch.no_grad():
        theirs = tmodel(
            torch.from_numpy(video).permute(0, 1, 4, 2, 3)).numpy()
    assert ours.shape == theirs.shape == (B, 2)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-3)


def test_egot2s_ttm_3task_full_flagship_forward_parity(rng):
    from egot2x.core.registry import build_model
    import egot2x.translate.egot2s_hhi  # noqa: F401

    tmodel = TorchFlagship3Task()
    _randomize_bn_stats(tmodel, rng)
    for m in tmodel.modules():  # 1d/3d BNs (TalkNet) too
        if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm3d)):
            with torch.no_grad():
                m.running_mean.copy_(torch.from_numpy(
                    rng.standard_normal(m.running_mean.shape)
                    .astype(np.float32) * 0.05))
                m.running_var.copy_(torch.from_numpy(
                    rng.uniform(0.8, 1.2, m.running_var.shape)
                    .astype(np.float32)))
    tmodel.eval()
    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    model = build_model("TaskFusionMFTransformer3Task", hidden_dim=D,
                        num_heads=HEADS, num_layers=LAYERS, dropout=0.1)
    # normalized float feed (the training-path contract; the uint8
    # norm-folded stem has its own oracle in tests/test_u8_input.py)
    video = rng.standard_normal((B, T, IMG, IMG, 3)).astype(np.float32)
    video_asd = rng.uniform(0, 255, (B, T, 112, 112)).astype(np.float32)
    audio = np.zeros((B, T * 16000 // 30), np.float32)  # dead: middle=True
    audio_asd = rng.standard_normal((B, 4 * T, 13)).astype(np.float32)

    init_vars = model.init(jax.random.key(0), jnp.asarray(video),
                           jnp.asarray(video_asd), jnp.asarray(audio),
                           jnp.asarray(audio_asd), train=False)
    translated = partial_match_load(state, egot2s_ttm_rules(3, LAYERS),
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

    ours = np.asarray(model.apply(
        {"params": translated["params"],
         "batch_stats": translated["batch_stats"]},
        jnp.asarray(video), jnp.asarray(video_asd), jnp.asarray(audio),
        jnp.asarray(audio_asd), train=False))
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(video).permute(0, 1, 4, 2, 3),
                        torch.from_numpy(video_asd),
                        torch.from_numpy(audio_asd)).numpy()
    assert ours.shape == theirs.shape == (B, 2)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-3)
