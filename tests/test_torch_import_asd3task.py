"""Full-model forward-parity golden for the ASD-target EgoT2-s 3-task
translator's frame-level token-slice output path.

Builds the reference ASD-variant ``TaskFusionMFTransformer3Task``
(HHI/models/asd/model_taskspecific.py:110-160) end-to-end in raw
torch.nn: the same frozen LAM/TTM/TalkNet surface as the TTM flagship,
but the ASD stream concatenated FIRST while keeping its task embedding
at index 2 (ttm=0, lam=1, asd=2), and the output being the first T_asd
encoder tokens reshaped to (B·T, dim) for the external lossAV head
(the serialized ``linear_head`` is dead in this forward). Imports the
real state_dict through ``egot2s_asd3task_rules`` and asserts
numerically identical per-frame features.

Last of the round-3 verdict weak-#5 composites; building it caught a
real bug — the fusion core assigned task-embed indices by concat
position, giving the ASD stream embedding 0 instead of 2.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from egot2x.core.torch_import import (  # noqa: E402
    egot2s_asd3task_rules,
    partial_match_load,
    tree_paths,
)
from test_torch_import import TorchResNet18, _randomize_bn_stats  # noqa: E402
from test_torch_import_egot2s_ttm import (  # noqa: E402
    TorchSinusoidalPE,
    TTalkNet,
)

D, HEADS, LAYERS = 64, 4, 1
B, T, IMG = 2, 4, 64


class TorchASD3Task(tnn.Module):
    """asd/model_taskspecific.py:110-160 verbatim structure."""

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
        self.linear_head = tnn.Sequential(tnn.LayerNorm(D),
                                          tnn.Linear(D, 2))  # dead here

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
        out = self.transformer_encoder(torch.cat((x3, x1, x2), dim=0))
        out = out.permute(1, 0, 2)
        return out[:, : asd_out.shape[1], :].reshape(
            n * asd_out.shape[1], -1)


def test_asd3task_frame_level_forward_parity(rng):
    from egot2x.core.registry import build_model
    import egot2x.translate.egot2s_hhi  # noqa: F401

    tmodel = TorchASD3Task()
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

    model = build_model("TaskFusionMFTransformer3TaskASD", hidden_dim=D,
                        num_heads=HEADS, num_layers=LAYERS, dropout=0.1)
    video = rng.standard_normal((B, T, IMG, IMG, 3)).astype(np.float32)
    video_asd = rng.uniform(0, 255, (B, T, 112, 112)).astype(np.float32)
    audio = np.zeros((B, T * 16000 // 30), np.float32)  # dead: middle=True
    audio_asd = rng.standard_normal((B, 4 * T, 13)).astype(np.float32)

    init_vars = model.init(jax.random.key(0), jnp.asarray(video),
                           jnp.asarray(video_asd), jnp.asarray(audio),
                           jnp.asarray(audio_asd), train=False)
    translated = partial_match_load(state, egot2s_asd3task_rules(LAYERS),
                                    tree_paths(init_vars))
    dead = ("lam_model.lstm.", "ttm_model.lstm.", "ttm_model.audio_encoder.",
            "pos_embed.pe", "linear_head.")
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
    assert ours.shape == theirs.shape == (B * T, D)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-3)
