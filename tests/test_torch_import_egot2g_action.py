"""Full-model forward-parity golden for the EgoT2-g unify4taskaction
prompt model.

Builds the reference ``TaskTranslationPromptTransformerTemporalActionTask``
(HOI/models/multitask/video_model_builder_action.py:193-215, base class
:21-190) end-to-end in raw torch.nn — the frozen AR SlowFast with its
live feature head, the frozen LTA ForecastingEncoderDecoder (SlowFast
clip backbone + transformer clip aggregator with final encoder norm +
a dead decoder), the temporal slow/fast/lta projections with the
(2,1,1) adaptive pools, per-stream LN + task-embed + sinusoidal PE
encoding with the extra post-concat LayerNorm on the LTA branch, and
the causal decoder — imports its real state_dict through
``egot2g_action_rules``, and asserts numerically identical
teacher-forced logits on BOTH branches (action_verb and lta_verb).

Covers the last EgoT2-g prompt model without a numeric golden: it
would catch s5 pooling-geometry, stream-order, and the
double-LayerNorm wiring on the LTA branch that shape tests cannot.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from egot2x.core.torch_import import (  # noqa: E402
    egot2g_action_rules,
    partial_match_load,
    tree_paths,
)
from test_torch_import_egot2g_2task import TorchSinusoidalPE  # noqa: E402
from test_torch_import_ts_pnr import (  # noqa: E402
    ALPHA,
    S_ACT,
    T_FAST,
    TorchSlowFast,
    _randomize_bn,
)

V, D, L, HEADS = 22, 64, 1, 4
FEAT = 128      # MULTI_INPUT_FEATURES analogue (reference: 2048)
AGG_L = 6       # reference TRANSFORMER_ENCODER_LAYERS default
N_CLIPS = 2


class TorchSlowFastWithHead(TorchSlowFast):
    """SlowFast(with_head=True): ResNetBasicHead pools each pathway to
    1x1x1 (the reference pool sizes cover the full s5 extent,
    video_model_builder.py:357-377), concats slow+fast, projects; with
    HEAD_ACT None eval returns the flat (B, D) projection
    (head_helper.py:192-216)."""

    def __init__(self, out_dim):
        super().__init__()
        self.head = tnn.Module()
        self.head.projection = tnn.Linear(2048 + 256, out_dim)

    def forward(self, pathways, middle=False):
        slow, fast = super().forward(pathways)
        if middle:
            return [slow, fast]
        x = torch.cat([slow.mean((2, 3, 4)), fast.mean((2, 3, 4))], dim=1)
        return self.head.projection(x)


class TorchAggregator(tnn.Module):
    """lta_models.py:156-182 TransformerAggregator: stack clips,
    seq-first, sinusoidal PE, TransformerEncoder with a FINAL norm."""

    def __init__(self, dim):
        super().__init__()
        self.encoder = tnn.TransformerEncoder(
            tnn.TransformerEncoderLayer(dim, 8), AGG_L,
            norm=tnn.LayerNorm(dim))
        self.pos_encoder = TorchSinusoidalPE(dim)

    def forward(self, x, middle):
        x = torch.stack(x, dim=1).transpose(0, 1)  # (N, B, D)
        x = self.encoder(self.pos_encoder(x))
        return x if middle else x[-1]


class TorchLTAModel(tnn.Module):
    """ForecastingEncoderDecoder (lta_models.py:214-295): per-clip
    SlowFast-with-head backbone, transformer aggregator; the decoder is
    built but dead under ``middle=True``."""

    def __init__(self, dim):
        super().__init__()
        self.backbone = TorchSlowFastWithHead(dim)
        self.clip_aggregator = TorchAggregator(dim)
        self.decoder = tnn.Linear(dim, 7)  # dead-param stand-in

    def forward(self, x, tgts=None, middle=False):
        n = x[0].shape[1]
        feats = [self.backbone([p[:, i] for p in x]) for i in range(n)]
        return self.clip_aggregator(feats, middle)


class TorchPromptAction(tnn.Module):
    """video_model_builder_action.py Temporal variant, verbatim
    structure (dropout modules elided: eval-mode no-ops)."""

    def __init__(self):
        super().__init__()
        self.transformer_encoder = tnn.TransformerEncoder(
            tnn.TransformerEncoderLayer(D, HEADS, dropout=0.1), L)
        self.transformer_decoder = tnn.TransformerDecoder(
            tnn.TransformerDecoderLayer(D, HEADS, dropout=0.1), L)
        self.fc = tnn.Linear(D, V)
        self.ln = tnn.LayerNorm(D)
        self.task_embed = tnn.Parameter(torch.randn(1, 2, D))
        self.pos_embed = TorchSinusoidalPE(D)
        self.pe = tnn.Parameter(torch.randn(1, 4, D))
        self.embedding = tnn.Embedding(V, D)
        self.action_model = TorchSlowFastWithHead(D)
        self.lta_model = TorchLTAModel(FEAT)
        self.proj_action_slow = tnn.Linear(2048, D)
        self.proj_action_fast = tnn.Linear(256, D)
        self.avg_pool_slow = tnn.AdaptiveAvgPool3d((2, 1, 1))
        self.avg_pool_fast = tnn.AdaptiveAvgPool3d((2, 1, 1))
        self.proj_lta = tnn.Linear(FEAT, D)

    def encode_prepare(self, x, task_id):
        x = self.ln(x) + self.task_embed[:, task_id, :]
        return self.pos_embed(x.permute(1, 0, 2))

    def encode(self, video, task):
        if "lta" in task:
            n = video[0].shape[1]
            feat_action = torch.stack(
                [self.action_model([p[:, i] for p in video])
                 for i in range(n)], dim=1)
            feat_lta = self.proj_lta(
                self.lta_model(video, None, middle=True).transpose(0, 1))
            x1 = self.encode_prepare(feat_action, 0)
            x2 = self.encode_prepare(feat_lta, 1)
            x = self.ln(torch.cat((x1, x2), dim=0))
        else:
            slow, fast = self.action_model(video, middle=True)
            f1 = self.proj_action_slow(self.avg_pool_slow(slow)
                                       .squeeze(-1).squeeze(-1)
                                       .permute(0, 2, 1))
            f2 = self.proj_action_fast(self.avg_pool_fast(fast)
                                       .squeeze(-1).squeeze(-1)
                                       .permute(0, 2, 1))
            x = self.encode_prepare(torch.cat((f1, f2), dim=1), 0)
        return self.transformer_encoder(x)

    def forward(self, video, target, task):
        encoded = self.encode(video, task)
        sy = target.size(1)
        y = self.embedding(target.permute(1, 0)) * math.sqrt(D)
        y = self.pos_embed(y)
        mask = torch.triu(torch.full((sy, sy), float("-inf")), diagonal=1)
        out = self.transformer_decoder(y, encoded, mask)
        return self.fc(out)  # (S_y, B, V)


def _merge(a, b):
    out = dict(a)
    for k, v in b.items():
        out[k] = _merge(out[k], v) if isinstance(out.get(k), dict) else v
    return out


def test_egot2g_action_full_model_forward_parity(rng):
    from egot2x.core.registry import build_model
    import egot2x.translate.egot2g  # noqa: F401
    import flax.core

    tmodel = TorchPromptAction()
    _randomize_bn(tmodel, rng)
    tmodel.eval()
    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    model = build_model("TaskTranslationPromptTransformerActionTask",
                        vocab_size=V, hidden_dim=D, num_heads=HEADS,
                        num_layers=L, alpha=ALPHA, beta_inv=8,
                        feature_dim=FEAT, temporal=True)
    t_slow = T_FAST // ALPHA
    slow = rng.uniform(-1, 1, (2, t_slow, S_ACT, S_ACT, 3)).astype(np.float32)
    fast = rng.uniform(-1, 1, (2, T_FAST, S_ACT, S_ACT, 3)).astype(np.float32)
    slow_n = rng.uniform(
        -1, 1, (2, N_CLIPS, t_slow, S_ACT, S_ACT, 3)).astype(np.float32)
    fast_n = rng.uniform(
        -1, 1, (2, N_CLIPS, T_FAST, S_ACT, S_ACT, 3)).astype(np.float32)
    target = rng.integers(0, V, (2, 3))

    # flax materializes setup() submodules lazily — init BOTH branches
    # and merge so the tree holds the full parameter surface
    v_act = model.init(jax.random.key(0), None,
                       [jnp.asarray(slow), jnp.asarray(fast)],
                       jnp.asarray(target), "action_verb", train=False)
    v_lta = model.init(jax.random.key(0), None,
                       [jnp.asarray(slow_n), jnp.asarray(fast_n)],
                       jnp.asarray(target), "lta_verb", train=False)
    init_vars = _merge(flax.core.unfreeze(dict(v_act)),
                       flax.core.unfreeze(dict(v_lta)))

    translated = partial_match_load(
        state, egot2g_action_rules(num_layers=L, agg_layers=AGG_L),
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
    for task, pathways, tpath in (
            ("action_verb", [slow, fast], [slow, fast]),
            ("lta_verb", [slow_n, fast_n], [slow_n, fast_n])):
        ours = np.asarray(model.apply(
            variables, None, [jnp.asarray(p) for p in pathways],
            jnp.asarray(target), task, train=False))
        with torch.no_grad():
            perm = (0, 1, 5, 2, 3, 4) if "lta" in task else (0, 4, 1, 2, 3)
            theirs = tmodel([torch.from_numpy(p).permute(*perm)
                             for p in tpath],
                            torch.from_numpy(target), task)
        theirs = theirs.permute(1, 0, 2).numpy()  # (S, B, V) -> (B, S, V)
        assert ours.shape == theirs.shape == (2, 3, V), task
        np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-3,
                                   err_msg=task)


class TorchPromptActionBase(tnn.Module):
    """Base (non-temporal) variant (video_model_builder_action.py:21-190):
    action tasks encode ONE with-head clip token; LTA tasks concatenate
    per-clip action-head tokens with UNPROJECTED aggregator tokens and
    add the learned (1, 4, D) pe — so the LTA width equals hidden_dim."""

    def __init__(self):
        super().__init__()
        self.transformer_encoder = tnn.TransformerEncoder(
            tnn.TransformerEncoderLayer(D, HEADS, dropout=0.1), L)
        self.transformer_decoder = tnn.TransformerDecoder(
            tnn.TransformerDecoderLayer(D, HEADS, dropout=0.1), L)
        self.fc = tnn.Linear(D, V)
        self.ln = tnn.LayerNorm(D)
        self.task_embed = tnn.Parameter(torch.randn(1, 2, D))
        self.pos_embed = TorchSinusoidalPE(D)
        self.pe = tnn.Parameter(torch.randn(1, 4, D))
        self.embedding = tnn.Embedding(V, D)
        self.action_model = TorchSlowFastWithHead(D)
        self.lta_model = TorchLTAModel(D)

    def encode_prepare(self, x, task_id):
        x = self.ln(x) + self.task_embed[:, task_id, :]
        return self.pos_embed(x.permute(1, 0, 2))

    def encode(self, video, task):
        if "lta" in task:
            n = video[0].shape[1]
            feat_action = torch.stack(
                [self.action_model([p[:, i] for p in video])
                 for i in range(n)], dim=1)
            feat_lta = self.lta_model(video, None, middle=True).transpose(0, 1)
            feat = torch.cat((feat_action, feat_lta), dim=1)
            x = (self.ln(feat) + self.pe).transpose(0, 1)
        else:
            feat_action = self.action_model(video).unsqueeze(1)
            x = self.encode_prepare(feat_action, 0)
        return self.transformer_encoder(x)

    def forward(self, video, target, task):
        encoded = self.encode(video, task)
        sy = target.size(1)
        y = self.embedding(target.permute(1, 0)) * math.sqrt(D)
        y = self.pos_embed(y)
        mask = torch.triu(torch.full((sy, sy), float("-inf")), diagonal=1)
        out = self.transformer_decoder(y, encoded, mask)
        return self.fc(out)


def test_egot2g_action_base_variant_forward_parity(rng):
    """Round-3 advisor: the temporal=False branch (learned pe +
    unprojected LTA tokens, hidden_dim == feature_dim) had no numeric
    golden."""
    from egot2x.core.registry import build_model
    import egot2x.translate.egot2g  # noqa: F401
    import flax.core

    tmodel = TorchPromptActionBase()
    _randomize_bn(tmodel, rng)
    tmodel.eval()
    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    model = build_model("TaskTranslationPromptTransformerActionTask",
                        vocab_size=V, hidden_dim=D, num_heads=HEADS,
                        num_layers=L, alpha=ALPHA, beta_inv=8,
                        feature_dim=D, temporal=False)
    t_slow = T_FAST // ALPHA
    slow = rng.uniform(-1, 1, (2, t_slow, S_ACT, S_ACT, 3)).astype(np.float32)
    fast = rng.uniform(-1, 1, (2, T_FAST, S_ACT, S_ACT, 3)).astype(np.float32)
    slow_n = rng.uniform(
        -1, 1, (2, N_CLIPS, t_slow, S_ACT, S_ACT, 3)).astype(np.float32)
    fast_n = rng.uniform(
        -1, 1, (2, N_CLIPS, T_FAST, S_ACT, S_ACT, 3)).astype(np.float32)
    target = rng.integers(0, V, (2, 3))

    v_act = model.init(jax.random.key(0), None,
                       [jnp.asarray(slow), jnp.asarray(fast)],
                       jnp.asarray(target), "action_verb", train=False)
    v_lta = model.init(jax.random.key(0), None,
                       [jnp.asarray(slow_n), jnp.asarray(fast_n)],
                       jnp.asarray(target), "lta_verb", train=False)
    init_vars = _merge(flax.core.unfreeze(dict(v_act)),
                       flax.core.unfreeze(dict(v_lta)))

    translated = partial_match_load(
        state, egot2g_action_rules(num_layers=L, agg_layers=AGG_L,
                                   temporal=False),
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
    for task, pathways in (("action_verb", [slow, fast]),
                           ("lta_verb", [slow_n, fast_n])):
        ours = np.asarray(model.apply(
            variables, None, [jnp.asarray(p) for p in pathways],
            jnp.asarray(target), task, train=False))
        with torch.no_grad():
            perm = (0, 1, 5, 2, 3, 4) if "lta" in task else (0, 4, 1, 2, 3)
            theirs = tmodel([torch.from_numpy(p).permute(*perm)
                             for p in pathways],
                            torch.from_numpy(target), task)
        theirs = theirs.permute(1, 0, 2).numpy()
        assert ours.shape == theirs.shape == (2, 3, V), task
        np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-3,
                                   err_msg=task)


def test_derive_family_kwargs_from_state_dict():
    """Layer counts and the temporal flag come from the checkpoint keys,
    not the rule defaults (round-3 advisor finding)."""
    from egot2x.core.torch_import import derive_family_kwargs

    tmodel = TorchPromptActionBase()
    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    kw = derive_family_kwargs(state, "egot2g_action")
    assert kw == {"num_layers": L, "agg_layers": AGG_L, "temporal": False}

    tmodel_t = TorchPromptAction()
    state_t = {k: v.detach().numpy()
               for k, v in tmodel_t.state_dict().items()}
    kw_t = derive_family_kwargs(state_t, "egot2g_action")
    assert kw_t == {"num_layers": L, "agg_layers": AGG_L, "temporal": True}
