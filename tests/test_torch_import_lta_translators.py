"""Full-model forward-parity goldens for the LTA-target EgoT2-s
translators.

Builds the reference ``TaskFusionMFTransformerLTA4Task``
(HOI/models/lta/lta_models_lta_transfer.py:257-377) and LTA-target
``TaskFusionMFTransformer2Task`` (:429-526) end-to-end in raw torch.nn:
frozen PNR/OSCC ResNet3D backbones with per-clip meaned 8192-d tokens
(4-task only), the frozen AR SlowFast with live head, the frozen LTA
ForecastingEncoderDecoder (clip backbone + aggregator; its decoder is
dead under middle=True), the always-projected LTA tokens of the 4-task
vs the Identity-at-matching-width of the 2-task, the (ln + learned pe)
fusion with torch-default FF-2048 encoder, and the Z-action
MultiTaskHead decode (TEST.NO_ACT semantics). Imports the real
state_dicts through ``egot2s_lta4task_rules`` / ``egot2s_lta2task_rules``
and asserts numerically identical verb/noun logits.

These were the last EgoT2-s composites without numeric goldens
(round-3 verdict weak #5); building them caught two real parity bugs:
the missing ``proj_lta`` on the 4-task and the fusion core's FF width
(2× feature_dim vs the reference's fixed 2048).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from egot2x.core.torch_import import (  # noqa: E402
    egot2s_lta2task_rules,
    egot2s_lta4task_rules,
    partial_match_load,
    tree_paths,
)
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

D, HEADS, L = 64, 4, 1
N_CLIPS = 2
NUM_CLASSES = (5, 7)
Z = 3  # NUM_ACTIONS_TO_PREDICT, reduced from 20


class TMultiTaskHead(tnn.Module):
    """head_helper.py MultiTaskHead (eval, TEST.NO_ACT=True)."""

    def __init__(self, dim, n_heads):
        super().__init__()
        self.pathway0_avgpool = tnn.AdaptiveAvgPool3d((1, 1, 1))
        self.projections = tnn.ModuleList(
            [tnn.Linear(dim, sum(NUM_CLASSES)) for _ in range(n_heads)])

    def forward(self, inputs):
        x = self.pathway0_avgpool(inputs[0]).permute(0, 2, 3, 4, 1)
        outs = [p(x) for p in self.projections]
        return [o.mean([1, 2, 3]).view(o.shape[0], -1) for o in outs]


class TorchLTA2Task(tnn.Module):
    """lta_models_lta_transfer.py:429-526 (feature_dim == lta width ⇒
    proj_lta is Identity and absent from the state_dict)."""

    def __init__(self, dim):
        super().__init__()
        self.pe = tnn.Parameter(torch.randn(1, N_CLIPS * 2, dim))
        self.transformer = tnn.TransformerEncoder(
            tnn.TransformerEncoderLayer(dim, HEADS, dropout=0.1,
                                        batch_first=True), L)
        self.ln = tnn.LayerNorm(dim)
        self.action_model = TorchSlowFastWithHead(dim)
        self.lta_model = TorchLTAModel(dim)
        self.head = TMultiTaskHead(dim, Z)

    def encode_clips(self, model, x):
        n = x[0].shape[1]
        return torch.stack([model([p[:, i] for p in x])
                            for i in range(n)], dim=1)

    def decode(self, x):
        x = x.view(x.shape[0], -1, 1, 1, 1)
        x = torch.stack(self.head([x]), dim=1)  # (B, Z, total)
        return torch.split(x, list(NUM_CLASSES), dim=-1)

    def fuse(self, feat):
        feat = self.ln(feat) + self.pe
        return self.decode(self.transformer(feat).mean(dim=1))

    def forward(self, x_lta, x_pnr=None):
        feat_action = self.encode_clips(self.action_model, x_lta)
        feat_lta = self.lta_model(x_lta, None, middle=True).transpose(0, 1)
        return self.fuse(torch.cat((feat_action, feat_lta), dim=1))


class TorchLTA4Task(TorchLTA2Task):
    """lta_models_lta_transfer.py:257-377: adds frozen PNR/OSCC streams;
    proj_lta is ALWAYS a Linear here (:271)."""

    def __init__(self):
        super().__init__(D)
        self.pe = tnn.Parameter(torch.randn(1, N_CLIPS * 4, D))
        self.proj_pnr = tnn.Linear(8192, D)
        self.proj_oscc = tnn.Linear(8192, D)
        self.proj_lta = tnn.Linear(FEAT, D)
        self.lta_model = TorchLTAModel(FEAT)
        self.pnr_model = TorchPNRBackbone("Keyframe_localisation_head", 1)
        self.oscc_model = TorchPNRBackbone("State_detection_head", 2)

    def encode_clips_pnr(self, model, x):
        n = x.shape[1]
        return torch.stack([model.forward_middle(x[:, i]).mean(dim=1)
                            for i in range(n)], dim=1)

    def forward(self, x_lta, x_pnr):
        feat_pnr = self.proj_pnr(self.encode_clips_pnr(self.pnr_model, x_pnr))
        feat_oscc = self.proj_oscc(
            self.encode_clips_pnr(self.oscc_model, x_pnr))
        feat_action = self.encode_clips(self.action_model, x_lta)
        feat_lta = self.proj_lta(
            self.lta_model(x_lta, None, middle=True).transpose(0, 1))
        return self.fuse(torch.cat(
            (feat_pnr, feat_oscc, feat_action, feat_lta), dim=1))


def _inputs(rng, with_pnr):
    t_slow = T_FAST // ALPHA
    slow_n = rng.uniform(
        -1, 1, (2, N_CLIPS, t_slow, S_ACT, S_ACT, 3)).astype(np.float32)
    fast_n = rng.uniform(
        -1, 1, (2, N_CLIPS, T_FAST, S_ACT, S_ACT, 3)).astype(np.float32)
    frames_n = (rng.uniform(0, 255, (2, N_CLIPS, T_PNR, S_PNR, S_PNR, 3))
                .astype(np.float32) if with_pnr else None)
    return [slow_n, fast_n], frames_n


def _run_parity(rng, tmodel, model, rules, apply_args, torch_args,
                allowed_dead):
    tmodel.eval()
    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    init_vars = model.init(jax.random.key(0), *apply_args, train=False)
    translated = partial_match_load(state, rules, tree_paths(init_vars))
    leftovers = [k for k in translated["unused"]
                 if "num_batches_tracked" not in k
                 and not k.endswith("pos_encoder.pe")
                 and not k.startswith(allowed_dead)]
    assert leftovers == [], leftovers
    for coll in ("params", "batch_stats"):
        a = sorted(jax.tree_util.keystr(p) for p, _ in
                   jax.tree_util.tree_leaves_with_path(init_vars[coll]))
        b = sorted(jax.tree_util.keystr(p) for p, _ in
                   jax.tree_util.tree_leaves_with_path(translated[coll]))
        assert a == b, set(a) ^ set(b)
    variables = {"params": translated["params"],
                 "batch_stats": translated["batch_stats"]}
    ours = model.apply(variables, *apply_args, train=False)
    with torch.no_grad():
        theirs = tmodel(*torch_args)
    for o, t, name in zip(ours, theirs, ("verb", "noun")):
        o, t = np.asarray(o), t.numpy()
        assert o.shape == t.shape == (2, Z, NUM_CLASSES[0 if name == "verb"
                                                        else 1]), name
        np.testing.assert_allclose(o, t, rtol=1e-3, atol=2e-3, err_msg=name)


def test_lta4task_full_translator_forward_parity(rng):
    from egot2x.core.registry import build_model
    import egot2x.translate.egot2s_hoi  # noqa: F401

    tmodel = TorchLTA4Task()
    _randomize_bn(tmodel, rng)
    model = build_model("TaskFusionMFTransformerLTA4Task",
                        num_classes=NUM_CLASSES, num_actions=Z,
                        num_input_clips=N_CLIPS, feature_dim=D,
                        lta_dim=FEAT, num_layers=L, num_heads=HEADS,
                        crop_size=S_PNR, alpha=ALPHA, beta_inv=8)
    pathways, frames_n = _inputs(rng, with_pnr=True)
    apply_args = ([jnp.asarray(p) for p in pathways], jnp.asarray(frames_n))
    torch_args = ([torch.from_numpy(p).permute(0, 1, 5, 2, 3, 4)
                   for p in pathways],
                  torch.from_numpy(frames_n).permute(0, 1, 5, 2, 3, 4))
    _run_parity(rng, tmodel, model,
                egot2s_lta4task_rules(L, AGG_L, Z), apply_args, torch_args,
                allowed_dead=("lta_model.decoder.",))


def test_lta2task_full_translator_forward_parity(rng):
    from egot2x.core.registry import build_model
    import egot2x.translate.egot2s_hoi  # noqa: F401

    tmodel = TorchLTA2Task(FEAT)
    _randomize_bn(tmodel, rng)
    model = build_model("TaskFusionMFTransformer2TaskLTA",
                        num_classes=NUM_CLASSES, num_actions=Z,
                        num_input_clips=N_CLIPS, feature_dim=FEAT,
                        lta_dim=FEAT, num_layers=L, num_heads=HEADS,
                        alpha=ALPHA, beta_inv=8)
    pathways, _ = _inputs(rng, with_pnr=False)
    apply_args = ([jnp.asarray(p) for p in pathways],)
    torch_args = ([torch.from_numpy(p).permute(0, 1, 5, 2, 3, 4)
                   for p in pathways],)
    _run_parity(rng, tmodel, model,
                egot2s_lta2task_rules(L, AGG_L, Z), apply_args, torch_args,
                allowed_dead=("lta_model.decoder.",))
