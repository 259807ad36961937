"""Full-translator forward-parity golden for ts_pnr.

Builds the reference ``TaskFusionMFTransformer3TaskDropout``
(HOI/models/pnr/video_model_transfer_3task.py:213-258) end-to-end in
raw torch.nn with reference parameter names — both frozen ResNet3D
backbones, the frozen SlowFast, the four stream projections, the
learned PE, the torch TransformerEncoder, and the SHARED LayerNorm
(``self.ln`` is ``linear_head[0]``) — translates its real state_dict
through ``ts_pnr_rules`` and asserts numerically identical logits.
This subsumes the per-module goldens and the head-LN tie test: it
would catch token-order, PE-placement, and projection-wiring bugs that
component-level parity cannot.

Geometry is reduced (T=4 PNR frames, 65/64 crops, D=64, 1 layer) but
every structural dimension of the reference graph is exercised: the
8192-d per-frame tokens (crop 65 ⇒ s5 spatial 3 ⇒ 2x2 avg-pool ⇒
2048*4), the 2/8 slow/fast token counts, and the 18-token fused
sequence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from egot2x.core.torch_import import (  # noqa: E402
    apply_rules,
    partial_match_load,
    tree_paths,
    ts_pnr_rules,
)
from test_torch_import_3d import TorchBottleneck, TorchResNet3D  # noqa: E402

ALPHA = 4
B_INV = 8
T_PNR = 4
T_FAST = 8
S_PNR = 65
S_ACT = 64
D = 64


class TorchPNRBackbone(TorchResNet3D):
    """KeyframeLocalizationResNet / StateChangeClsResNet: slow_layer5
    trunk + per-frame head. ``forward_middle`` = reference
    ``middle=True`` (avg-pool spatial, flatten C-major per frame;
    the head projection exists in the state_dict but is dead)."""

    def __init__(self, head_attr, n_out):
        super().__init__()
        head = tnn.Module()
        head.projection = tnn.Linear(8192, n_out)
        setattr(self, head_attr, head)

    def forward_middle(self, x):  # (B, C, T, H, W)
        y = super().forward(x)                      # (B, 2048, T, 3, 3)
        y = F.avg_pool3d(y, (1, 2, 2), stride=1)    # (B, 2048, T, 2, 2)
        return y.permute(0, 2, 1, 3, 4).flatten(2)  # (B, T, 8192)


class TorchFuse(tnn.Module):
    def __init__(self, dim_in, alpha):
        super().__init__()
        self.conv_f2s = tnn.Conv3d(dim_in, dim_in * 2, (5, 1, 1),
                                   (alpha, 1, 1), (2, 0, 0), bias=False)
        self.bn = tnn.BatchNorm3d(dim_in * 2)

    def forward(self, slow, fast):
        f = F.relu(self.bn(self.conv_f2s(fast)))
        return torch.cat([slow, f], dim=1), fast


class TorchSlowFast(tnn.Module):
    """PySlowFast SlowFast trunk with reference module names
    (HOI/models/lta/video_model_builder.py:87-408), middle=True
    semantics: returns the two s5 feature maps."""

    def __init__(self, alpha=ALPHA, b_inv=B_INV):
        super().__init__()
        w = 64
        self.s1 = tnn.Module()
        self.s1.pathway0_stem = tnn.Module()
        self.s1.pathway0_stem.conv = tnn.Conv3d(3, w, (1, 7, 7), (1, 2, 2),
                                                (0, 3, 3), bias=False)
        self.s1.pathway0_stem.bn = tnn.BatchNorm3d(w)
        self.s1.pathway1_stem = tnn.Module()
        self.s1.pathway1_stem.conv = tnn.Conv3d(3, w // b_inv, (5, 7, 7),
                                                (1, 2, 2), (2, 3, 3),
                                                bias=False)
        self.s1.pathway1_stem.bn = tnn.BatchNorm3d(w // b_inv)
        self.pool = tnn.MaxPool3d((1, 3, 3), (1, 2, 2), (0, 1, 1))
        self.s1_fuse = TorchFuse(w // b_inv, alpha)
        depths = [3, 4, 6, 3]
        tk_slow = [1, 1, 3, 3]
        strides = [1, 2, 2, 2]
        slow_in, fast_in = w + 2 * (w // b_inv), w // b_inv
        for idx, (n, st) in enumerate(zip(depths, strides)):
            si = idx + 2
            dout, dinner = w * 4 * (2 ** idx), w * (2 ** idx)
            stage = tnn.Module()
            for b in range(n):
                setattr(stage, f"pathway0_res{b}", TorchBottleneck(
                    slow_in if b == 0 else dout, dout, dinner,
                    tk_slow[idx], st if b == 0 else 1))
                setattr(stage, f"pathway1_res{b}", TorchBottleneck(
                    fast_in if b == 0 else dout // b_inv, dout // b_inv,
                    dinner // b_inv, 3, st if b == 0 else 1))
            setattr(self, f"s{si}", stage)
            fast_in = dout // b_inv
            slow_in = dout + 2 * fast_in
            if si < 5:
                setattr(self, f"s{si}_fuse", TorchFuse(dout // b_inv, alpha))

    def forward(self, pathways):
        slow = self.pool(F.relu(
            self.s1.pathway0_stem.bn(self.s1.pathway0_stem.conv(pathways[0]))))
        fast = self.pool(F.relu(
            self.s1.pathway1_stem.bn(self.s1.pathway1_stem.conv(pathways[1]))))
        slow, fast = self.s1_fuse(slow, fast)
        for si, n in zip(range(2, 6), [3, 4, 6, 3]):
            stage = getattr(self, f"s{si}")
            for b in range(n):
                slow = getattr(stage, f"pathway0_res{b}")(slow)
                fast = getattr(stage, f"pathway1_res{b}")(fast)
            if si < 5:
                slow, fast = getattr(self, f"s{si}_fuse")(slow, fast)
        return [slow, fast]


class TorchTsPnr(tnn.Module):
    """video_model_transfer_3task.py:213-258 verbatim structure."""

    def __init__(self, seq_len):
        super().__init__()
        self.pnr_model = TorchPNRBackbone("Keyframe_localisation_head", 1)
        self.oscc_model = TorchPNRBackbone("State_detection_head", 2)
        self.recognition_model = TorchSlowFast()
        self.proj1 = tnn.Linear(8192, D)
        self.proj2 = tnn.Linear(8192, D)
        self.proj3_slow = tnn.Linear(2048, D)
        self.proj3_fast = tnn.Linear(256, D)
        self.avg_pool_slow = tnn.AdaptiveAvgPool3d((None, 1, 1))
        self.avg_pool_fast = tnn.AdaptiveAvgPool3d((T_FAST, 1, 1))
        self.pe = tnn.Parameter(torch.randn(1, seq_len, D))
        self.ln = tnn.LayerNorm(D)
        self.dp = tnn.Dropout(0.5)
        self.transformer = tnn.TransformerEncoder(
            tnn.TransformerEncoderLayer(d_model=D, nhead=8, dropout=0.1,
                                        dim_feedforward=D * 2,
                                        batch_first=True),
            num_layers=1)
        # the SHARED LN: linear_head[0] IS self.ln
        self.linear_head = tnn.Sequential(self.ln, tnn.Linear(D, 16))

    def forward(self, frames, pathways):
        pnr = self.pnr_model.forward_middle(frames)
        oscc = self.oscc_model.forward_middle(frames)
        slow5, fast5 = self.recognition_model(pathways)
        a_slow = self.avg_pool_slow(slow5).squeeze(-1).squeeze(-1).permute(0, 2, 1)
        a_fast = self.avg_pool_fast(fast5).squeeze(-1).squeeze(-1).permute(0, 2, 1)
        feat = torch.cat(
            [self.dp(self.proj1(pnr)), self.dp(self.proj2(oscc)),
             self.dp(self.proj3_slow(a_slow)), self.dp(self.proj3_fast(a_fast))],
            dim=1)
        feat = self.ln(feat) + self.pe
        out = self.transformer(feat).mean(dim=1)
        return self.linear_head(out)


def _randomize_bn(model, rng):
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm3d):
            with torch.no_grad():
                m.running_mean.copy_(torch.from_numpy(
                    rng.standard_normal(m.running_mean.shape)
                    .astype(np.float32) * 0.1))
                m.running_var.copy_(torch.from_numpy(
                    rng.uniform(0.5, 1.5, m.running_var.shape)
                    .astype(np.float32)))


def test_ts_pnr_full_translator_forward_parity(rng):
    from egot2x.core.registry import build_model
    import egot2x.translate.egot2s_hoi  # noqa: F401

    seq_len = T_PNR + T_PNR + T_FAST // ALPHA + T_FAST  # 18
    tmodel = TorchTsPnr(seq_len)
    _randomize_bn(tmodel, rng)
    tmodel.eval()
    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    model = build_model("TaskFusionMFTransformer3TaskDropout",
                        target="keyframe", crop_size=S_PNR, feature_dim=D,
                        num_layers=1, alpha=ALPHA)
    frames = rng.uniform(-1, 1, (1, T_PNR, S_PNR, S_PNR, 3)).astype(np.float32)
    slow = rng.standard_normal(
        (1, T_FAST // ALPHA, S_ACT, S_ACT, 3)).astype(np.float32)
    fast = rng.standard_normal((1, T_FAST, S_ACT, S_ACT, 3)).astype(np.float32)
    pw = [jnp.asarray(slow), jnp.asarray(fast)]
    init_vars = model.init(jax.random.key(0), jnp.asarray(frames), pw,
                           train=False)

    translated = partial_match_load(state, ts_pnr_rules(num_layers=1),
                                    tree_paths(init_vars))
    leftovers = [k for k in translated["unused"]
                 if "num_batches_tracked" not in k]
    assert leftovers == [], leftovers

    # the pruned tree must be structure-identical to a fresh init
    for coll in ("params", "batch_stats"):
        a = sorted(jax.tree_util.keystr(p) for p, _ in
                   jax.tree_util.tree_leaves_with_path(init_vars[coll]))
        b = sorted(jax.tree_util.keystr(p) for p, _ in
                   jax.tree_util.tree_leaves_with_path(translated[coll]))
        assert a == b, set(a) ^ set(b)

    ours = np.asarray(model.apply(
        {"params": translated["params"],
         "batch_stats": translated["batch_stats"]},
        jnp.asarray(frames), pw, train=False))
    with torch.no_grad():
        theirs = tmodel(
            torch.from_numpy(frames).permute(0, 4, 1, 2, 3),
            [torch.from_numpy(slow).permute(0, 4, 1, 2, 3),
             torch.from_numpy(fast).permute(0, 4, 1, 2, 3)]).numpy()
    assert ours.shape == theirs.shape == (1, 16)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-3)
