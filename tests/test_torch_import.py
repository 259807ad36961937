"""Golden parity tests for the torch→JAX checkpoint translator: build the
reference architectures in raw torch.nn, translate their state_dicts, and
compare forward outputs numerically."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from egot2x.core.torch_import import (  # noqa: E402
    apply_rules,
    lam_baseline_rules,
    mha_rules,
    resnet18_rules,
    strip_prefix,
)


class TorchBasicBlock(tnn.Module):
    """torchvision BasicBlock layout (reference HHI/models/lam/resnet.py)."""

    def __init__(self, inp, out, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(inp, out, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(out)
        self.relu = tnn.ReLU()
        self.conv2 = tnn.Conv2d(out, out, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(out)
        self.downsample = None
        if stride != 1 or inp != out:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inp, out, 1, stride, bias=False), tnn.BatchNorm2d(out))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + idt)


class TorchResNet18(tnn.Module):
    def __init__(self, num_classes=256):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        widths = [64, 128, 256, 512]
        for i, w in enumerate(widths):
            stride = 1 if i == 0 else 2
            inp = 64 if i == 0 else widths[i - 1]
            setattr(self, f"layer{i + 1}", tnn.Sequential(
                TorchBasicBlock(inp, w, stride), TorchBasicBlock(w, w)))
        self.avgpool = tnn.AdaptiveAvgPool2d(1)
        self.fc = tnn.Linear(512, 1000)
        self.fc2 = tnn.Linear(1000, num_classes)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for i in range(1, 5):
            x = getattr(self, f"layer{i}")(x)
        x = self.avgpool(x).flatten(1)
        return self.fc2(self.fc(x))


def _randomize_bn_stats(model, rng):
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(torch.from_numpy(
                    rng.standard_normal(m.running_mean.shape).astype(np.float32) * 0.1))
                m.running_var.copy_(torch.from_numpy(
                    rng.uniform(0.5, 1.5, m.running_var.shape).astype(np.float32)))


def test_resnet18_import_forward_parity(rng):
    from egot2x.nn.resnet2d import resnet18

    tmodel = TorchResNet18(num_classes=256)
    _randomize_bn_stats(tmodel, rng)
    tmodel.eval()
    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    translated = apply_rules(state, resnet18_rules("", []))
    # every torch leaf except BN num_batches_tracked must be consumed
    leftovers = [k for k in translated["unused"] if "num_batches_tracked" not in k]
    assert leftovers == [], leftovers

    model = resnet18(num_classes=256)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    init_vars = model.init(jax.random.key(0), jnp.asarray(x))
    variables = {"params": translated["params"],
                 "batch_stats": translated["batch_stats"]}
    # tree structures must match what init produced
    a = sorted(jax.tree_util.keystr(p) for p, _ in
               jax.tree_util.tree_leaves_with_path(init_vars["params"]))
    b = sorted(jax.tree_util.keystr(p) for p, _ in
               jax.tree_util.tree_leaves_with_path(translated["params"]))
    assert a == b

    ours = np.asarray(model.apply(variables, jnp.asarray(x)))
    theirs = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_lam_baseline_import_forward_parity(rng):
    """Full reference LAM BaselineLSTM vs translated egot2x model."""
    from egot2x.core.registry import build_model
    import egot2x.models.lam  # noqa

    class TorchLam(tnn.Module):
        def __init__(self):
            super().__init__()
            self.base_model = TorchResNet18(256)
            self.lstm = tnn.LSTM(256, 256, bidirectional=True, num_layers=2,
                                 batch_first=True)
            self.last_layer1 = tnn.Linear(512, 128)
            self.last_layer2 = tnn.Linear(128, 2)

        def forward(self, x):
            n, d = x.shape[0], x.shape[1]
            feats = self.base_model(x.reshape(n * d, *x.shape[2:]))
            feats = feats.reshape(n, d, 256)
            out, _ = self.lstm(feats)
            return self.last_layer2(self.last_layer1(out[:, 3]))

    tmodel = TorchLam()
    _randomize_bn_stats(tmodel, rng)
    tmodel.eval()
    state = strip_prefix({k: v.detach().numpy()
                          for k, v in tmodel.state_dict().items()})
    translated = apply_rules(state, lam_baseline_rules())
    leftovers = [k for k in translated["unused"] if "num_batches_tracked" not in k]
    assert leftovers == [], leftovers

    model = build_model("BaselineLSTM")
    clip = rng.standard_normal((2, 7, 64, 64, 3)).astype(np.float32)
    variables = {"params": translated["params"],
                 "batch_stats": translated["batch_stats"]}
    ours = np.asarray(model.apply(variables, jnp.asarray(clip)))
    theirs = tmodel(
        torch.from_numpy(clip).permute(0, 1, 4, 2, 3)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_mha_import_parity(rng):
    from egot2x.nn.common import MultiHeadAttention

    d, h = 32, 4
    tmha = tnn.MultiheadAttention(d, h, batch_first=True)
    tmha.eval()
    state = {("attn." + k): v.detach().numpy()
             for k, v in tmha.state_dict().items()}
    translated = apply_rules(state, mha_rules("attn", []))
    assert translated["unused"] == []

    model = MultiHeadAttention(d, h)
    x = rng.standard_normal((2, 6, d)).astype(np.float32)
    ours = np.asarray(model.apply({"params": translated["params"]},
                                  jnp.asarray(x), jnp.asarray(x), jnp.asarray(x)))
    theirs = tmha(torch.from_numpy(x), torch.from_numpy(x),
                  torch.from_numpy(x))[0].detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_caffe2_name_conversion():
    from egot2x.core.torch_import import convert_caffe2_name as c

    assert c("conv1_w") == "s1.pathway0_stem.conv.weight"
    assert c("res_conv1_bn_s") == "s1.pathway0_stem.bn.weight"
    assert c("res4_0_branch1_w") == "s4.pathway0_res0.branch1.weight"
    assert c("res4_4_branch2c_bn_b") == "s4.pathway0_res4.branch2.c_bn.bias"
    assert c("t_conv1_w") == "s1.pathway1_stem.conv.weight"
    assert c("t_res4_5_branch2c_bn_subsample_bn_rm") == "s4_fuse.bn.running_mean"
    assert c("pred_b") == "head.projection.bias"


def test_caffe2_pickle_roundtrip(tmp_path):
    import pickle

    from egot2x.core.torch_import import load_caffe2_pickle

    blobs = {
        "conv1_w": np.zeros((64, 3, 1, 7, 7), np.float32),
        "conv1_w_momentum": np.zeros(1, np.float32),  # dropped
        "res_conv1_bn_s": np.ones(64, np.float32),
    }
    p = tmp_path / "c2.pkl"
    with open(p, "wb") as f:
        pickle.dump({"blobs": blobs}, f)
    state = load_caffe2_pickle(str(p))
    assert "s1.pathway0_stem.conv.weight" in state
    assert "s1.pathway0_stem.bn.weight" in state
    assert len(state) == 2


def test_talknet_rules_cover_model_tree(rng):
    """Every leaf of the TalkNet init tree is produced by the rule map
    (structure equality via inverse-transformed synthetic source arrays)."""
    import jax
    import jax.numpy as jnp

    from egot2x.core import torch_import as ti
    from egot2x.nn.talknet import TalkNetModel

    model = TalkNetModel()
    t = 4
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 4 * t, 13)),
                           jnp.zeros((1, t, 112, 112)))

    # destination-path → leaf map from the real init
    leaves = {}
    for coll in ("params", "batch_stats"):
        for p, v in jax.tree_util.tree_leaves_with_path(variables.get(coll, {})):
            key = tuple(getattr(k, "key") for k in p)
            leaves[(coll,) + key] = np.asarray(v)

    inverse = {
        ti.t_conv2d: lambda a: np.transpose(a, (3, 2, 0, 1)),
        ti.t_conv3d: lambda a: np.transpose(a, (4, 3, 0, 1, 2)),
        ti.t_conv1d: lambda a: np.transpose(a, (2, 1, 0)),
        ti.t_depthwise_conv1d: lambda a: np.transpose(a, (2, 1, 0)),
        ti.t_linear: lambda a: np.transpose(a, (1, 0)),
    }
    state = {}
    rules = ti.talknet_rules()
    for src, (coll, dst), transform in rules:
        key = (coll,) + tuple(dst)
        if key not in leaves:
            continue  # optional leaves (e.g. downsample on non-strided blocks)
        inv = inverse.get(transform)
        arr = leaves[key]
        if transform in (ti.t_id,):
            state[src] = arr
        elif inv is not None:
            state[src] = inv(arr)
        else:  # custom lambdas (MHA splits, gln reshape) — synthesize by shape
            continue
    translated = ti.apply_rules(state, rules)
    assert translated["unused"] == []
    produced = set()
    for coll in ("params", "batch_stats"):
        for p, _ in jax.tree_util.tree_leaves_with_path(translated[coll]):
            produced.add((coll,) + tuple(getattr(k, "key") for k in p))
    # every produced path must exist in the real model tree with equal shape
    for key in produced:
        assert key in leaves, key
    # coverage: rules reach the large majority of the model tree (custom
    # lambda leaves like MHA q/k/v and gln are exercised separately)
    assert len(produced) > 0.8 * len(leaves)


def test_resnetse_import_forward_parity(rng):
    """SE-ResNet trunk + ASP pooling vs a raw-torch replica of the
    reference ResNetSE (resse.py), fed an identical precomputed mel."""
    import jax
    import jax.numpy as jnp

    from egot2x.core.torch_import import apply_rules, resnetse_rules
    from egot2x.nn.resnet_se import ResNetSE

    class TSE(tnn.Module):
        def __init__(self, ch, red=8):
            super().__init__()
            self.avg_pool = tnn.AdaptiveAvgPool2d(1)
            self.fc = tnn.Sequential(tnn.Linear(ch, ch // red), tnn.ReLU(),
                                     tnn.Linear(ch // red, ch), tnn.Sigmoid())

        def forward(self, x):
            b, c = x.shape[:2]
            y = self.fc(self.avg_pool(x).view(b, c)).view(b, c, 1, 1)
            return x * y

    class TBlock(tnn.Module):
        def __init__(self, inp, out, stride=1):
            super().__init__()
            self.conv1 = tnn.Conv2d(inp, out, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(out)
            self.conv2 = tnn.Conv2d(out, out, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(out)
            self.relu = tnn.ReLU()
            self.se = TSE(out)
            self.downsample = None
            if stride != 1 or inp != out:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(inp, out, 1, stride, bias=False),
                    tnn.BatchNorm2d(out))

        def forward(self, x):
            r = x if self.downsample is None else self.downsample(x)
            # reference order: conv → relu → bn (resse.py:146-148)
            y = self.bn1(self.relu(self.conv1(x)))
            y = self.se(self.bn2(self.conv2(y)))
            return self.relu(y + r)

    class TResNetSE(tnn.Module):
        def __init__(self):
            super().__init__()
            f = [32, 64, 128, 256]
            self.conv1 = tnn.Conv2d(1, f[0], 3, 1, 1)
            self.relu = tnn.ReLU()
            self.bn1 = tnn.BatchNorm2d(f[0])
            for i, ch in enumerate(f):
                stride = 1 if i == 0 else 2
                inp = f[0] if i == 0 else f[i - 1]
                setattr(self, f"layer{i + 1}", tnn.Sequential(
                    TBlock(inp, ch, stride), TBlock(ch, ch)))
            self.attention = tnn.Sequential(
                tnn.Conv1d(256 * 8, 128, 1), tnn.ReLU(), tnn.BatchNorm1d(128),
                tnn.Conv1d(128, 256 * 8, 1), tnn.Softmax(dim=2))
            self.fc = tnn.Linear(256 * 8 * 2, 512)

        def forward(self, mel):  # (B, 64, T)
            x = mel.unsqueeze(1)
            x = self.bn1(self.relu(self.conv1(x)))
            for i in range(1, 5):
                x = getattr(self, f"layer{i}")(x)
            x = x.reshape(x.size(0), -1, x.size(-1))
            w = self.attention(x)
            mu = (x * w).sum(2)
            sg = torch.sqrt(((x ** 2 * w).sum(2) - mu ** 2).clamp(min=1e-5))
            return self.fc(torch.cat([mu, sg], 1))

    tmodel = TResNetSE()
    for m in tmodel.modules():
        if isinstance(m, (tnn.BatchNorm2d, tnn.BatchNorm1d)):
            with torch.no_grad():
                m.running_mean.copy_(torch.from_numpy(
                    rng.standard_normal(m.running_mean.shape).astype(np.float32) * 0.1))
                m.running_var.copy_(torch.from_numpy(
                    rng.uniform(0.5, 1.5, m.running_var.shape).astype(np.float32)))
    tmodel.eval()
    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    translated = apply_rules(state, resnetse_rules("", []))
    leftovers = [k for k in translated["unused"] if "num_batches_tracked" not in k]
    assert leftovers == [], leftovers

    mel = rng.standard_normal((2, 64, 40)).astype(np.float32)
    model = ResNetSE()
    ours = np.asarray(model.apply(
        {"params": translated["params"],
         "batch_stats": translated["batch_stats"]},
        jnp.zeros((2, 100)), mel=jnp.asarray(mel)))
    theirs = tmodel(torch.from_numpy(mel)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_mvit_rules_cover_model_tree(rng):
    """MViT rule map covers the model tree via inverse-transformed
    synthetic source arrays (same approach as the TalkNet coverage test)."""
    import jax
    import jax.numpy as jnp

    from egot2x.core import torch_import as ti
    from egot2x.nn.mvit import MultiTaskMViT

    model = MultiTaskMViT(embed_dim=32, depth=6, num_heads=1,
                          dim_mul_blocks=(1, 3), head_mul_blocks=(1, 3),
                          q_pool_blocks=(1, 3), num_classes=(7, 9))
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 8, 64, 64, 3)), train=False)
    leaves = {}
    for coll in ("params",):
        for p, v in jax.tree_util.tree_leaves_with_path(variables.get(coll, {})):
            key = tuple(getattr(k, "key") for k in p)
            leaves[(coll,) + key] = np.asarray(v)

    inverse = {
        ti.t_conv3d: lambda a: np.transpose(a, (4, 3, 0, 1, 2)),
        ti.t_linear: lambda a: np.transpose(a, (1, 0)),
        ti.t_id: lambda a: a,
    }
    state = {}
    rules = ti.mvit_rules(depth=6)
    for src, (coll, dst), transform in rules:
        key = (coll,) + tuple(dst)
        if key not in leaves or src in state:
            continue
        state[src] = inverse[transform](leaves[key])
    translated = ti.apply_rules(state, rules)
    assert translated["unused"] == []
    produced = set()
    for p, _ in jax.tree_util.tree_leaves_with_path(translated["params"]):
        produced.add(("params",) + tuple(getattr(k, "key") for k in p))
    for key in produced:
        assert key in leaves, key
    assert len(produced) > 0.9 * len(leaves)
