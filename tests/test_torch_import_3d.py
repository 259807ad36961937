"""Forward-parity golden for the PySlowFast ResNet3D checkpoint rules:
build the reference architecture in raw torch.nn with PySlowFast names,
translate, and compare outputs numerically."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from egot2x.core.torch_import import apply_rules, resnet3d_rules  # noqa: E402


class TorchBottleneck(tnn.Module):
    """PySlowFast bottleneck with branch1/branch2.{a,b,c} naming."""

    def __init__(self, dim_in, dim_out, dim_inner, temp_k, stride):
        super().__init__()
        if dim_in != dim_out or stride > 1:
            self.branch1 = tnn.Conv3d(dim_in, dim_out, 1, (1, stride, stride),
                                      bias=False)
            self.branch1_bn = tnn.BatchNorm3d(dim_out)
        self.branch2 = tnn.Module()
        self.branch2.a = tnn.Conv3d(dim_in, dim_inner, (temp_k, 1, 1),
                                    padding=(temp_k // 2, 0, 0), bias=False)
        self.branch2.a_bn = tnn.BatchNorm3d(dim_inner)
        self.branch2.b = tnn.Conv3d(dim_inner, dim_inner, (1, 3, 3),
                                    (1, stride, stride), (0, 1, 1), bias=False)
        self.branch2.b_bn = tnn.BatchNorm3d(dim_inner)
        self.branch2.c = tnn.Conv3d(dim_inner, dim_out, 1, bias=False)
        self.branch2.c_bn = tnn.BatchNorm3d(dim_out)

    def forward(self, x):
        y = tnn.functional.relu(self.branch2.a_bn(self.branch2.a(x)))
        y = tnn.functional.relu(self.branch2.b_bn(self.branch2.b(y)))
        y = self.branch2.c_bn(self.branch2.c(y))
        sc = x
        if hasattr(self, "branch1"):
            sc = self.branch1_bn(self.branch1(x))
        return tnn.functional.relu(sc + y)


class TorchResNet3D(tnn.Module):
    """slow_layer5-style trunk with PySlowFast module names, depth 50."""

    def __init__(self):
        super().__init__()
        w = 64
        self.s1 = tnn.Module()
        self.s1.pathway0_stem = tnn.Module()
        self.s1.pathway0_stem.conv = tnn.Conv3d(3, w, (3, 7, 7), (1, 2, 2),
                                                (1, 3, 3), bias=False)
        self.s1.pathway0_stem.bn = tnn.BatchNorm3d(w)
        self.pool = tnn.MaxPool3d((1, 3, 3), (1, 2, 2), (0, 1, 1))
        depths = [3, 4, 6, 3]
        dims = [(w, w * 4, w), (w * 4, w * 8, w * 2), (w * 8, w * 16, w * 4),
                (w * 16, w * 32, w * 8)]
        strides = [1, 2, 2, 2]
        for si, (n, (din, dout, dinner), st) in enumerate(
                zip(depths, dims, strides), start=2):
            stage = tnn.Module()
            for b in range(n):
                setattr(stage, f"pathway0_res{b}", TorchBottleneck(
                    din if b == 0 else dout, dout, dinner, 3,
                    st if b == 0 else 1))
            setattr(self, f"s{si}", stage)

    def forward(self, x):  # (B, C, T, H, W)
        y = tnn.functional.relu(
            self.s1.pathway0_stem.bn(self.s1.pathway0_stem.conv(x)))
        y = self.pool(y)
        for si, n in zip(range(2, 6), [3, 4, 6, 3]):
            stage = getattr(self, f"s{si}")
            for b in range(n):
                y = getattr(stage, f"pathway0_res{b}")(y)
        return y


def test_resnet3d_import_forward_parity(rng):
    from egot2x.nn.resnet3d import ResNet3D

    tmodel = TorchResNet3D()
    for m in tmodel.modules():
        if isinstance(m, tnn.BatchNorm3d):
            with torch.no_grad():
                m.running_mean.copy_(torch.from_numpy(
                    rng.standard_normal(m.running_mean.shape).astype(np.float32) * 0.1))
                m.running_var.copy_(torch.from_numpy(
                    rng.uniform(0.5, 1.5, m.running_var.shape).astype(np.float32)))
    tmodel.eval()
    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    translated = apply_rules(state, resnet3d_rules("", []))
    leftovers = [k for k in translated["unused"] if "num_batches_tracked" not in k]
    assert leftovers == [], leftovers

    model = ResNet3D(arch="slow_layer5", depth=50)
    x = rng.standard_normal((1, 4, 65, 65, 3)).astype(np.float32)
    init_vars = model.init(jax.random.key(0), jnp.asarray(x))
    a = sorted(jax.tree_util.keystr(p) for p, _ in
               jax.tree_util.tree_leaves_with_path(init_vars["params"]))
    b = sorted(jax.tree_util.keystr(p) for p, _ in
               jax.tree_util.tree_leaves_with_path(translated["params"]))
    assert a == b

    ours = np.asarray(model.apply(
        {"params": translated["params"],
         "batch_stats": translated["batch_stats"]}, jnp.asarray(x)))
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(x).permute(0, 4, 1, 2, 3)).numpy()
    theirs = np.transpose(theirs, (0, 2, 3, 4, 1))  # NCTHW → NTHWC
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-3)
