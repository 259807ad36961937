"""Forward-parity golden for the TalkNet visual pipeline import rules:
torch replica of the reference visualFrontend + visualTCN + visualConv1D
→ translated → numerically identical per-frame features."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from egot2x.core.torch_import import apply_rules, talknet_rules  # noqa: E402


class TResNetLayer(tnn.Module):
    """Reference AVSR ResNetLayer (visualEncoder.py:17-59)."""

    def __init__(self, inp, out, stride):
        super().__init__()
        bn = lambda c: tnn.BatchNorm2d(c, momentum=0.01, eps=0.001)
        self.conv1a = tnn.Conv2d(inp, out, 3, stride, 1, bias=False)
        self.bn1a = bn(out)
        self.conv2a = tnn.Conv2d(out, out, 3, 1, 1, bias=False)
        self.stride = stride
        self.downsample = tnn.Conv2d(inp, out, 1, stride, bias=False)
        self.outbna = bn(out)
        self.conv1b = tnn.Conv2d(out, out, 3, 1, 1, bias=False)
        self.bn1b = bn(out)
        self.conv2b = tnn.Conv2d(out, out, 3, 1, 1, bias=False)
        self.outbnb = bn(out)

    def forward(self, x):
        b = tnn.functional.relu(self.bn1a(self.conv1a(x)))
        b = self.conv2a(b)
        res = x if self.stride == 1 else self.downsample(x)
        b = b + res
        inter = b
        b = tnn.functional.relu(self.outbna(b))
        b = tnn.functional.relu(self.bn1b(self.conv1b(b)))
        b = self.conv2b(b) + inter
        return tnn.functional.relu(self.outbnb(b))


class TGLN(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.gamma = tnn.Parameter(torch.ones(1, c, 1))
        self.beta = tnn.Parameter(torch.zeros(1, c, 1))

    def forward(self, y):
        mean = y.mean(dim=1, keepdim=True).mean(dim=2, keepdim=True)
        var = ((y - mean) ** 2).mean(dim=1, keepdim=True).mean(dim=2, keepdim=True)
        return self.gamma * (y - mean) / (var + 1e-8) ** 0.5 + self.beta


class TDSConv1d(tnn.Module):
    def __init__(self):
        super().__init__()
        self.net = tnn.Sequential(
            tnn.ReLU(), tnn.BatchNorm1d(512),
            tnn.Conv1d(512, 512, 3, 1, 1, groups=512, bias=False),
            tnn.PReLU(), TGLN(512), tnn.Conv1d(512, 512, 1, bias=False))

    def forward(self, x):
        return self.net(x) + x


class TVisual(tnn.Module):
    """frontend3D + resnet + TCN + conv1D with reference module names."""

    def __init__(self):
        super().__init__()
        self.visualFrontend = tnn.Module()
        self.visualFrontend.frontend3D = tnn.Sequential(
            tnn.Conv3d(1, 64, (5, 7, 7), (1, 2, 2), (2, 3, 3), bias=False),
            tnn.BatchNorm3d(64, momentum=0.01, eps=0.001), tnn.ReLU(),
            tnn.MaxPool3d((1, 3, 3), (1, 2, 2), (0, 1, 1)))
        self.visualFrontend.resnet = tnn.Module()
        for i, (inp, out, st) in enumerate([(64, 64, 1), (64, 128, 2),
                                            (128, 256, 2), (256, 512, 2)]):
            setattr(self.visualFrontend.resnet, f"layer{i + 1}",
                    TResNetLayer(inp, out, st))
        self.visualTCN = tnn.Module()
        self.visualTCN.net = tnn.Sequential(*[TDSConv1d() for _ in range(5)])
        self.visualConv1D = tnn.Module()
        self.visualConv1D.net = tnn.Sequential(
            tnn.Conv1d(512, 256, 5, 1, 2), tnn.BatchNorm1d(256), tnn.ReLU(),
            tnn.Conv1d(256, 128, 1))

    def forward(self, faces):  # (B, T, H, W) in [0, 255]
        b, t, h, w = faces.shape
        x = (faces / 255.0 - 0.4161) / 0.1688
        x = x.unsqueeze(1)  # (B, 1, T, H, W) per-sample 3D stem
        x = self.visualFrontend.frontend3D(x)
        x = x.transpose(1, 2).reshape(b * t, 64, x.shape[-2], x.shape[-1])
        for i in range(1, 5):
            x = getattr(self.visualFrontend.resnet, f"layer{i}")(x)
        x = tnn.functional.avg_pool2d(x, x.shape[-1]).reshape(b, t, 512)
        x = x.transpose(1, 2)
        x = self.visualTCN.net(x)
        x = self.visualConv1D.net(x)
        return x.transpose(1, 2)  # (B, T, 128)


def test_talknet_visual_import_forward_parity(rng):
    from egot2x.nn.talknet import VisualConv1D, VisualFrontend, VisualTCN
    from flax import linen as nn

    class OurVisual(nn.Module):
        @nn.compact
        def __call__(self, faces):
            x = VisualFrontend(name="visual_frontend")(faces)
            x = VisualTCN(name="visual_tcn")(x)
            return VisualConv1D(name="visual_conv1d")(x)

    tmodel = TVisual()
    for m in tmodel.modules():
        if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d, tnn.BatchNorm3d)):
            with torch.no_grad():
                m.running_mean.copy_(torch.from_numpy(
                    rng.standard_normal(m.running_mean.shape).astype(np.float32) * 0.05))
                m.running_var.copy_(torch.from_numpy(
                    rng.uniform(0.8, 1.2, m.running_var.shape).astype(np.float32)))
    tmodel.eval()
    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    translated = apply_rules(state, talknet_rules([]))
    used_prefixes = ("visualFrontend", "visualTCN", "visualConv1D")
    leftovers = [k for k in translated["unused"]
                 if k.startswith(used_prefixes) and "num_batches" not in k]
    assert leftovers == [], leftovers

    faces = rng.uniform(0, 255, (1, 6, 112, 112)).astype(np.float32)
    ours = np.asarray(OurVisual().apply(
        {"params": translated["params"],
         "batch_stats": translated["batch_stats"]},
        jnp.asarray(faces)))
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(faces)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-3)
