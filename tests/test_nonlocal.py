"""Nonlocal block: torch golden parity + config wiring.

Golden scaffolding mirrors the reference math
(HOI/models/lta/nonlocal_helper.py:13-145); the wiring test checks a
user YAML's NONLOCAL.LOCATION actually instantiates blocks (round-3
verdict: it used to be silently ignored).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from egot2x.core.torch_import import (  # noqa: E402
    _bn_rule,
    _conv_rule,
    apply_rules,
    t_conv3d,
)
from egot2x.nn.resnet3d import Nonlocal, ResStage, resolve_nonlocal  # noqa: E402


class TorchNonlocal(tnn.Module):
    """Reference Nonlocal replica (nonlocal_helper.py forward math)."""

    def __init__(self, dim, dim_inner, pool_size=None,
                 instantiation="softmax"):
        super().__init__()
        self.dim_inner = dim_inner
        self.instantiation = instantiation
        self.conv_theta = tnn.Conv3d(dim, dim_inner, 1)
        self.conv_phi = tnn.Conv3d(dim, dim_inner, 1)
        self.conv_g = tnn.Conv3d(dim, dim_inner, 1)
        self.conv_out = tnn.Conv3d(dim_inner, dim, 1)
        self.bn = tnn.BatchNorm3d(dim)
        self.use_pool = pool_size is not None and any(
            s > 1 for s in pool_size)
        if self.use_pool:
            self.pool = tnn.MaxPool3d(pool_size, pool_size, padding=0)

    def forward(self, x):
        x_identity = x
        n, c, t, h, w = x.shape
        theta = self.conv_theta(x)
        if self.use_pool:
            x = self.pool(x)
        phi = self.conv_phi(x)
        g = self.conv_g(x)
        theta = theta.view(n, self.dim_inner, -1)
        phi = phi.view(n, self.dim_inner, -1)
        g = g.view(n, self.dim_inner, -1)
        theta_phi = torch.einsum("nct,ncp->ntp", (theta, phi))
        if self.instantiation == "softmax":
            theta_phi = theta_phi * (self.dim_inner ** -0.5)
            theta_phi = tnn.functional.softmax(theta_phi, dim=2)
        else:
            theta_phi = theta_phi / theta_phi.shape[2]
        out = torch.einsum("ntg,ncg->nct", (theta_phi, g))
        out = out.view(n, self.dim_inner, t, h, w)
        return x_identity + self.bn(self.conv_out(out))


def _import_nonlocal(tmodel):
    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    rules = []
    for leaf in ("conv_theta", "conv_phi", "conv_g", "conv_out"):
        rules += _conv_rule(leaf, [leaf], t_conv3d, bias=True)
    rules += _bn_rule("bn", ["bn"])
    out = apply_rules(state, rules)
    leftovers = [k for k in out["unused"] if "num_batches_tracked" not in k]
    assert leftovers == [], leftovers
    return {"params": out["params"], "batch_stats": out["batch_stats"]}


@pytest.mark.parametrize("instantiation,pool", [
    ("softmax", None),
    ("dot_product", None),
    ("dot_product", (1, 2, 2)),
])
def test_nonlocal_torch_parity(rng, instantiation, pool):
    dim, dim_inner = 16, 8
    tmodel = TorchNonlocal(dim, dim_inner, pool, instantiation)
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm3d):
                m.running_mean.copy_(torch.from_numpy(
                    rng.standard_normal(dim).astype(np.float32) * 0.1))
                m.running_var.copy_(torch.from_numpy(
                    rng.uniform(0.5, 1.5, dim).astype(np.float32)))
                m.weight.copy_(torch.from_numpy(
                    rng.uniform(0.5, 1.5, dim).astype(np.float32)))
                m.bias.copy_(torch.from_numpy(
                    rng.standard_normal(dim).astype(np.float32) * 0.1))
    tmodel.eval()

    model = Nonlocal(dim_inner, pool, instantiation)
    variables = _import_nonlocal(tmodel)
    x = rng.standard_normal((2, 4, 6, 6, dim)).astype(np.float32)
    # structural check against a fresh init
    fresh = jax.eval_shape(model.init, jax.random.key(0), jnp.asarray(x))
    a = sorted(jax.tree_util.keystr(p) for p, _ in
               jax.tree_util.tree_leaves_with_path(fresh["params"]))
    b = sorted(jax.tree_util.keystr(p) for p, _ in
               jax.tree_util.tree_leaves_with_path(variables["params"]))
    assert a == b

    ours = np.asarray(model.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(x).permute(0, 4, 1, 2, 3)).numpy()
    theirs = np.transpose(theirs, (0, 2, 3, 4, 1))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_resstage_nonlocal_group(rng):
    """group=2 folds T into batch around the block (resnet_helper.py
    forward) — shape-preserving and differs from group=1."""
    stage = ResStage(dim_out=16, dim_inner=8, num_blocks=2,
                     temp_kernel_sizes=(3,), num_block_temp_kernel=2,
                     stride=1, nonlocal_inds=(1,), nonlocal_group=2,
                     nonlocal_pool=(1, 2, 2))
    x = jnp.asarray(rng.standard_normal((1, 4, 8, 8, 16)).astype(np.float32))
    variables = stage.init(jax.random.key(0), x)
    assert "nonlocal1" in variables["params"]
    y = stage.apply(variables, x)
    assert y.shape == x.shape


def test_resolve_nonlocal():
    assert resolve_nonlocal(None) is None
    assert resolve_nonlocal([[[]], [[]], [[]], [[]]]) is None
    cfg = resolve_nonlocal([[[]], [[]], [[1, 3]], [[]]],
                           group=[[1], [1], [2], [1]],
                           pool=[[1, 2, 2]] * 4,
                           instantiation="softmax")
    assert cfg == (((), (), (1, 3), ()), (1, 1, 2, 1),
                   ((1, 2, 2),) * 4, "softmax")


def test_pnr_task_honors_nonlocal_location():
    """A config setting NONLOCAL.LOCATION builds trunk nonlocal blocks
    (previously silently ignored)."""
    from egot2x.core.config import Config
    from egot2x.tasks.pnr import StateChangeClassification

    cfg = Config({
        "batch_size": 2, "sampling_fps": 1, "clip_len_sec": 2,
        "crop_size": 65,
        "NONLOCAL": {"LOCATION": [[[]], [[]], [[1]], [[]]],
                     "GROUP": [[1], [1], [1], [1]],
                     "POOL": [[1, 2, 2]] * 4,
                     "INSTANTIATION": "dot_product"},
    })
    task = StateChangeClassification(cfg)
    x = jnp.zeros((1, 2, 65, 65, 3), jnp.float32)
    shapes = jax.eval_shape(task.model.init, jax.random.key(0), x)
    assert "nonlocal1" in shapes["params"]["trunk"]["s4"]
    # and the default (empty LOCATION) stays nonlocal-free
    task0 = StateChangeClassification(Config({
        "batch_size": 2, "sampling_fps": 1, "clip_len_sec": 2,
        "crop_size": 65}))
    shapes0 = jax.eval_shape(task0.model.init, jax.random.key(0), x)
    assert "nonlocal1" not in shapes0["params"]["trunk"]["s4"]
