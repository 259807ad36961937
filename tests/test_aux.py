"""Auxiliary subsystems: profiling, precise BN, 2-task transfer models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egot2x.train.precise_bn import (
    aggregate_sub_batch_stats,
    compute_precise_bn_stats,
)
from egot2x.utils.profiling import (
    flop_estimate,
    grad_histograms,
    log_model_info,
    params_count,
)


def test_params_count_and_flops():
    from egot2x.nn.resnet2d import resnet18

    model = resnet18(num_classes=8)
    x = jnp.zeros((1, 32, 32, 3))
    v = model.init(jax.random.key(0), x)
    n = params_count(v["params"])
    assert n > 11_000_000  # resnet18 + fc heads
    info = log_model_info("resnet18", v["params"],
                          lambda a: model.apply(v, a), x)
    assert info["params"] == n
    assert info["flops"] is None or info["flops"] > 0


def test_grad_histograms():
    g = {"a": jnp.ones((4, 4)), "b": {"c": jnp.arange(6.0)}}
    h = grad_histograms(g, bins=5)
    assert len(h) == 2
    assert all("norm" in v for v in h.values())


def test_precise_bn_recovers_true_stats(rng):
    from flax import linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                name="bn")(x)

    m = M()
    data = rng.standard_normal((16, 10, 4)).astype(np.float32) * 2.0 + 1.5
    v = dict(m.init(jax.random.key(0), jnp.asarray(data[0])))
    stats = compute_precise_bn_stats(
        m.apply, v, [(jnp.asarray(d),) for d in data], num_batches=16)
    true_mean = data.reshape(-1, 4).mean(axis=0)
    got = np.asarray(stats["bn"]["mean"])
    np.testing.assert_allclose(got, true_mean, atol=0.2)


def test_aggregate_sub_batch_stats():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1000, 8))
    splits = x.reshape(4, 250, 8)
    means = splits.mean(axis=1)
    vars_ = splits.var(axis=1)
    mean, var = aggregate_sub_batch_stats(means, vars_)
    np.testing.assert_allclose(mean, x.mean(axis=0), atol=1e-9)
    np.testing.assert_allclose(var, x.var(axis=0), atol=1e-9)


def test_two_task_transfer_models(rng):
    from egot2x.core.registry import build_model
    import egot2x.translate.egot2s_hoi  # noqa

    frames = jnp.asarray(rng.uniform(0, 255, (1, 16, 65, 65, 3)),
                         dtype=jnp.float32)
    for name, shape in [("FinetuneState", (1, 2)), ("FinetuneKeyframe", (1, 16)),
                        ("TaskFusionMFTransformer2TaskPnr", (1, 16)),
                        ("TaskFusionLFLinearPnr", (1, 16))]:
        m = build_model(name, crop_size=65, alpha=4)
        v = m.init(jax.random.key(0), frames, train=False)
        out = m.apply(v, frames, train=False)
        assert out.shape == shape, name
