"""Round-3: localize the resnet18 int8 trunk's non-conv overhead.

docs/PROFILE.md has the trunk at ~104 ms (b128, folded weights) of
which conv1+pool is 33 and the measured int8 chain rates only account
for ~42 of the remaining 71 — this times cumulative PREFIXES of the
trunk inside one jit each, so fusion effects are included and
differences give true in-graph per-section costs.

Run: python tools/exp_trunk_prefix.py  (TPU, idle host)
"""


import numpy as np

B, T = 128, 30


from _exp_util import bench  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as fnn

    from egot2x.nn.resnet2d import ResNet2D

    dev = jax.devices()[0]
    cpu = jax.devices("cpu")[0]
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    class Prefix(fnn.Module):
        upto: int  # 0=stem, 1..4 = through layerN, 5 = full (+fc heads)
        quant: bool = True

        @fnn.compact
        def __call__(self, x, calibrate=False):
            from egot2x.nn.resnet2d import BasicBlock2D, _StemConv

            y = _StemConv(64, False, dtype=dt, name="conv1")(x)
            y = fnn.BatchNorm(use_running_average=True, momentum=0.9,
                              epsilon=1e-5, dtype=dt, name="bn1")(y)
            y = fnn.relu(y)
            y = fnn.max_pool(y, (3, 3), strides=(2, 2),
                             padding=[(1, 1), (1, 1)])
            if self.upto == 0:
                return y
            for stage, blocks in enumerate((2, 2, 2, 2)):
                if stage + 1 > self.upto:
                    return y
                filters = 64 * (2 ** stage)
                for b in range(blocks):
                    stride = 2 if stage > 0 and b == 0 else 1
                    y, _ = BasicBlock2D(filters, stride, quant=self.quant,
                                        dtype=dt,
                                        name=f"layer{stage + 1}_{b}")(
                        y, train=False, calibrate=calibrate)
            if self.upto < 5:
                return y
            y = jnp.mean(y, axis=(1, 2))
            y = fnn.Dense(1000, dtype=dt, name="fc")(y)
            return fnn.Dense(256, dtype=dt, name="fc2")(y)

    frames = jax.device_put(
        jnp.asarray(rng.standard_normal((B * T, 224, 224, 3)), jnp.float32),
        dev)

    # init once for the full model; prefixes reuse the same variables
    full = Prefix(upto=5)
    with jax.default_device(cpu):
        v = full.init(jax.random.key(0), jnp.zeros((2, 224, 224, 3)))
    v = jax.device_put(dict(v), dev)
    if "quant" in v:
        v["quant"] = jax.tree_util.tree_map(
            lambda x: jnp.full_like(x, 3.0), v["quant"])

    print("| trunk prefix (3840 frames, int8 stages) | ms |", flush=True)
    print("|---|---|")
    prev = 0.0
    for upto, nm in [(0, "stem (conv1+bn+relu+pool)"), (1, "+layer1"),
                     (2, "+layer2"), (3, "+layer3"), (4, "+layer4"),
                     (5, "+gap+fc+fc2 (full)")]:
        m = Prefix(upto=upto)
        t = bench(nm, lambda x, m=m: m.apply(v, x), (frames,))
        print(f"    (delta {1e3*(t - prev):6.2f} ms)", flush=True)
        prev = t

    # float-trunk reference point at the same batch
    vf_model = ResNet2D(num_classes=256, quant=False, dtype=dt)
    with jax.default_device(cpu):
        vf = vf_model.init(jax.random.key(0), jnp.zeros((2, 224, 224, 3)))
    vf = jax.device_put(dict(vf), dev)
    bench("bf16 full trunk (reference point)",
          lambda x: vf_model.apply(vf, x), (frames,))


if __name__ == "__main__":
    main()
