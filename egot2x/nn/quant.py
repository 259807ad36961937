"""int8 post-training-quantization inference path for conv trunks.

TPU v5e executes int8 MXU contractions at ~2x the bf16 rate (394 TOPS
vs 197 TFLOP/s); measured on this chip the dominant resnet18 conv
shapes run 1.36-1.62x faster in int8 (tools/exp_int8.py). Dynamic
per-tensor requantization is a net LOSS (the extra max-reduction pass
outweighs the conv savings — tools/exp_int8_e2e.py), so this module
uses the standard static PTQ recipe:

  * weights: symmetric per-output-channel int8, rounded on the fly from
    the f32 checkpoint params (so checkpoint import paths are
    unchanged);
  * activations: symmetric per-tensor int8 with a STATIC scale captured
    by a calibration pass (``calibrate=True`` runs the float conv and
    records running max-abs into the ``quant`` variables collection);
  * accumulation in int32 (``preferred_element_type``), dequantized
    into the compute dtype where XLA fuses the following BN/relu.

No analogue exists in the reference (pure fp32 torch); this is a
TPU-native deployment feature. The float path stays the default —
``quant`` is opt-in per model.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class QuantConv(nn.Module):
    """Drop-in 2-D conv with an int8 static-PTQ inference mode.

    The parameter layout matches ``nn.Conv`` (one ``kernel`` under this
    module's scope, HWIO), so torch-import rules and float checkpoints
    apply unchanged. The activation scale lives in the ``quant``
    collection as ``act_max``.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, calibrate: bool = False,
                 in_scale: Optional[jax.Array] = None) -> jax.Array:
        """``in_scale``: when ``x`` is ALREADY int8 (quantized upstream —
        e.g. before a maxpool so the pool runs on half the HBM traffic),
        pass its symmetric scale and the conv consumes it directly,
        skipping the quantize pass. Calibration always runs the float
        path, so ``act_max`` still captures this conv's activation range
        (for a pre-pool quantizer that range is identical: max-pooling
        preserves the global max)."""
        kh, kw = self.kernel_size
        pre_quantized = x.dtype == jnp.int8
        in_features = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, in_features, self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        act_max = self.variable("quant", "act_max",
                                lambda: jnp.zeros((), jnp.float32))
        pad = self.padding
        if isinstance(pad, str):
            padding = pad
        else:
            padding = [tuple(p) for p in pad]
        dn = ("NHWC", "HWIO", "NHWC")

        if calibrate or self.is_initializing():
            # float forward (init never runs the int8 path: integer
            # convs are pathologically slow on the CPU backend used for
            # parameter initialization) + record running max-abs
            assert not pre_quantized, \
                "calibration must run the float path end to end"
            if not self.is_initializing():
                act_max.value = jnp.maximum(
                    act_max.value, jnp.max(jnp.abs(x)).astype(jnp.float32))
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                self.strides, padding, dimension_numbers=dn)
        else:
            if pre_quantized:
                s_act = in_scale
                xq = x
            else:
                s_act = jnp.maximum(act_max.value, 1e-6) / 127.0
                xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_act),
                              -127, 127).astype(jnp.int8)
            w_max = jnp.maximum(
                jnp.max(jnp.abs(kernel), axis=(0, 1, 2)), 1e-12)
            s_w = w_max / 127.0
            wq = jnp.round(kernel / s_w).astype(jnp.int8)
            acc = jax.lax.conv_general_dilated(
                xq, wq, self.strides, padding, dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            y = (acc.astype(jnp.float32) * (s_act * s_w)).astype(self.dtype)
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


class QuantConv3D(nn.Module):
    """Drop-in 3-D conv (NTHWC/THWIO) with the int8 static-PTQ inference
    mode of :class:`QuantConv`. Parameter layout matches the float convs
    in ``nn.resnet3d`` (one ``kernel`` under this module's scope), so
    torch-import rules and float checkpoints apply unchanged. The HOI
    trunks (ResNet3D / SlowFast) are the heaviest FLOPs/clip in the
    framework, and their bottleneck convs carry the same 64-2048 channel
    depths that measured 1.4-1.6x faster in int8 on the 2-D trunks."""

    features: int
    kernel_size: Tuple[int, int, int]
    strides: Tuple[int, int, int] = (1, 1, 1)
    padding: Any = "SAME"
    kernel_dilation: Any = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, calibrate: bool = False) -> jax.Array:
        kt, kh, kw = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kt, kh, kw, x.shape[-1], self.features),
                            jnp.float32)
        act_max = self.variable("quant", "act_max",
                                lambda: jnp.zeros((), jnp.float32))
        pad = self.padding
        padding = pad if isinstance(pad, str) else [tuple(p) for p in pad]
        dn = ("NTHWC", "THWIO", "NTHWC")
        dil = self.kernel_dilation
        if calibrate or self.is_initializing():
            if not self.is_initializing():
                act_max.value = jnp.maximum(
                    act_max.value, jnp.max(jnp.abs(x)).astype(jnp.float32))
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                self.strides, padding, rhs_dilation=dil,
                dimension_numbers=dn)
        s_act = jnp.maximum(act_max.value, 1e-6) / 127.0
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_act),
                      -127, 127).astype(jnp.int8)
        w_max = jnp.maximum(jnp.max(jnp.abs(kernel), axis=(0, 1, 2, 3)),
                            1e-12)
        s_w = w_max / 127.0
        wq = jnp.round(kernel / s_w).astype(jnp.int8)
        acc = jax.lax.conv_general_dilated(
            xq, wq, self.strides, padding, rhs_dilation=dil,
            dimension_numbers=dn, preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * (s_act * s_w)).astype(self.dtype)


def quantize_static(x: jax.Array, act_max: jax.Array):
    """Symmetric per-tensor int8 quantize with a calibrated max-abs.
    Returns (int8 tensor, scale) — pair with ``QuantConv(..., in_scale=)``."""
    s = jnp.maximum(act_max, 1e-6) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s),
                  -127, 127).astype(jnp.int8)
    return xq, s


def max_pool_int8(x: jax.Array, window, strides, padding):
    """2-D max pool on int8 (flax ``nn.max_pool`` uses a float -inf
    initial value). Quantizing BEFORE the pool is exact — max commutes
    with the monotonic quantizer — and halves the pool's HBM traffic."""
    pads = [(0, 0)] + [tuple(p) for p in padding] + [(0, 0)]
    return jax.lax.reduce_window(
        x, jnp.int8(-128), jax.lax.max, (1,) + tuple(window) + (1,),
        (1,) + tuple(strides) + (1,), pads)


def assert_calibrated(variables) -> None:
    """Fail loudly when a quant model would run with uncalibrated
    activation scales (act_max == 0 ⇒ s_act ≈ 7.9e-9 and every
    activation clips to ±127 — numerically meaningless outputs with no
    error). Call after loading variables for any ``quant=True`` model
    and before inference; ``calibrate_variables`` populates the scales.
    """
    import jax

    quant = variables.get("quant") if isinstance(variables, dict) else None
    if not quant:
        return
    bad = [float(s) for s in jax.tree_util.tree_leaves(quant)
           if float(s) <= 0.0]
    if bad:
        raise ValueError(
            f"{len(bad)} QuantConv activation scale(s) are uncalibrated "
            "(act_max == 0); run egot2x.nn.quant.calibrate_variables on "
            "a representative batch before int8 inference")


def calibrate_variables(model, variables, *args, n_passes: int = 1,
                        **kwargs) -> dict:
    """Run calibration forward passes and return variables with the
    captured ``quant`` activation scales merged in.

    ``args``/``kwargs`` are the model's apply arguments; pass different
    batches via multiple calls or a representative batch once. Must be
    called OUTSIDE jit when args vary per pass.
    """
    import jax

    @jax.jit
    def _cal(vs, *xs):
        return model.apply(vs, *xs, calibrate=True, mutable=["quant"],
                           **kwargs)

    out = dict(variables)
    for _ in range(max(n_passes, 1)):
        _, mutated = _cal(out, *args)
        out = {**out, "quant": mutated["quant"]}
    return out
