"""Fused RGB stem for trunk pairs that consume the SAME frames.

The flagship EgoT2-s translators run two architecturally identical
resnet18 trunks (LAM + TTM-video) over one RGB stream
(HHI/models/ttm/model_taskspecific.py:198-245 — the reference runs them
as two separate torch modules). Under the int8 inference path the stem
epilogue writes an int8 56x56x64 map per trunk, and TPU int8 tiles are
(32, 128) — a 64-channel int8 tensor is lane-padded to 128, so each map
is PHYSICALLY 2x its logical bytes. Concatenating the two stems into one
(7, 7, 3, 128) conv writes ONE full-lane-density map instead of two
half-dense ones, and the 3x3/2 int8 maxpool runs once at full density.

Measured (tools/exp_grouped_trunk.py, 1920 frames, v5e):

  | full dual trunk formulation            | ms    |
  |----------------------------------------|-------|
  | two separate trunks (shipped int8)     | 80.89 |
  | fused stem, separate stages (THIS)     | 78.59 |
  | grouped-conv stages (fg_count=2)       | 82.05 |
  | block-diag dense layer1 + grouped rest | 93.21 |

Grouped convs are NOT profitable on TPU — XLA keeps a (..., g, 64)
layout for the accumulator (half-density again) and schedules the
group pairs worse than two independent convs — so fusion stops at the
stem and the stages stay per-trunk. Numerics: the 128-wide conv sums
the same products in a different f32 accumulation order than two
64-wide convs, so post-quantize int8 values can flip by one quantum
near rounding boundaries (~11% of values at random init); the PTQ
accuracy gate (tests/test_quant_gate.py) bounds the task-level effect.

This is a deployment-path optimization: parameters stay in the two
trunks' layout (checkpoints, torch import, and training are unchanged);
the fusion reads both trunks' stem parameters at apply time and the
trunk bodies consume the pre-pooled int8 halves via ``stem_in``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from egot2x.nn.quant import max_pool_int8
from egot2x.nn.resnet2d import normalize_u8_frames

Dtype = Any


def stem_tree(params, batch_stats, quant):
    """Bundle one trunk's stem variables (as returned by
    ``Module.get_variable`` subtrees of the ResNet2D scope) into the
    dict :func:`fused_rgb_stem` consumes."""
    return {
        "kernel": params["conv1"]["kernel"],
        "bn_scale": params["bn1"]["scale"],
        "bn_bias": params["bn1"]["bias"],
        "bn_mean": batch_stats["bn1"]["mean"],
        "bn_var": batch_stats["bn1"]["var"],
        "act_max": quant["stem_act_max"],
    }


def fused_rgb_stem(frames: jax.Array, stems, dtype=jnp.bfloat16,
                   eps: float = 1e-5):
    """Run N identical-geometry 7x7/2 RGB stems as ONE conv.

    ``frames``: (B, H, W, 3) float (host-normalized) or integer (raw
    uint8 — normalized in-jit once, shared by every stem).
    ``stems``: sequence of dicts from :func:`stem_tree`.

    Returns ``[(int8 pooled map (B, H/4, W/4, width), scalar scale)]``
    per stem — exactly what ``ResNet2D(..., stem_in=...)`` consumes.
    The concat/fold arithmetic is on parameters only: free at trace
    time under deployment jit (weights are constants), one elementwise
    pass otherwise.
    """
    x = normalize_u8_frames(frames, dtype)
    kernel = jnp.concatenate([s["kernel"] for s in stems], axis=-1)
    # fold eval-mode BN into a per-channel affine on the conv output
    # (same math as flax BatchNorm with use_running_average=True)
    scale = jnp.concatenate(
        [s["bn_scale"] * jax.lax.rsqrt(s["bn_var"] + eps) for s in stems])
    shift = jnp.concatenate(
        [s["bn_bias"] - s["bn_mean"] * s["bn_scale"]
         * jax.lax.rsqrt(s["bn_var"] + eps) for s in stems])
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype), window_strides=(2, 2),
        padding=[(3, 3), (3, 3)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = jax.nn.relu(y * scale.astype(dtype) + shift.astype(dtype))
    # per-stem symmetric int8 scale, broadcast per channel so the fused
    # map quantizes in one pass; max-pool in int8 at full lane density
    # (quantize-before-pool is exact: max commutes with the monotonic
    # quantizer — nn/resnet2d.py stem notes)
    width = stems[0]["kernel"].shape[-1]
    s_each = [jnp.maximum(s["act_max"], 1e-6) / 127.0 for s in stems]
    s_vec = jnp.concatenate(
        [jnp.broadcast_to(s, (width,)) for s in s_each])
    yq = jnp.clip(jnp.round(y.astype(jnp.float32) / s_vec),
                  -127, 127).astype(jnp.int8)
    yq = max_pool_int8(yq, (3, 3), (2, 2), [(1, 1), (1, 1)])
    return [(jax.lax.slice_in_dim(yq, i * width, (i + 1) * width, axis=3),
             s_each[i]) for i in range(len(stems))]
