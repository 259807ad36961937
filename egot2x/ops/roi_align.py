"""RoIAlign in pure JAX.

The reference's STA head uses detectron2/torchvision ``ROIAlign``
(HOI/models/lta/sta_models.py:18-130, flagged [native-dep: roi_align]
in SURVEY.md §2.5). TPU-native version: bilinear grid sampling expressed
as gathers + weighted sums, fully static shapes, vmappable over boxes.

Semantics follow aligned=True (half-pixel shift) with
``sampling_ratio=1`` (one sample per output bin center).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear_sample(feat: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """feat (H, W, C); ys/xs (R, R) continuous coords → (R, R, C)."""
    h, w, c = feat.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = ys - y0
    wx = xs - x0
    y0 = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    g = lambda yy, xx: feat[yy, xx]  # advanced indexing gathers (R, R, C)
    v = (g(y0, x0) * ((1 - wy) * (1 - wx))[..., None]
         + g(y0, x1) * ((1 - wy) * wx)[..., None]
         + g(y1, x0) * (wy * (1 - wx))[..., None]
         + g(y1, x1) * (wy * wx)[..., None])
    return v


def roi_align(
    features: jax.Array,  # (B, H, W, C)
    boxes: jax.Array,  # (N, 5): batch_idx, x1, y1, x2, y2 (feature coords)
    resolution: int = 7,
    spatial_scale: float = 1.0,
    aligned: bool = True,
) -> jax.Array:
    """Returns (N, resolution, resolution, C)."""
    offset = 0.5 if aligned else 0.0

    def one_box(box):
        b = box[0].astype(jnp.int32)
        x1, y1, x2, y2 = box[1] * spatial_scale - offset, box[2] * spatial_scale - offset, \
            box[3] * spatial_scale - offset, box[4] * spatial_scale - offset
        bw = jnp.maximum(x2 - x1, 1e-3)
        bh = jnp.maximum(y2 - y1, 1e-3)
        # one sample at each output bin center
        idx = (jnp.arange(resolution) + 0.5) / resolution
        ys = y1 + bh * idx
        xs = x1 + bw * idx
        ys2, xs2 = jnp.meshgrid(ys, xs, indexing="ij")
        return _bilinear_sample(features[b], ys2, xs2)

    return jax.vmap(one_box)(boxes)
