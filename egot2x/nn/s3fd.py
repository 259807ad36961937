"""S3FD face detector (data-preparation tool).

Behavioral reference: HHI/models/asd/faceDetector/s3fd/{nets,box_utils}.py
— a vendored single-shot face detector the reference uses only for
dataset preparation (never in EgoT2 training, SURVEY.md §2.2). Provided
for surface completeness: VGG16 trunk with dilated fc6/fc7, L2Norm'd
conv3_3/4_3/5_3 sources + two extra strided stages, per-source loc/conf
heads (first conf head is 4-channel with the max-out background trick),
anchor (prior-box) generation, box decoding, and NMS — box utilities in
numpy for the host-side data-prep path.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

# (convs per block, channels); maxpool between blocks
VGG_BLOCKS = [(2, 64), (2, 128), (3, 256), (3, 512), (3, 512)]


class L2Norm(nn.Module):
    """Channel-wise L2 normalization with learned scale (nets.py:14-31)."""

    init_scale: float = 10.0

    @nn.compact
    def __call__(self, x):
        gamma = self.param("weight", nn.initializers.constant(self.init_scale),
                           (x.shape[-1],), jnp.float32)
        norm = jnp.sqrt(jnp.sum(x ** 2, axis=-1, keepdims=True)) + 1e-10
        return gamma * x / norm


class S3FDNet(nn.Module):
    """Returns per-source (loc (B,H,W,4), conf (B,H,W,2)) predictions."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array):
        conv = lambda c, name, **kw: nn.Conv(c, (3, 3), padding=[(1, 1), (1, 1)],
                                             dtype=self.dtype, name=name, **kw)
        sources = []
        bi = 0
        for block, (n_convs, ch) in enumerate(VGG_BLOCKS):
            for i in range(n_convs):
                x = nn.relu(conv(ch, f"vgg{bi}")(x))
                bi += 1
            if block == 2:
                sources.append(L2Norm(10.0, name="l2norm3_3")(x))
            elif block == 3:
                sources.append(L2Norm(8.0, name="l2norm4_3")(x))
            elif block == 4:
                sources.append(L2Norm(5.0, name="l2norm5_3")(x))
            # pool after every block (reference vgg has 5 maxpools;
            # sources are taken before their block's pool)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        # fc6 (dilated) + fc7
        x = nn.relu(nn.Conv(1024, (3, 3), padding=[(6, 6), (6, 6)],
                            kernel_dilation=(6, 6), dtype=self.dtype,
                            name="fc6")(x))
        x = nn.relu(nn.Conv(1024, (1, 1), dtype=self.dtype, name="fc7")(x))
        sources.append(x)
        # extras: two strided stages
        x = nn.relu(nn.Conv(256, (1, 1), dtype=self.dtype, name="extra0")(x))
        x = nn.relu(nn.Conv(512, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                            dtype=self.dtype, name="extra1")(x))
        sources.append(x)
        x = nn.relu(nn.Conv(128, (1, 1), dtype=self.dtype, name="extra2")(x))
        x = nn.relu(nn.Conv(256, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                            dtype=self.dtype, name="extra3")(x))
        sources.append(x)

        outputs = []
        for i, s in enumerate(sources):
            loc = conv(4, f"loc{i}")(s)
            n_conf = 4 if i == 0 else 2  # max-out background on source 0
            conf = conv(n_conf, f"conf{i}")(s)
            if i == 0:
                # max-out: bg score = max of first 3 channels (nets.py:150-156)
                bg = jnp.max(conf[..., :3], axis=-1, keepdims=True)
                conf = jnp.concatenate([bg, conf[..., 3:]], axis=-1)
            outputs.append((loc, jax.nn.softmax(conf, axis=-1)))
        return outputs


# ---- host-side box utilities (numpy; box_utils.py) ----------------------

def prior_boxes(input_size: Tuple[int, int],
                feature_maps: List[Tuple[int, int]],
                steps=(4, 8, 16, 32, 64, 128),
                min_sizes=(16, 32, 64, 128, 256, 512)) -> np.ndarray:
    """(N, 4) cx, cy, w, h priors normalized to [0, 1] (box_utils.py:182-215)."""
    h, w = input_size
    priors = []
    for k, (fh, fw) in enumerate(feature_maps):
        for i in range(fh):
            for j in range(fw):
                cx = (j + 0.5) * steps[k] / w
                cy = (i + 0.5) * steps[k] / h
                priors.append([cx, cy, min_sizes[k] / w, min_sizes[k] / h])
    return np.asarray(priors, dtype=np.float32)


def decode(loc: np.ndarray, priors: np.ndarray,
           variances=(0.1, 0.2)) -> np.ndarray:
    """SSD box decoding → xyxy (box_utils.py:47-66)."""
    boxes = np.concatenate([
        priors[:, :2] + loc[:, :2] * variances[0] * priors[:, 2:],
        priors[:, 2:] * np.exp(loc[:, 2:] * variances[1]),
    ], axis=1)
    boxes[:, :2] -= boxes[:, 2:] / 2
    boxes[:, 2:] += boxes[:, :2]
    return boxes


def nms(boxes: np.ndarray, scores: np.ndarray, overlap: float = 0.3,
        top_k: int = 200) -> np.ndarray:
    """Greedy NMS returning kept indices (box_utils.py:13-44)."""
    if len(boxes) == 0:
        return np.asarray([], dtype=np.int64)
    order = np.argsort(-scores)[:top_k]
    keep = []
    while len(order):
        i = order[0]
        keep.append(i)
        if len(order) == 1:
            break
        rest = order[1:]
        xx1 = np.maximum(boxes[i, 0], boxes[rest, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[rest, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[rest, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        area_r = (boxes[rest, 2] - boxes[rest, 0]) * (boxes[rest, 3] - boxes[rest, 1])
        iou = inter / np.maximum(area_i + area_r - inter, 1e-9)
        order = rest[iou <= overlap]
    return np.asarray(keep, dtype=np.int64)


def detect_faces(net_outputs, input_size, conf_thresh: float = 0.8,
                 nms_overlap: float = 0.3) -> np.ndarray:
    """Full detection postprocess for one image: decode every source's
    anchors, threshold, NMS. Returns (N, 5) xyxy+score in pixels."""
    feature_maps = [tuple(o[0].shape[1:3]) for o in net_outputs]
    priors = prior_boxes(input_size, feature_maps)
    locs = np.concatenate([np.asarray(o[0][0]).reshape(-1, 4) for o in net_outputs])
    confs = np.concatenate([np.asarray(o[1][0]).reshape(-1, 2) for o in net_outputs])
    boxes = decode(locs, priors)
    scores = confs[:, 1]
    mask = scores >= conf_thresh
    boxes, scores = boxes[mask], scores[mask]
    keep = nms(boxes, scores, nms_overlap)
    h, w = input_size
    out = np.concatenate([
        boxes[keep] * np.asarray([w, h, w, h]), scores[keep, None]], axis=1)
    return out
