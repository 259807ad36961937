"""PNR/OSCC metrics.

Behavioral reference: HOI/evaluation/pnr/metrics.py —
``keyframe_distance`` (:36-80: |argmax·(end−start)/16 − gt| / fps, only
for state-change clips), ``keyframe_accuracy`` (:23-33),
``state_change_accuracy``.
"""

from __future__ import annotations

import numpy as np


def keyframe_distance(
    preds: np.ndarray,  # (B, 16) keyframe logits/scores
    state_labels: np.ndarray,  # (B,)
    fps: np.ndarray,  # (B,) effective fps
    clip_start: np.ndarray,
    clip_end: np.ndarray,
    pnr_frame: np.ndarray,
    num_frames: int = 16,
):
    """Per-clip localisation error in seconds; returns (sum, count)."""
    total, count = 0.0, 0
    for p, sc, f, s, e, pnr in zip(preds, state_labels, fps, clip_start,
                                   clip_end, pnr_frame):
        if int(sc) != 1:
            continue
        loc = int(np.argmax(p))
        mapped = (e - s) / num_frames * loc
        gt = pnr - s
        total += abs(mapped - gt) / f
        count += 1
    return total, count


def keyframe_accuracy(preds: np.ndarray, labels: np.ndarray,
                      state_labels: np.ndarray):
    """argmax match on state-change clips; returns (correct, total)."""
    correct, total = 0, 0
    for p, l, sc in zip(preds, labels, state_labels):
        if int(sc) != 1:
            continue
        total += 1
        if int(np.argmax(p)) == int(np.argmax(l)):
            correct += 1
    return correct, total


def state_change_accuracy(preds: np.ndarray, labels: np.ndarray):
    """(correct, total) for 2-class state-change logits (B, 2)."""
    pred_cls = np.argmax(preds, axis=-1)
    return int((pred_cls == labels).sum()), len(labels)
