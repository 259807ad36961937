"""STA box metrics — IoU and box-level average precision.

Behavioral reference: HOI/evaluation/lta/sta_metrics.py (vestigial
Ego4D forecasting evaluators): detections match ground truth greedily
at an IoU threshold in score order; AP integrates the resulting PR
curve (VOC-style, same smoothing as egot2x.metrics.map).
"""

from __future__ import annotations

from typing import List

import numpy as np

from egot2x.metrics.map import compute_average_precision


def box_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """IoU matrix for boxes (N, 4) x (M, 4), xyxy."""
    area_a = np.maximum(a[:, 2] - a[:, 0], 0) * np.maximum(a[:, 3] - a[:, 1], 0)
    area_b = np.maximum(b[:, 2] - b[:, 0], 0) * np.maximum(b[:, 3] - b[:, 1], 0)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / np.maximum(union, 1e-9)


def box_ap(
    pred_boxes: List[np.ndarray],  # per-image (P_i, 4)
    pred_scores: List[np.ndarray],  # per-image (P_i,)
    gt_boxes: List[np.ndarray],  # per-image (G_i, 4)
    iou_thresh: float = 0.5,
) -> float:
    """Box AP@iou over a set of images (greedy matching in score order)."""
    rows = []  # (score, is_tp)
    total_gt = sum(len(g) for g in gt_boxes)
    for preds, scores, gts in zip(pred_boxes, pred_scores, gt_boxes):
        order = np.argsort(-scores, kind="stable")
        matched = np.zeros(len(gts), dtype=bool)
        for i in order:
            if len(gts) == 0:
                rows.append((scores[i], 0))
                continue
            ious = box_iou(preds[i:i + 1], gts)[0]
            j = int(np.argmax(ious))
            if ious[j] >= iou_thresh and not matched[j]:
                matched[j] = True
                rows.append((scores[i], 1))
            else:
                rows.append((scores[i], 0))
    if not rows or total_gt == 0:
        return 0.0
    rows.sort(key=lambda r: -r[0])
    tp = np.cumsum([r[1] for r in rows])
    precision = tp / np.arange(1, len(rows) + 1)
    recall = tp / total_gt
    return compute_average_precision(precision, recall)
