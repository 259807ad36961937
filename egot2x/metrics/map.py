"""AVA-style mean average precision for LAM/TTM validation.

Behavioral reference: HHI/utils/lam/metrics.py:29-266 (and the
byte-similar HHI/utils/ttm/metrics.py). The reference round-trips
per-rank CSVs through pandas and a shell ``cat`` merge
(HHI/utils/lam/utils.py:61-84); here the same math runs in-memory on
numpy arrays gathered from all hosts — CSV export remains available
only for challenge submission files.

Semantics preserved exactly:
  * rows deduplicated by uid = video:frame:track,
  * predictions sorted by score descending,
  * two APs: class-1 on (label, score) and class-0 on
    (1-label, 1-score); mAP = mean,
  * VOC AP: append sentinels, make precision monotonically
    non-increasing, sum step areas,
  * top-1 accuracy at threshold 0.5.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def compute_average_precision(precision: np.ndarray, recall: np.ndarray) -> float:
    """VOCdevkit AP (reference metrics.py:29-74)."""
    if precision.size == 0:
        return 0.0
    recall = np.concatenate([[0.0], recall, [1.0]])
    precision = np.concatenate([[0.0], precision, [0.0]])
    # monotone non-increasing precision envelope
    precision = np.maximum.accumulate(precision[::-1])[::-1]
    idx = np.where(recall[1:] != recall[:-1])[0] + 1
    return float(np.sum((recall[idx] - recall[idx - 1]) * precision[idx]))


def _precision_recall(labels_sorted: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Precision/recall walking the score-sorted rows (metrics.py:157-181)."""
    all_pos = labels_sorted.sum()
    tp = np.cumsum(labels_sorted)
    ranks = np.arange(1, len(labels_sorted) + 1)
    precision = tp / ranks
    recall = tp / max(all_pos, 1)
    return precision, recall


def _dedup_by_uid(uids: Sequence[str], labels: np.ndarray, scores: np.ndarray):
    seen = {}
    order = []
    for i, u in enumerate(uids):
        if u not in seen:
            seen[u] = i
            order.append(i)
    order = np.asarray(order, dtype=np.int64)
    return labels[order], scores[order]


def run_evaluation(
    uids: Sequence[str],
    labels: np.ndarray,
    scores: np.ndarray,
    threshold: float = 0.5,
) -> Tuple[float, float]:
    """In-memory equivalent of the reference's run_evaluation.

    uids: unique row ids (video:frame:track); labels: {0,1} ground truth;
    scores: predicted P(class==1). Returns (mAP, top-1 accuracy).
    """
    labels = np.asarray(labels, dtype=np.int64)
    scores = np.asarray(scores, dtype=np.float64)
    labels, scores = _dedup_by_uid(uids, labels, scores)

    aps = []
    for cls in (0, 1):
        if cls == 0:
            l, s = 1 - labels, 1.0 - scores
        else:
            l, s = labels, scores
        # stable sort by score descending (pandas sort_values is stable)
        order = np.argsort(-s, kind="stable")
        precision, recall = _precision_recall(l[order])
        aps.append(compute_average_precision(precision, recall))
    m_ap = float(np.mean(aps))

    pred_pos = scores >= threshold
    acc = float(np.mean(pred_pos == (labels == 1))) if len(labels) else 0.0
    return m_ap, acc


def export_predictions_csv(
    path: str,
    rows: List[Tuple],
) -> None:
    """Write reference-format prediction CSV (for challenge submission)."""
    with open(path, "w") as f:
        for row in rows:
            f.write(",".join(str(x) for x in row) + "\n")
