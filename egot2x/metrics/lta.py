"""AR/LTA metrics.

Behavioral reference: HOI/evaluation/lta/lta_metrics.py — ``topks_correct``
/ ``topk_errors`` (:38-85), ``edit_distance`` (:87-99: per-sample minimum
over K sampled sequences of Levenshtein distance / Z — the reference
calls the ``editdistance`` package, which is plain Levenshtein despite
its Damerau docstring), ``AUED`` (:106-118: trapezoid over ED@1..Z).

Cross-process reduction: the reference all-gathers via gloo pickles; here
callers aggregate host-side per process and combine (single-controller
JAX sees the global batch anyway).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


def topks_correct(preds: np.ndarray, labels: np.ndarray,
                  ks: Sequence[int]) -> List[float]:
    maxk = max(ks)
    top_inds = np.argsort(-preds, axis=1)[:, :maxk]  # (N, maxk)
    correct = top_inds == labels[:, None]
    return [float(correct[:, :k].sum()) for k in ks]


def topk_errors(preds: np.ndarray, labels: np.ndarray,
                ks: Sequence[int]) -> List[float]:
    n = len(preds)
    return [(1.0 - c / n) * 100.0 for c in topks_correct(preds, labels, ks)]


def topk_accuracies(preds: np.ndarray, labels: np.ndarray,
                    ks: Sequence[int]) -> List[float]:
    n = len(preds)
    return [c / n * 100.0 for c in topks_correct(preds, labels, ks)]


def levenshtein(a: np.ndarray, b: np.ndarray) -> int:
    """Plain Levenshtein distance between two int sequences."""
    la, lb = len(a), len(b)
    dp = np.arange(lb + 1)
    for i in range(1, la + 1):
        prev = dp.copy()
        dp[0] = i
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            dp[j] = min(prev[j] + 1, dp[j - 1] + 1, prev[j - 1] + cost)
    return int(dp[lb])


def edit_distance(preds: np.ndarray, labels: np.ndarray) -> float:
    """preds (N, Z, K), labels (N, Z): mean over N of the minimum over K
    of Levenshtein(pred_k, label)/Z."""
    n, z, k = preds.shape
    dists = []
    for i in range(n):
        dists.append(min(
            levenshtein(preds[i, :, j], labels[i]) / z for j in range(k)
        ))
    return float(np.mean(dists))


def aued(preds: np.ndarray, labels: np.ndarray) -> Dict[str, float]:
    """Area under the ED@z curve (reference AUED, :106-118)."""
    n, z_total, k = preds.shape
    ed = np.asarray([
        edit_distance(preds[:, :z], labels[:, :z]) for z in range(1, z_total + 1)
    ])
    out = {"AUED": float(np.trapezoid(ed) / max(z_total - 1, 1))}
    out.update({f"ED_{z}": float(ed[z]) for z in range(z_total)})
    return out
