"""Exact multi-host validation metrics: merging per-process contexts
and computing ONCE globally must equal the single-process result —
mirroring the reference's raw-prediction gathers
(HHI/utils/lam/utils.py:61-80 CSV merge,
HOI/evaluation/lta/lta_metrics.py:23-84 all_gather) instead of
per-rank metric averaging (VERDICT r2 weak #4).
"""

import pickle

import numpy as np

from egot2x.tasks.base import Task, merge_contexts


def _split_batches(n_proc, items):
    """Strided process sharding, like BatchLoader's process striding."""
    return [items[p::n_proc] for p in range(n_proc)]


def test_merge_contexts_generic():
    a = {"correct": 3, "total": 10, "loss": [0.5, 0.25], "seen": {"x"},
         "by_key": {"k": [1, 2]}}
    b = {"correct": 2, "total": 6, "loss": [1.0], "seen": {"x", "y"},
         "by_key": {"k": [3], "j": [4]}}
    m = merge_contexts([a, b])
    assert m["correct"] == 5 and m["total"] == 16
    assert m["loss"] == [0.5, 0.25, 1.0]
    assert m["seen"] == {"x", "y"}
    assert m["by_key"] == {"k": [1, 2, 3], "j": [4]}
    # arrays concatenate; 0-d arrays sum
    m2 = merge_contexts([{"s": np.ones((2, 3))}, {"s": np.zeros((1, 3))}])
    assert m2["s"].shape == (3, 3)


def test_lam_map_global_equals_single_process(rng):
    """LAM mAP over split contexts == mAP over the full context."""
    from egot2x.tasks.lam import LookingAtMe

    task = object.__new__(LookingAtMe)  # metric methods don't touch cfg
    n = 64
    scores = rng.uniform(0, 1, n)
    labels = (rng.uniform(0, 1, n) > 0.5).astype(int)
    uids = [f"u{i}" for i in range(n)]

    def run(ctxs_parts):
        ctx = task.merge_validation(ctxs_parts)
        return task.finalize_validation(ctx)

    def fill(idx):
        c = task.start_validation()
        c["uids"].extend(uids[i] for i in idx)
        c["labels"].extend(int(labels[i]) for i in idx)
        c["scores"].extend(float(scores[i]) for i in idx)
        return c

    single = run([fill(range(n))])
    parts = _split_batches(4, list(range(n)))
    multi = run([fill(p) for p in parts])
    assert single == multi
    # contexts must survive the pickle transport of all_gather_objects
    assert pickle.loads(pickle.dumps(fill(range(4)))) is not None


def test_ar_clip_ensembling_across_processes(rng):
    """Clips of one uid landing on DIFFERENT processes must still sum
    their logits before top-k (reference multi-view ensembling)."""
    from egot2x.tasks.ar import MultiTaskClassificationTask

    task = object.__new__(MultiTaskClassificationTask)
    n_uid, n_cls = 10, 7
    clips = []  # (uid, verb_logits, noun_logits, verb, noun)
    for u in range(n_uid):
        for _ in range(3):  # 3 views per uid
            clips.append((f"c{u}", rng.standard_normal(n_cls),
                          rng.standard_normal(n_cls), u % n_cls,
                          (u + 1) % n_cls))

    def fill(rows):
        c = task.start_validation()
        for uid, vl, nl, v, nn in rows:
            c["verb"][uid] = c["verb"][uid] + vl
            c["noun"][uid] = c["noun"][uid] + nl
            c["verb_label"][uid] = v
            c["noun_label"][uid] = nn
        return c

    single = task.finalize_validation(task.merge_validation([fill(clips)]))
    parts = _split_batches(3, clips)  # striding splits each uid's views
    multi = task.finalize_validation(
        task.merge_validation([fill(p) for p in parts]))
    assert single == multi
    # the merged ctx must pickle (multi-host transport)
    assert pickle.loads(pickle.dumps(fill(clips[:5]))) is not None


def test_ttm_segment_merge_across_processes(rng):
    """Segment chunks split across processes: logit lists concatenate,
    spans take the envelope; mAP computed once globally."""
    from egot2x.tasks.ttm import TalkingToMe

    task = object.__new__(TalkingToMe)
    segs = []
    for s in range(12):
        for k in range(2):  # two chunks per segment
            segs.append((f"s{s}", rng.standard_normal(2), s % 2,
                         10 * k, 10 * k + 9))

    def fill(rows):
        c = task.start_validation()
        for seg, logits, label, start, end in rows:
            c["logits"][seg].append(logits)
            c["label"][seg] = label
            lo, hi = c["span"].get(seg, (start, end))
            c["span"][seg] = (min(lo, start), max(hi, end))
        return c

    single = task.finalize_validation(task.merge_validation([fill(segs)]))
    parts = _split_batches(2, segs)
    multi = task.finalize_validation(
        task.merge_validation([fill(p) for p in parts]))
    assert single == multi
    merged = task.merge_validation([fill(p) for p in parts])
    assert all(len(v) == 2 for v in merged["logits"].values())
    assert all(v == (0, 19) for v in merged["span"].values())


def test_hhi_multitask_map_across_processes(rng):
    """The HHI multitask map rows carry NO uids (assigned positionally
    at finalize): rows from every process must survive the merge —
    per-process synthetic uids would collide and be dedup-dropped."""
    from egot2x.tasks.multitask_hhi import Unified3TaskTranslation

    task = object.__new__(Unified3TaskTranslation)
    n = 48
    rows = {t: [((i + hash(t)) % 2, float(rng.uniform(0, 1)))
                for i in range(n)] for t in ("lam", "ttm")}

    def fill(idx):
        c = task.start_validation()
        for t in ("lam", "ttm"):
            c["map"][t].extend(rows[t][i] for i in idx)
            c["correct"][t] += len(idx)
            c["total"][t] += 2 * len(idx)
        c["correct"]["asd"] += len(idx)
        c["total"]["asd"] += 2 * len(idx)
        c["loss"].extend([0.5] * len(idx))
        return c

    single = task.finalize_validation(task.merge_validation(
        [fill(range(n))]))
    parts = _split_batches(4, list(range(n)))
    multi = task.finalize_validation(
        task.merge_validation([fill(p) for p in parts]))
    # every process's rows contribute: the mAP over the union of rows
    # (order differs, but mAP is order-invariant given distinct uids)
    assert single == multi
    assert multi["val_lam_acc"] == 0.5


def test_default_task_merge_is_identity_single_process():
    t = object.__new__(Task)
    ctx = {"x": 1}
    assert t.merge_validation([ctx]) == ctx
