"""Static-shape bucketed batching for variable-length segments.

The reference handles variable-length TTM/ASD segments with a
length-sorted dynamic batch sampler (frames budget ≈ batch_size/len,
HHI/dataset/ttm/sampler.py:28-53) plus min-length truncation collate
(HHI/utils/ttm/utils.py:214-221) — every batch has a different shape,
which on TPU would recompile the program per batch.

TPU-native replacement (SURVEY.md §2.8 "batch-shape strategies"):
segments are binned into a small fixed set of frame-count buckets and
**truncated down to the bucket base length**. This is semantically the
reference's own min-truncation applied at quantized lengths, so no
masking is needed anywhere downstream; XLA compiles one program per
bucket (≤6 programs total). The per-bucket batch size keeps the frames
budget roughly constant, mirroring the reference's compute-balanced
batches.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np

from egot2x.data.pipeline import default_collate

DEFAULT_BUCKETS = (15, 30, 60, 90, 120, 150)


class BucketedDataset:
    """Protocol: __len__, lengths (np.ndarray), get_item(idx, n_frames)."""

    def __len__(self) -> int:  # pragma: no cover - protocol
        raise NotImplementedError

    @property
    def lengths(self) -> np.ndarray:  # pragma: no cover - protocol
        raise NotImplementedError

    def get_item(self, idx: int, n_frames: int) -> Dict[str, Any]:  # pragma: no cover
        raise NotImplementedError


def assign_buckets(lengths: np.ndarray, buckets: Sequence[int]) -> np.ndarray:
    """Largest bucket base ≤ length; shorter-than-smallest → smallest
    (those items pad by repeating their last frame at load time)."""
    bases = np.asarray(sorted(buckets))
    idx = np.searchsorted(bases, lengths, side="right") - 1
    return np.clip(idx, 0, len(bases) - 1)


class BucketBatchLoader:
    """Yields static-shape batches grouped by length bucket.

    frames_budget plays the reference's ``batch_size`` role (≈400): the
    per-bucket batch size is max(1, frames_budget // base). Eval mode
    keeps every item (pads final partial batches, ``valid`` mask).
    """

    def __init__(
        self,
        dataset: BucketedDataset,
        frames_budget: int = 400,
        buckets: Sequence[int] = DEFAULT_BUCKETS,
        mode: str = "train",
        seed: int = 0,
        num_workers: int = 8,
        prefetch: int = 2,
        min_batch: int = 1,
        max_batch: Optional[int] = None,
        batch_divisor: int = 1,
        collate_fn: Callable = default_collate,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.dataset = dataset
        self.frames_budget = frames_budget
        self.bases = sorted(buckets)
        self.mode = mode
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.min_batch = min_batch
        self.max_batch = max_batch
        self.batch_divisor = batch_divisor  # e.g. mesh data-axis size
        self.collate_fn = collate_fn
        self.process_index = process_index
        self.process_count = process_count
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def batch_size_for(self, base: int) -> int:
        bs = max(self.min_batch, self.frames_budget // base)
        if self.max_batch:
            bs = min(bs, self.max_batch)
        d = self.batch_divisor
        if d > 1:
            bs = max(d, (bs // d) * d)  # round to a shardable multiple
        return bs

    def _plan(self) -> List[tuple]:
        """List of (base_len, indices array) batches for this epoch."""
        lengths = np.asarray(self.dataset.lengths)
        my = np.arange(len(lengths))[self.process_index :: self.process_count]
        bucket_of = assign_buckets(lengths[my], self.bases)
        rng = np.random.default_rng(self.seed + self.epoch)
        plan: List[tuple] = []
        for b, base in enumerate(self.bases):
            idx = my[bucket_of == b]
            if len(idx) == 0:
                continue
            if self.mode == "train":
                rng.shuffle(idx)
            bs = self.batch_size_for(base)
            n_full = len(idx) // bs
            for i in range(n_full):
                plan.append((base, idx[i * bs : (i + 1) * bs]))
            rem = idx[n_full * bs :]
            if len(rem) and self.mode != "train":
                plan.append((base, rem))
            elif n_full == 0 and len(rem) and self.mode == "train":
                # fewer items than one shardable batch (batch_divisor
                # rounds bs up to the mesh data-axis size): wrap-repeat
                # rather than silently dropping the bucket — real
                # datasets never hit this, tiny fixtures must still train
                plan.append((base, np.resize(rem, bs)))
        if self.mode == "train":
            rng.shuffle(plan)
        return plan

    def __len__(self) -> int:
        return len(self._plan())

    def _make_batch(self, pool: ThreadPoolExecutor, base: int, idx: np.ndarray):
        bs = self.batch_size_for(base)
        valid = np.ones(bs, dtype=bool)
        if len(idx) < bs:
            pad = bs - len(idx)
            valid[len(idx):] = False
            idx = np.concatenate([idx, np.repeat(idx[:1], pad)])
        items = list(pool.map(lambda i: self.dataset.get_item(int(i), base), idx))
        batch = self.collate_fn(items)
        if self.mode != "train":
            batch["valid"] = valid
        return batch

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        plan = self._plan()
        if not plan:
            return iter(())
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        pool = ThreadPoolExecutor(max_workers=self.num_workers)

        def producer():
            try:
                for base, idx in plan:
                    q.put(self._make_batch(pool, base, idx))
            except BaseException as e:  # noqa: BLE001
                q.put(e)
            finally:
                q.put(sentinel)

        threading.Thread(target=producer, daemon=True).start()

        def gen():
            try:
                while True:
                    item = q.get()
                    if item is sentinel:
                        break
                    if isinstance(item, BaseException):
                        raise item
                    yield item
            finally:
                pool.shutdown(wait=False)

        return gen()
