"""Host-side batching pipeline: map-style datasets → static-shape
numpy batches with background prefetch.

Replaces torch ``DataLoader`` + ``DistributedSampler``
(HHI/tasks/lam/video_task.py:55-85, HOI/dataset/lta/loader.py:61-126)
with a TPU-appropriate design:

  * every batch has a **static shape** (XLA compiles one program):
    train drops the last partial batch; eval pads it and carries a
    ``valid`` mask that downstream metric aggregation honors;
  * deterministic epoch-seeded shuffling (one seed, not per-worker RNG
    state);
  * a thread pool decodes items concurrently and a background thread
    keeps ``prefetch`` batches ready so host decode overlaps device
    compute (the north-star "pipelined" requirement);
  * under a multi-host setup each process takes a strided shard of the
    index (process_index/process_count), the deterministic analogue of
    ``DistributedSampler``.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, Iterator, Sequence

import numpy as np


class Dataset:
    """Map-style dataset protocol: __len__ + __getitem__ → dict[str, np.ndarray]."""

    def __len__(self) -> int:  # pragma: no cover - protocol
        raise NotImplementedError

    def __getitem__(self, idx: int) -> Dict[str, Any]:  # pragma: no cover
        raise NotImplementedError


def default_collate(items: Sequence[Dict[str, Any]]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        if isinstance(vals[0], np.ndarray) or np.isscalar(vals[0]):
            out[key] = np.stack([np.asarray(v) for v in vals])
        else:
            out[key] = list(vals)  # strings / python objects (ids)
    return out


class BatchLoader:
    """Static-shape batch iterator with prefetch.

    mode='train': shuffle each epoch, drop last partial batch.
    mode='eval' : sequential, pad last batch by repeating item 0 and
                  mark padding via batch['valid'] (bool, (B,)).
    """

    def __init__(
        self,
        dataset: Dataset,
        batch_size: int,
        mode: str = "train",
        seed: int = 0,
        num_workers: int = 8,
        prefetch: int = 2,
        collate_fn: Callable = default_collate,
        process_index: int | None = None,
        process_count: int | None = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.mode = mode
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.collate_fn = collate_fn
        # default to the jax runtime so per-process sharding activates
        # automatically under jax.distributed.initialize (multi-host)
        if process_index is None or process_count is None:
            try:
                import jax

                process_index = jax.process_index()
                process_count = jax.process_count()
            except Exception:
                process_index, process_count = 0, 1
        self.process_index = process_index
        self.process_count = process_count
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.mode == "train":
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        # per-process shard (deterministic DistributedSampler analogue)
        return idx[self.process_index :: self.process_count]

    def __len__(self) -> int:
        n = len(self._indices())
        if self.mode == "train":
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _make_batch(self, pool: ThreadPoolExecutor, batch_idx: np.ndarray) -> Dict[str, Any]:
        valid = np.ones(self.batch_size, dtype=bool)
        if len(batch_idx) < self.batch_size:
            pad = self.batch_size - len(batch_idx)
            valid[len(batch_idx):] = False
            batch_idx = np.concatenate([batch_idx, np.repeat(batch_idx[:1], pad)])
        items = list(pool.map(self.dataset.__getitem__, batch_idx))
        batch = self.collate_fn(items)
        if self.mode != "train":
            batch["valid"] = valid
        return batch

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        idx = self._indices()
        bs = self.batch_size
        if self.mode == "train":
            n_batches = len(idx) // bs
            chunks = [idx[i * bs : (i + 1) * bs] for i in range(n_batches)]
            if not chunks and len(idx):
                # dataset smaller than one (mesh-shardable) batch:
                # wrap-repeat instead of silently dropping the epoch
                chunks = [np.resize(idx, bs)]
        else:
            chunks = [idx[i : i + bs] for i in range(0, len(idx), bs)]
        if not chunks:
            return iter(())

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        pool = ThreadPoolExecutor(max_workers=self.num_workers)

        def producer():
            # Exceptions are shipped to the consumer instead of dying in
            # the worker thread (so loader errors fail the training step,
            # not a background thread).
            try:
                for c in chunks:
                    q.put(self._make_batch(pool, c))
            except BaseException as e:  # noqa: BLE001
                q.put(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()

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
