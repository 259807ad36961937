"""Combined multi-task loader (Lightning CombinedLoader analogue).

Behavioral reference: the EgoT2-g tasks train on a CombinedLoader in
``max_size_cycle`` mode — one batch per task per step, shorter datasets
cycling (HHI/tasks/multitask/video_tasktranslation.py,
HOI/tasks/multitask/video_task.py:766).
"""

from __future__ import annotations

import itertools
from typing import Dict


class CombinedLoader:
    """Yields {name: batch} dicts; length = the longest loader's length,
    shorter loaders cycle (max_size_cycle)."""

    def __init__(self, loaders: Dict[str, object]):
        self.loaders = loaders

    def set_epoch(self, epoch: int) -> None:
        for l in self.loaders.values():
            if hasattr(l, "set_epoch"):
                l.set_epoch(epoch)

    def __len__(self) -> int:
        return max(len(l) for l in self.loaders.values())

    def __iter__(self):
        n = len(self)
        iters = {}
        for name, loader in self.loaders.items():
            if len(loader) >= n:
                iters[name] = iter(loader)
            else:
                iters[name] = itertools.islice(
                    itertools.chain.from_iterable(itertools.repeat(loader)), n)
        for _ in range(n):
            out = {}
            for name, it in iters.items():
                try:
                    out[name] = next(it)
                except StopIteration:
                    return
            yield out
