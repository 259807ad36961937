"""Minimal object registry.

Replaces the reference's fvcore ``Registry("MODEL")`` /
``Registry("DATASET")`` pattern (reference: HHI/models/lam/build.py:9-20,
HOI/dataset/pnr/build_dataset.py) with one shared implementation instead
of the reference's per-directory copies.
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, Optional


class Registry:
    """Name → callable mapping with decorator-style registration."""

    def __init__(self, name: str):
        self._name = name
        self._objs: Dict[str, Any] = {}

    @property
    def name(self) -> str:
        return self._name

    def register(self, obj: Optional[Any] = None, *, name: Optional[str] = None):
        if obj is None:  # used as @registry.register(name="X")
            return lambda o: self.register(o, name=name)
        key = name or obj.__name__
        if key in self._objs:
            raise KeyError(f"{key!r} already registered in {self._name}")
        self._objs[key] = obj
        return obj

    def get(self, key: str) -> Any:
        if key not in self._objs:
            known = ", ".join(sorted(self._objs))
            raise KeyError(f"{key!r} not found in registry {self._name}. Known: {known}")
        return self._objs[key]

    def __contains__(self, key: str) -> bool:
        return key in self._objs

    def __iter__(self) -> Iterator[str]:
        return iter(self._objs)

    def keys(self):
        return self._objs.keys()


# Global registries mirroring the reference's build surfaces.
MODEL_REGISTRY = Registry("MODEL")
DATASET_REGISTRY = Registry("DATASET")
TASK_REGISTRY = Registry("TASK")


def build_model(name: str, *args, **kwargs):
    """Construct a registered model by name (reference: build_model(cfg))."""
    return MODEL_REGISTRY.get(name)(*args, **kwargs)
