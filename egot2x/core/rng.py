"""PRNG key plumbing.

JAX threads explicit PRNG keys instead of the reference's global torch
seeds (e.g. epoch-seeded generators in HHI/dataset/ttm/sampler.py:40-44).
A ``KeyChain`` gives deterministic, independently-consumable streams.
"""

from __future__ import annotations

from typing import Dict

import jax


class KeyChain:
    """Deterministic named PRNG streams derived from one root seed."""

    def __init__(self, seed: int = 0):
        self._root = jax.random.key(seed)
        self._counters: Dict[str, int] = {}

    def next(self, name: str = "default") -> jax.Array:
        i = self._counters.get(name, 0)
        self._counters[name] = i + 1
        return jax.random.fold_in(jax.random.fold_in(self._root, hash(name) % (2**31)), i)

    def epoch_key(self, name: str, epoch: int) -> jax.Array:
        """Key that depends only on (seed, name, epoch) — reproducible shuffles."""
        return jax.random.fold_in(
            jax.random.fold_in(self._root, hash(name) % (2**31)), epoch
        )
