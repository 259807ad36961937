"""Distributed / multi-host helpers.

Replaces the reference's torch.distributed wrappers
(HHI/utils/lam/distributed.py:18-105 — init, rank accessors,
``synchronize`` barrier, master-only printing; HOI/utils/lta/
distributed.py — NCCL ``all_gather`` and gloo pickle
``all_gather_unaligned``) with the single-controller JAX equivalents:
process rank = ``jax.process_index()``, device barrier =
``block_until_ready`` on a tiny psum, host-object gather =
``multihost_utils.process_allgather``.
"""

from __future__ import annotations

from typing import Any, List

import jax
import jax.numpy as jnp
import numpy as np


def maybe_initialize_from_env() -> int:
    """Multi-host bring-up (reference reaches multi-node via Lightning/
    submitit env plumbing, HOI/scripts/lta/run_lta.py:238-288; the JAX
    equivalent is jax.distributed.initialize before first device use).

    Reads EGOT2X_COORDINATOR (host:port), EGOT2X_NUM_PROCESSES and
    EGOT2X_PROCESS_ID and calls ``jax.distributed.initialize`` when all
    are present. No-op (single process) otherwise. Returns the process
    count. Call at CLI entry, before any jax device use.
    """
    import os

    coord = os.environ.get("EGOT2X_COORDINATOR")
    nproc = os.environ.get("EGOT2X_NUM_PROCESSES")
    pid = os.environ.get("EGOT2X_PROCESS_ID")
    if coord and nproc and pid:
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=int(nproc),
                                   process_id=int(pid))
    elif os.environ.get("EGOT2X_AUTODETECT"):
        # Cloud TPU pods: argless initialize() autodetects coordinator/
        # process topology from the TPU metadata (launch_multihost.sh)
        jax.distributed.initialize()
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def is_master() -> bool:
    return jax.process_index() == 0


def synchronize() -> None:
    """Barrier across devices/processes (reference synchronize,
    HHI/utils/lam/distributed.py:69-79). A one-element psum forces all
    participants to the same program point."""
    if jax.process_count() == 1 and jax.device_count() == 1:
        return
    try:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("egot2x_sync")
    except Exception:
        jax.block_until_ready(jnp.zeros(()))


def all_gather_arrays(x: np.ndarray) -> np.ndarray:
    """Gather a per-process numpy array to all processes (reference NCCL
    all_gather, HOI/utils/lta/distributed.py:21-38). Single-process:
    identity."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(jnp.asarray(x)))


def all_gather_objects(obj: Any) -> List[Any]:
    """Gather arbitrary picklable objects (reference gloo
    all_gather_unaligned, distributed.py:41-80)."""
    if jax.process_count() == 1:
        return [obj]
    import pickle

    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    # pad to the max length across processes
    n = np.asarray([len(payload)], dtype=np.int32)
    lengths = all_gather_arrays(n).reshape(-1)
    maxlen = int(lengths.max())
    padded = np.zeros(maxlen, dtype=np.uint8)
    padded[: len(payload)] = payload
    gathered = all_gather_arrays(padded).reshape(jax.process_count(), maxlen)
    return [pickle.loads(gathered[i, : int(lengths[i])].tobytes())
            for i in range(jax.process_count())]
