"""Profiling & model-introspection helpers.

Replaces the reference's fvcore helpers (HOI/utils/lta/misc.py:23-114:
``params_count``, ``gpu_mem_usage``, ``get_flop_stats``,
``log_model_info``) and the per-step gradient histogram logging
(HOI/tasks/lta/video_task.py:112-125) with JAX-native equivalents:
XLA ``cost_analysis`` for FLOPs, ``jax.profiler`` traces, and
device memory stats.
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable, Dict, Optional

import jax
import numpy as np


def params_count(params: Any) -> int:
    """Total parameter count (reference params_count, misc.py:23-30)."""
    return sum(int(np.size(l)) for l in jax.tree_util.tree_leaves(params))


def params_bytes(params: Any) -> int:
    return sum(int(np.size(l)) * np.dtype(l.dtype).itemsize
               for l in jax.tree_util.tree_leaves(params))


def device_mem_usage() -> Dict[str, int]:
    """Per-device live memory (reference gpu_mem_usage, misc.py:32-40)."""
    out = {}
    for d in jax.local_devices():
        try:
            stats = d.memory_stats()
            out[str(d)] = int(stats.get("bytes_in_use", 0))
        except Exception:  # pragma: no cover - backend without stats
            out[str(d)] = -1
    return out


def flop_estimate(fn: Callable, *args) -> Optional[float]:
    """Compiled-cost FLOPs via XLA cost analysis (reference
    get_flop_stats via fvcore, misc.py:54-75)."""
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", float("nan")))
    except Exception:  # pragma: no cover
        return None


def log_model_info(name: str, params: Any, fn: Optional[Callable] = None,
                   *args) -> Dict[str, Any]:
    """Reference log_model_info (misc.py:78-114): params/flops/memory."""
    info = {
        "model": name,
        "params": params_count(params),
        "param_bytes": params_bytes(params),
        "mem": device_mem_usage(),
    }
    if fn is not None:
        info["flops"] = flop_estimate(fn, *args)
    return info


def grad_histograms(grads: Any, bins: int = 20) -> Dict[str, Any]:
    """Per-leaf gradient histograms (reference LOG_GRADIENT_PERIOD hook,
    HOI/tasks/lta/video_task.py:112-125)."""
    out = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(grads):
        arr = np.asarray(leaf).ravel()
        hist, edges = np.histogram(arr, bins=bins)
        out[jax.tree_util.keystr(path)] = {
            "hist": hist.tolist(),
            "min": float(arr.min()) if arr.size else 0.0,
            "max": float(arr.max()) if arr.size else 0.0,
            "norm": float(np.linalg.norm(arr)),
        }
    return out


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (SURVEY.md §5 TPU tracing equivalent)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def step_timer(fn: Callable) -> Callable:
    """Wrap a jitted step to report wall time via block_until_ready."""
    import time

    def wrapped(*args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        return out, time.perf_counter() - t0

    return wrapped
