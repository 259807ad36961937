"""Native (C++) data-plane bindings.

Builds ``libdataplane.so`` on first import (g++ -O3 -ljpeg) and exposes
the batched decode/crop/resize and normalize entry points via ctypes.
Falls back gracefully (``AVAILABLE = False``) when no toolchain/libjpeg
is present; callers keep their pure-Python cv2 path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "dataplane.cpp")
_SO = os.path.join(_DIR, "libdataplane.so")

AVAILABLE = False
_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return True
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _SO, "-ljpeg", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib, AVAILABLE
    if _lib is not None:
        return
    if not _build():
        return
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return
    lib.decode_crop_resize_batch.restype = ctypes.c_int
    lib.decode_crop_resize_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte),
        ctypes.c_int,
    ]
    lib.normalize_batch.restype = None
    lib.normalize_batch.argtypes = [
        ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_float),
        ctypes.c_long, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    _lib = lib
    AVAILABLE = True


_load()


def decode_crop_resize(paths, bboxes: np.ndarray, out_size: int,
                       n_threads: int = 0) -> np.ndarray:
    """paths: list[str]; bboxes: (N, 4) float32 (x1,y1,x2,y2), x1<0 ⇒ full
    frame. Returns (N, out_size, out_size, 3) uint8 RGB; failed decodes
    are zero frames."""
    assert AVAILABLE, "native dataplane not built"
    n = len(paths)
    bboxes = np.ascontiguousarray(bboxes, dtype=np.float32)
    out = np.empty((n, out_size, out_size, 3), dtype=np.uint8)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    _lib.decode_crop_resize_batch(
        c_paths,
        bboxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, out_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        n_threads,
    )
    return out


def normalize(frames_u8: np.ndarray, mean, std, n_threads: int = 0) -> np.ndarray:
    """((v/255) - mean) / std over interleaved-RGB uint8 → float32."""
    assert AVAILABLE, "native dataplane not built"
    frames_u8 = np.ascontiguousarray(frames_u8)
    assert frames_u8.shape[-1] == 3
    out = np.empty(frames_u8.shape, dtype=np.float32)
    mean = np.ascontiguousarray(mean, dtype=np.float32)
    std = np.ascontiguousarray(std, dtype=np.float32)
    _lib.normalize_batch(
        frames_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        frames_u8.size // 3,
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads,
    )
    return out
