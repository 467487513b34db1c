"""ctypes loader for the native index-builder library (csrc/helpers.cpp).

Compiles on first use with g++ (cached next to the source); falls back to
numpy implementations if no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

from nemo_tpu.utils.logging import logging

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.join(os.path.dirname(__file__), "..", "csrc", "helpers.cpp")
    so = os.path.join(os.path.dirname(__file__), "..", "csrc", "libnemo_tpu_helpers.so")
    try:
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", src, "-o", so],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so)
        lib.build_sample_idx.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int32, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.build_blending_indices.argtypes = [
            ctypes.POINTER(ctypes.c_int16), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double), ctypes.c_int32, ctypes.c_int64,
        ]
        _LIB = lib
        logging.info("Loaded native index builders (helpers.cpp)")
    except Exception as e:  # pragma: no cover
        logging.warning(f"native helpers unavailable ({e}); using numpy fallback")
        _LIB = None
    return _LIB


def build_sample_idx(sizes: np.ndarray, doc_idx: np.ndarray, seq_length: int, num_samples: int) -> np.ndarray:
    """[num_samples+1, 2] (doc_pos, doc_offset) rows (reference helpers.cpp:98)."""
    sizes = np.ascontiguousarray(sizes, np.int32)
    doc_idx = np.ascontiguousarray(doc_idx, np.int64)
    out = np.zeros((num_samples + 1, 2), np.int64)
    lib = _build_and_load()
    if lib is not None:
        lib.build_sample_idx(
            sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            doc_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(doc_idx), seq_length, num_samples,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return out
    # numpy fallback (slow path)
    doc_pos, doc_offset = 0, 0
    out[0] = (0, 0)
    for k in range(1, num_samples + 1):
        remaining = seq_length
        while remaining > 0 and doc_pos < len(doc_idx):
            doc_len = int(sizes[doc_idx[doc_pos]]) - doc_offset
            if doc_len > remaining:
                doc_offset += remaining
                remaining = 0
            else:
                remaining -= doc_len
                doc_offset = 0
                doc_pos += 1
        if doc_pos >= len(doc_idx):
            doc_pos, doc_offset = len(doc_idx) - 1, 0
        out[k] = (doc_pos, doc_offset)
    return out


def build_blending_indices(weights: np.ndarray, size: int) -> Tuple[np.ndarray, np.ndarray]:
    """Greedy proportional blending (reference helpers.cpp:35)."""
    weights = np.ascontiguousarray(weights, np.float64)
    ds_index = np.zeros(size, np.int16)
    ds_sample = np.zeros(size, np.int64)
    lib = _build_and_load()
    if lib is not None:
        lib.build_blending_indices(
            ds_index.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            ds_sample.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            weights.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            len(weights), size,
        )
        return ds_index, ds_sample
    counts = np.zeros(len(weights), np.int64)
    for k in range(size):
        err = weights * (k + 1) - counts
        best = int(np.argmax(err))
        ds_index[k] = best
        ds_sample[k] = counts[best]
        counts[best] += 1
    return ds_index, ds_sample
