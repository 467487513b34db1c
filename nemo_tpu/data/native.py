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


def _count_fill(fn, args, stride: int) -> np.ndarray:
    """Two-call protocol: count with out=NULL, then fill."""
    n = fn(*args, None)
    out = np.zeros((n, stride), np.int64)
    fn(*args, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out


def _bert_lib():
    lib = _build_and_load()
    if lib is None:
        return None
    if not hasattr(lib, "_bert_wired"):
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.build_bert_mapping.restype = ctypes.c_int64
        lib.build_bert_mapping.argtypes = [
            i64p, i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_double, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, i64p]
        lib.build_blocks_mapping.restype = ctypes.c_int64
        lib.build_blocks_mapping.argtypes = [
            i64p, i32p, i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, i64p]
        lib._bert_wired = True
    return lib


def build_bert_mapping(docs: np.ndarray, sizes: np.ndarray, *,
                       num_epochs: int, max_num_samples: int,
                       max_seq_length: int, short_seq_prob: float = 0.1,
                       seed: int = 1, min_num_sent: int = 2,
                       long_sentence_len: int = 512) -> np.ndarray:
    """[N, 3] (start_sent, end_sent, target_seq_len) BERT training samples:
    greedy packing of consecutive sentences per document, short-sequence
    sampling, epoch repetition and a seeded shuffle (reference
    helpers.cpp build_mapping:215; native C with a numpy fallback)."""
    docs = np.ascontiguousarray(docs, np.int64)
    sizes = np.ascontiguousarray(sizes, np.int32)
    lib = _bert_lib()
    if lib is not None:
        args = (docs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                len(docs) - 1, num_epochs, max_num_samples, max_seq_length,
                short_seq_prob, seed, min_num_sent, long_sentence_len)
        return _count_fill(lib.build_bert_mapping, args, 3)
    # numpy fallback mirroring the native logic (no shuffle-parity needed —
    # both are seeded but independent generators)
    rng = np.random.RandomState(seed)
    ratio = int(round(1.0 / short_seq_prob)) if short_seq_prob > 0 else 0
    rows = []
    for _ in range(num_epochs):
        if len(rows) >= max_num_samples:
            break
        for d in range(len(docs) - 1):
            first, last = int(docs[d]), int(docs[d + 1])
            remain = last - first
            if remain < min_num_sent or (
                    sizes[first:last] > long_sentence_len).any():
                continue
            prev, seq_len, num_sent = first, 0, 0
            tgt = (2 + rng.randint(max_seq_length - 1)
                   if ratio and rng.randint(ratio) == 0 else max_seq_length)
            for s in range(first, last):
                seq_len += int(sizes[s]); num_sent += 1; remain -= 1
                if ((seq_len >= tgt and remain > 1
                     and num_sent >= min_num_sent) or remain == 0):
                    rows.append((prev, s + 1, tgt))
                    prev, seq_len, num_sent = s + 1, 0, 0
                    tgt = (2 + rng.randint(max_seq_length - 1)
                           if ratio and rng.randint(ratio) == 0
                           else max_seq_length)
    rows = rows[:max_num_samples]
    out = np.asarray(rows, np.int64).reshape(-1, 3)
    np.random.RandomState(seed + 1).shuffle(out)
    return out


def build_blocks_mapping(docs: np.ndarray, sizes: np.ndarray,
                         titles_sizes: np.ndarray, *, num_epochs: int,
                         max_num_samples: int, max_seq_length: int,
                         seed: int = 1,
                         use_one_sent_blocks: bool = False) -> np.ndarray:
    """[N, 4] (start_sent, end_sent, doc, block_id) ICT/retrieval blocks —
    the per-document title is budgeted out of each block (reference
    helpers.cpp build_blocks_mapping:481)."""
    docs = np.ascontiguousarray(docs, np.int64)
    sizes = np.ascontiguousarray(sizes, np.int32)
    titles_sizes = np.ascontiguousarray(titles_sizes, np.int32)
    lib = _bert_lib()
    if lib is not None:
        args = (docs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                titles_sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                len(docs) - 1, num_epochs, max_num_samples, max_seq_length,
                seed, int(use_one_sent_blocks))
        return _count_fill(lib.build_blocks_mapping, args, 4)
    min_num_sent = 1 if use_one_sent_blocks else 2
    rows = []
    block_id = 0
    for _ in range(num_epochs):
        if len(rows) >= max_num_samples:
            break
        for d in range(len(docs) - 1):
            first, last = int(docs[d]), int(docs[d + 1])
            remain = last - first
            tgt = max_seq_length - int(titles_sizes[d])
            if remain < min_num_sent or tgt <= 0:
                continue
            prev, seq_len, num_sent = first, 0, 0
            for s in range(first, last):
                seq_len += int(sizes[s]); num_sent += 1; remain -= 1
                if ((seq_len >= tgt and remain >= min_num_sent
                     and num_sent >= min_num_sent) or remain == 0):
                    rows.append((prev, s + 1, d, block_id))
                    block_id += 1
                    prev, seq_len, num_sent = s + 1, 0, 0
    rows = rows[:max_num_samples]
    out = np.asarray(rows, np.int64).reshape(-1, 4)
    np.random.RandomState(seed + 1).shuffle(out)
    return out
