"""Packed sequences: first-fit bin packing + segment-id batches.

Reference parity: `nemo/utils/sequence_packing_utils.py:44-99` (first-fit
packing), `llm/gpt/data/packed_sequence.py` (THD/cu_seqlens format). On TPU
the cu_seqlens format becomes per-token SEGMENT IDS — the attention mask is
(segment_i == segment_j) & causal, which Pallas/XLA handle without ragged
shapes.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np


def first_fit_pack(lengths: Sequence[int], bin_size: int) -> List[List[int]]:
    """Pack sample indices into bins of capacity bin_size (first-fit
    decreasing, reference sequence_packing_utils.py:44)."""
    order = np.argsort(lengths)[::-1]
    bins: List[List[int]] = []
    space: List[int] = []
    for i in order:
        L = lengths[i]
        if L > bin_size:
            continue  # drop over-long samples
        for b, s in enumerate(space):
            if s >= L:
                bins[b].append(int(i))
                space[b] -= L
                break
        else:
            bins.append([int(i)])
            space.append(bin_size - L)
    return bins


def pack_batch(
    sequences: List[np.ndarray],  # token arrays (input+label concatenated views)
    labels: List[np.ndarray],
    loss_masks: List[np.ndarray],
    bin_size: int,
) -> Dict[str, np.ndarray]:
    """Pack variable-length samples into fixed [n_bins, bin_size] arrays with
    segment ids (1-based; 0 = padding)."""
    lengths = [len(s) for s in sequences]
    bins = first_fit_pack(lengths, bin_size)
    n = len(bins)
    tokens = np.zeros((n, bin_size), np.int32)
    labs = np.zeros((n, bin_size), np.int32)
    lmask = np.zeros((n, bin_size), np.float32)
    seg = np.zeros((n, bin_size), np.int32)
    pos = np.zeros((n, bin_size), np.int32)
    for b, idxs in enumerate(bins):
        off = 0
        for s_id, i in enumerate(idxs, start=1):
            L = lengths[i]
            tokens[b, off : off + L] = sequences[i]
            labs[b, off : off + L] = labels[i]
            lmask[b, off : off + L] = loss_masks[i]
            seg[b, off : off + L] = s_id
            pos[b, off : off + L] = np.arange(L)
            off += L
    return {
        "tokens": tokens, "labels": labs, "loss_mask": lmask,
        "segment_ids": seg, "positions": pos,
    }
