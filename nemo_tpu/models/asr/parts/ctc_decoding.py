"""CTC decoding: token-id sequences → text.

Reference parity: AbstractCTCDecoding / CTCDecoding / CTCBPEDecoding
(`nemo/collections/asr/parts/submodules/ctc_decoding.py:40`): greedy
collapse happens on ids (device argmax → host collapse), then char-vocab
join or tokenizer detokenization.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from nemo_tpu.ops.ctc import ctc_collapse, ctc_greedy_predictions


class CTCDecoding:
    """Greedy CTC decoding for char-vocab models (blank = last index)."""

    def __init__(self, vocabulary: Sequence[str]):
        self.vocabulary = list(vocabulary)
        self.blank_id = len(self.vocabulary)

    def ids_to_text(self, ids: List[int]) -> str:
        return "".join(self.vocabulary[i] for i in ids)

    def decode(self, log_probs, lengths) -> List[str]:
        preds = ctc_greedy_predictions(log_probs)
        id_lists = ctc_collapse(preds, lengths, blank=self.blank_id)
        return [self.ids_to_text(ids) for ids in id_lists]


class CTCBPEDecoding:
    """Greedy CTC decoding through a subword tokenizer (blank = vocab size)."""

    def __init__(self, tokenizer):
        self.tokenizer = tokenizer
        self.blank_id = tokenizer.vocab_size

    def decode(self, log_probs, lengths) -> List[str]:
        preds = ctc_greedy_predictions(log_probs)
        id_lists = ctc_collapse(preds, lengths, blank=self.blank_id)
        return [self.tokenizer.ids_to_text(ids) for ids in id_lists]
