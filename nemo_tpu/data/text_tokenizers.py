"""Text tokenizers.

Reference parity: `nemo/collections/common/tokenizers/` — TokenizerSpec ABC,
char tokenizer, HF AutoTokenizer wrapper; TTS char tokenizer with punctuation
(`common/tokenizers/text_to_speech/tts_tokenizers.py` EnglishCharsTokenizer).
SentencePiece models load through HF `tokenizers` (no sentencepiece wheel in
this image); gate accordingly.
"""

from __future__ import annotations

from typing import List, Optional, Sequence


class TokenizerSpec:
    """Minimal tokenizer interface (reference tokenizer_spec.py:22)."""

    @property
    def vocab_size(self) -> int:
        raise NotImplementedError

    def text_to_ids(self, text: str) -> List[int]:
        raise NotImplementedError

    def ids_to_text(self, ids: Sequence[int]) -> str:
        raise NotImplementedError


class CharTokenizer(TokenizerSpec):
    def __init__(self, vocab: Sequence[str], unk: Optional[str] = None):
        self.vocab = list(vocab)
        self._stoi = {c: i for i, c in enumerate(self.vocab)}
        self.unk = unk

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    def text_to_ids(self, text: str) -> List[int]:
        ids = []
        for c in text:
            if c in self._stoi:
                ids.append(self._stoi[c])
            elif self.unk is not None:
                ids.append(self._stoi[self.unk])
        return ids

    def ids_to_text(self, ids: Sequence[int]) -> str:
        return "".join(self.vocab[i] for i in ids)


class EnglishCharsTTSTokenizer(CharTokenizer):
    """Lowercase chars + punctuation + pad/blank symbols for TTS
    (reference EnglishCharsTokenizer)."""

    PUNCT = "!'\"(),.:;?- "

    def __init__(self):
        chars = [chr(ord("a") + i) for i in range(26)]
        vocab = ["<pad>"] + chars + list(self.PUNCT) + ["<blank>"]
        super().__init__(vocab)
        self.pad_id = 0
        self.blank_id = len(vocab) - 1

    def text_to_ids(self, text: str) -> List[int]:
        return super().text_to_ids(text.lower())


class HFTokenizer(TokenizerSpec):
    """Wrap a HuggingFace `tokenizers`/`transformers` tokenizer
    (reference: huggingface/auto_tokenizer.py)."""

    def __init__(self, pretrained_or_path: str):
        from transformers import AutoTokenizer

        self.tok = AutoTokenizer.from_pretrained(pretrained_or_path)

    @property
    def vocab_size(self) -> int:
        return len(self.tok)

    def text_to_ids(self, text: str) -> List[int]:
        return self.tok.encode(text, add_special_tokens=False)

    def ids_to_text(self, ids: Sequence[int]) -> str:
        return self.tok.decode(ids, skip_special_tokens=True)

    @property
    def bos_id(self):
        return self.tok.bos_token_id

    @property
    def eos_id(self):
        return self.tok.eos_token_id


class SentencePieceTokenizer(TokenizerSpec):
    """ASR-style BPE from a HF `tokenizers` json file, mirroring the
    reference SentencePieceTokenizer surface (sentencepiece_tokenizer.py).
    Accepts a tokenizer.json (the sentencepiece wheel is not available)."""

    def __init__(self, tokenizer_json: str):
        from tokenizers import Tokenizer

        self.tok = Tokenizer.from_file(tokenizer_json)

    @property
    def vocab_size(self) -> int:
        return self.tok.get_vocab_size()

    def text_to_ids(self, text: str) -> List[int]:
        return self.tok.encode(text).ids

    def ids_to_text(self, ids: Sequence[int]) -> str:
        return self.tok.decode(list(ids))
