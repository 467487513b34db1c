"""Grapheme-to-phoneme (G2P) for TTS text frontends.

Reference parity: `nemo.collections.tts.g2p` (ARPABET/IPA dictionary G2P
with heteronym handling and grapheme fallback). Dictionary-driven: loads a
CMUdict-format lexicon when provided; ships a small builtin seed lexicon;
unknown words fall back to graphemes (the reference's behavior with
`phoneme_probability<1` / OOV handling).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence

# Small builtin seed lexicon (ARPABET) so G2P works out of the box.
_BUILTIN = {
    "a": "AH0", "the": "DH AH0", "hello": "HH AH0 L OW1",
    "world": "W ER1 L D", "test": "T EH1 S T", "speech": "S P IY1 CH",
    "to": "T UW1", "text": "T EH1 K S T", "is": "IH1 Z", "this": "DH IH1 S",
}

ARPABET_PHONEMES = [
    "AA", "AE", "AH", "AO", "AW", "AY", "B", "CH", "D", "DH", "EH", "ER",
    "EY", "F", "G", "HH", "IH", "IY", "JH", "K", "L", "M", "N", "NG", "OW",
    "OY", "P", "R", "S", "SH", "T", "TH", "UH", "UW", "V", "W", "Y", "Z", "ZH",
]


class EnglishG2p:
    def __init__(self, phoneme_dict: Optional[str] = None,
                 grapheme_fallback: bool = True):
        self.lexicon: Dict[str, List[str]] = {
            w: p.split() for w, p in _BUILTIN.items()
        }
        self.grapheme_fallback = grapheme_fallback
        if phoneme_dict:
            self._load_cmudict(phoneme_dict)

    def _load_cmudict(self, path: str) -> None:
        with open(path, encoding="latin-1") as f:
            for line in f:
                if line.startswith(";;;") or not line.strip():
                    continue
                parts = line.strip().split()
                word = parts[0].lower()
                word = re.sub(r"\(\d+\)$", "", word)  # keep first variant
                if word not in self.lexicon:
                    self.lexicon[word] = parts[1:]

    def __call__(self, text: str) -> List[str]:
        """Text → phoneme (or fallback grapheme) token list; punctuation kept."""
        out: List[str] = []
        for token in re.findall(r"[a-zA-Z']+|[^a-zA-Z\s]", text.lower()):
            if token in self.lexicon:
                out.extend(self.lexicon[token])
            elif token.isalpha() and self.grapheme_fallback:
                out.extend(list(token))
            else:
                out.append(token)
            out.append(" ")
        return out[:-1] if out else out


class PhonemeTokenizer:
    """Phoneme vocabulary tokenizer for FastPitch-style models
    (reference tts_tokenizers.py EnglishPhonemesTokenizer)."""

    def __init__(self, g2p: Optional[EnglishG2p] = None):
        self.g2p = g2p or EnglishG2p()
        stressed = [p + s for p in ARPABET_PHONEMES for s in ("", "0", "1", "2")]
        chars = [chr(ord("a") + i) for i in range(26)]
        punct = list("!'\"(),.:;?- ")
        self.vocab = ["<pad>"] + sorted(set(stressed)) + chars + punct + ["<blank>"]
        self._stoi = {t: i for i, t in enumerate(self.vocab)}
        self.pad_id = 0

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    def text_to_ids(self, text: str) -> List[int]:
        return [self._stoi[t] for t in self.g2p(text) if t in self._stoi]

    def ids_to_text(self, ids: Sequence[int]) -> str:
        return " ".join(self.vocab[i] for i in ids)
