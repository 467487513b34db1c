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


class WordTokenizer(TokenizerSpec):
    """Whitespace word tokenizer (reference word_tokenizer.py)."""

    def __init__(self, vocab: Sequence[str], unk: str = "<unk>"):
        self.vocab = list(vocab)
        if unk not in self.vocab:
            self.vocab.append(unk)
        self._stoi = {w: i for i, w in enumerate(self.vocab)}
        self.unk = unk

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    def text_to_ids(self, text: str) -> List[int]:
        return [self._stoi.get(w, self._stoi[self.unk]) for w in text.split()]

    def ids_to_text(self, ids: Sequence[int]) -> str:
        return " ".join(self.vocab[i] for i in ids)


class RegexTokenizer(TokenizerSpec):
    """Regex-split tokenizer (reference regex_tokenizer.py — SMILES/
    chemistry-style vocabularies tokenized by a master pattern)."""

    def __init__(self, vocab: Sequence[str], pattern: str,
                 unk: str = "<unk>"):
        import re

        self.vocab = list(vocab)
        if unk not in self.vocab:
            self.vocab.append(unk)
        self._stoi = {t: i for i, t in enumerate(self.vocab)}
        self._re = re.compile(pattern)
        self.unk = unk

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    def text_to_ids(self, text: str) -> List[int]:
        return [self._stoi.get(t, self._stoi[self.unk])
                for t in self._re.findall(text)]

    def ids_to_text(self, ids: Sequence[int]) -> str:
        return "".join(self.vocab[i] for i in ids)


class AggregateTokenizer(TokenizerSpec):
    """Multiple monolingual tokenizers fused into ONE id space by offset
    arithmetic (reference: aggregate_tokenizer.py — tokenizer k's ids live
    in [offset_k, offset_k + vocab_k); text routes to its language's
    tokenizer, detokenization routes each id back by range).

    `tokenizers` is an ORDERED dict {lang_id: tokenizer}; the first gets
    the lowest id interval."""

    def __init__(self, tokenizers):
        self.tokenizers_dict = dict(tokenizers)
        self.token_id_offset = {}
        self._spans = []  # (lo, hi, lang, tok)
        off = 0
        for lang, tok in self.tokenizers_dict.items():
            self.token_id_offset[lang] = off
            self._spans.append((off, off + tok.vocab_size, lang, tok))
            off += tok.vocab_size
        self._vocab_size = off

    @property
    def vocab_size(self) -> int:
        return self._vocab_size

    @property
    def langs(self) -> List[str]:
        return list(self.tokenizers_dict)

    def _span_of(self, idx: int):
        for lo, hi, lang, tok in self._spans:
            if lo <= idx < hi:
                return lo, hi, lang, tok
        raise KeyError(f"token id {idx} outside aggregate vocab")

    def text_to_ids(self, text: str, lang_id: Optional[str] = None) -> List[int]:
        lang_id = lang_id or next(iter(self.tokenizers_dict))
        off = self.token_id_offset[lang_id]
        return [off + i for i in
                self.tokenizers_dict[lang_id].text_to_ids(text)]

    def token_to_id(self, token: str, lang_id: str) -> int:
        tok = self.tokenizers_dict[lang_id]
        return self.token_id_offset[lang_id] + tok.text_to_ids(token)[0]

    def ids_to_text(self, ids: Sequence[int]) -> str:
        """Route each contiguous same-language run to its tokenizer."""
        out, run, run_tok, run_off = [], [], None, 0
        for i in ids:
            lo, _, _, tok = self._span_of(int(i))
            if tok is not run_tok and run:
                out.append(run_tok.ids_to_text(run))
                run = []
            run_tok, run_off = tok, lo
            run.append(int(i) - lo)
        if run:
            out.append(run_tok.ids_to_text(run))
        return " ".join(s for s in out if s).strip()

    def ids_to_text_and_langs(self, ids: Sequence[int]):
        """Per-id (text, lang) pairs (reference ids_to_text_and_langs)."""
        res = []
        for i in ids:
            lo, _, lang, tok = self._span_of(int(i))
            res.append((tok.ids_to_text([int(i) - lo]), lang))
        return res

    def ids_to_lang(self, ids: Sequence[int]) -> str:
        """Majority language over the ids (reference ids_to_lang)."""
        from collections import Counter

        counts = Counter(self._span_of(int(i))[2] for i in ids)
        return counts.most_common(1)[0][0] if counts else next(iter(self.tokenizers_dict))


CANARY_SPECIAL = "spl_tokens"


def canary_special_tokens(langs: Sequence[str],
                          tasks: Sequence[str] = ("transcribe", "translate")):
    """The canary special-token vocabulary (reference canary_tokenizer.py):
    prompt schema <|startoftranscript|><|LANG|><|task|><|pnc|>."""
    toks = ["<pad>", "<|endoftext|>", "<|startoftranscript|>", "<|nospeech|>",
            "<|pnc|>", "<|nopnc|>"]
    toks += [f"<|{t}|>" for t in tasks]
    toks += [f"<|{l}|>" for l in langs]
    return toks


class CanaryTokenizer(AggregateTokenizer):
    """Aggregate tokenizer whose first sub-tokenizer is the canary
    special-token vocabulary; builds the multilingual prompt protocol
    (reference: canary_tokenizer.py CanaryTokenizer)."""

    def __init__(self, tokenizers, langs: Optional[Sequence[str]] = None,
                 tasks: Sequence[str] = ("transcribe", "translate")):
        tokenizers = dict(tokenizers)
        if CANARY_SPECIAL not in tokenizers:
            langs = list(langs or tokenizers.keys())
            spl = WordTokenizer(canary_special_tokens(langs, tasks),
                                unk="<pad>")
            tokenizers = {CANARY_SPECIAL: spl, **tokenizers}
        super().__init__(tokenizers)
        self.special_tokens = {
            t: self.token_to_id(t, CANARY_SPECIAL)
            for t in self.tokenizers_dict[CANARY_SPECIAL].vocab
            if (t.startswith("<|") and t.endswith("|>")) or t == "<pad>"
        }

    @property
    def pad_id(self) -> int:
        return self.special_tokens["<pad>"]

    @property
    def bos_id(self) -> int:
        return self.special_tokens["<|startoftranscript|>"]

    @property
    def eos_id(self) -> int:
        return self.special_tokens["<|endoftext|>"]

    @property
    def nospeech_id(self) -> int:
        return self.special_tokens["<|nospeech|>"]

    def spl_token_to_id(self, token: str) -> int:
        return self.special_tokens[token]

    def prompt_ids(self, source_lang: str, target_lang: Optional[str] = None,
                   task: str = "transcribe", pnc: bool = True) -> List[int]:
        """<|startoftranscript|><|source|><|task|>[<|target|>]<|pnc/nopnc|>
        — translate prompts carry the target language after the task token
        (reference canary prompt format)."""
        ids = [self.bos_id, self.spl_token_to_id(f"<|{source_lang}|>"),
               self.spl_token_to_id(f"<|{task}|>")]
        if task == "translate":
            ids.append(self.spl_token_to_id(f"<|{target_lang or source_lang}|>"))
        ids.append(self.spl_token_to_id("<|pnc|>" if pnc else "<|nopnc|>"))
        return ids


class ByteLevelTokenizer(TokenizerSpec):
    """UTF-8 byte tokenizer (reference
    common/tokenizers/bytelevel_tokenizers.py): ids are raw bytes 0-255
    plus pad/bos/eos specials appended after the byte range."""

    def __init__(self, special_tokens: Sequence[str] = ("<pad>", "<bos>", "<eos>")):
        self._special = {s: 256 + i for i, s in enumerate(special_tokens)}
        self.pad_id = self._special.get("<pad>")
        self.bos_id = self._special.get("<bos>")
        self.eos_id = self._special.get("<eos>")

    @property
    def vocab_size(self) -> int:
        return 256 + len(self._special)

    def text_to_ids(self, text: str) -> List[int]:
        return list(text.encode("utf-8"))

    def ids_to_text(self, ids: Sequence[int]) -> str:
        return bytes(i for i in ids if i < 256).decode(
            "utf-8", errors="replace")


class TiktokenTokenizer(TokenizerSpec):
    """Byte-level BPE over a .tiktoken ranks file (reference
    tiktoken_tokenizer.py; the `tiktoken` wheel is absent in this image so
    the merge loop is self-contained).

    A ranks file maps base64(token bytes) → rank per line; encoding
    greedily merges the lowest-rank adjacent pair (exact BPE). Special
    tokens get ids after the byte-pair vocabulary."""

    def __init__(self, ranks_path: Optional[str] = None,
                 ranks: Optional[dict] = None,
                 special_tokens: Sequence[str] = ("<|endoftext|>",)):
        import base64

        if ranks is None:
            ranks = {}
            with open(ranks_path, "rb") as f:
                for line in f:
                    if not line.strip():
                        continue
                    tok_b64, rank = line.split()
                    ranks[base64.b64decode(tok_b64)] = int(rank)
        self._ranks = dict(ranks)
        self._decode = {r: b for b, r in self._ranks.items()}
        n = max(self._ranks.values()) + 1 if self._ranks else 0
        self._special = {}
        for i, s in enumerate(special_tokens):
            self._special[s] = n + i
            self._decode[n + i] = s.encode()
        self._n_total = n + len(special_tokens)

    @property
    def vocab_size(self) -> int:
        return self._n_total

    @property
    def eos_id(self) -> int:
        return next(iter(self._special.values()))

    def _bpe(self, piece: bytes) -> List[int]:
        parts = [piece[i:i + 1] for i in range(len(piece))]
        while len(parts) > 1:
            best_rank, best_i = None, None
            for i in range(len(parts) - 1):
                r = self._ranks.get(parts[i] + parts[i + 1])
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_i is None:
                break
            parts = (parts[:best_i] + [parts[best_i] + parts[best_i + 1]]
                     + parts[best_i + 2:])
        out = []
        for p in parts:
            if p in self._ranks:
                out.append(self._ranks[p])
            else:  # unmergeable byte missing from ranks: emit per-byte
                out.extend(self._ranks.get(p[i:i + 1], 0)
                           for i in range(len(p)))
        return out

    def text_to_ids(self, text: str) -> List[int]:
        ids: List[int] = []
        rest = text
        # split out special tokens verbatim
        while rest:
            hits = [(rest.find(s), s) for s in self._special if s in rest]
            if not hits:
                ids.extend(self._bpe(rest.encode("utf-8")))
                break
            pos, s = min(hits)
            if pos > 0:
                ids.extend(self._bpe(rest[:pos].encode("utf-8")))
            ids.append(self._special[s])
            rest = rest[pos + len(s):]
        return ids

    def ids_to_text(self, ids: Sequence[int]) -> str:
        data = b"".join(self._decode.get(int(i), b"") for i in ids)
        return data.decode("utf-8", errors="replace")
