"""Train an ASR subword tokenizer from manifests/text corpora.

Reference parity: `scripts/tokenizers/process_asr_text_tokenizer.py` —
the workflow that turns a training corpus into the `tokenizer_dir` every
BPE ASR model config points at (spm_train / HF WordPiece under the
hood). The sentencepiece wheel is absent in this environment, so BPE
training runs on the HF `tokenizers` backend with the sentencepiece
metaspace convention ("▁" word-boundary prefix) — the produced
tokenizer.json loads through `data.text_tokenizers.SentencePieceTokenizer`
and the pieces carry the same `▁` markers the decoding/word-alignment
code (context biasing, forced alignment) expects.
"""

from __future__ import annotations

import json
import os
from typing import Iterable, List, Optional, Sequence

from nemo_tpu.utils.logging import logging

__all__ = ["corpus_from_manifests", "build_tokenizer"]


def corpus_from_manifests(manifests: Sequence[str]) -> List[str]:
    """Collect `text` fields from ASR manifest jsonl files."""
    texts: List[str] = []
    for path in manifests:
        with open(path) as f:
            for line in f:
                if line.strip():
                    t = json.loads(line).get("text")
                    if t:
                        texts.append(t)
    return texts


def build_tokenizer(
    texts: Iterable[str],
    out_dir: str,
    *,
    vocab_size: int = 1024,
    tokenizer_type: str = "bpe",  # "bpe" | "wpe"
    lower_case: bool = True,
    special_tokens: Optional[Sequence[str]] = None,
) -> str:
    """Train and save <out_dir>/tokenizer.json (+ vocab.txt). Returns the
    tokenizer.json path."""
    from tokenizers import Tokenizer, decoders, models, normalizers
    from tokenizers import pre_tokenizers, trainers

    os.makedirs(out_dir, exist_ok=True)
    specials = list(special_tokens or ["<unk>", "<pad>"])
    norm = [normalizers.NFKC()]
    if lower_case:
        norm.append(normalizers.Lowercase())

    if tokenizer_type == "bpe":
        tok = Tokenizer(models.BPE(unk_token="<unk>"))
        tok.pre_tokenizer = pre_tokenizers.Metaspace(replacement="▁")
        tok.decoder = decoders.Metaspace(replacement="▁")
        trainer = trainers.BpeTrainer(
            vocab_size=vocab_size, special_tokens=specials,
            initial_alphabet=["▁"])
    elif tokenizer_type == "wpe":
        tok = Tokenizer(models.WordPiece(unk_token="<unk>"))
        tok.pre_tokenizer = pre_tokenizers.Whitespace()
        tok.decoder = decoders.WordPiece(prefix="##")
        trainer = trainers.WordPieceTrainer(
            vocab_size=vocab_size, special_tokens=specials)
    else:
        raise ValueError(f"unknown tokenizer_type: {tokenizer_type}")

    tok.normalizer = normalizers.Sequence(norm)
    tok.train_from_iterator(texts, trainer)

    path = os.path.join(out_dir, "tokenizer.json")
    tok.save(path)
    vocab = tok.get_vocab()
    with open(os.path.join(out_dir, "vocab.txt"), "w") as f:
        for piece, _ in sorted(vocab.items(), key=lambda kv: kv[1]):
            f.write(piece + "\n")
    logging.info(
        f"trained {tokenizer_type} tokenizer: {len(vocab)} pieces → {path}")
    return path
