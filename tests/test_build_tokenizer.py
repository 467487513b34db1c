"""ASR tokenizer training (reference: process_asr_text_tokenizer.py)."""

import json

import pytest

from nemo_tpu.data.text_tokenizers import SentencePieceTokenizer
from nemo_tpu.tools.build_tokenizer import build_tokenizer, corpus_from_manifests

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "speech recognition with subword tokenizers",
    "the dog barks at the quick fox",
    "tokenizer training on a tiny corpus of text",
] * 8


def test_bpe_roundtrip_and_metaspace(tmp_path):
    path = build_tokenizer(CORPUS, str(tmp_path), vocab_size=200)
    tok = SentencePieceTokenizer(path)
    assert tok.vocab_size <= 200
    ids = tok.text_to_ids("the quick dog")
    assert ids and tok.ids_to_text(ids) == "the quick dog"
    # pieces carry the sentencepiece word-boundary marker
    vocab = (tmp_path / "vocab.txt").read_text().splitlines()
    assert any(p.startswith("▁") for p in vocab)


def test_wpe_and_manifest_corpus(tmp_path):
    man = tmp_path / "m.jsonl"
    with man.open("w") as f:
        for t in CORPUS:
            f.write(json.dumps({"audio_filepath": "x.wav", "text": t}) + "\n")
    texts = corpus_from_manifests([str(man)])
    assert len(texts) == len(CORPUS)
    path = build_tokenizer(texts, str(tmp_path / "wpe"), vocab_size=150,
                           tokenizer_type="wpe")
    tok = SentencePieceTokenizer(path)
    ids = tok.text_to_ids("quick brown fox")
    assert ids and "quick" in tok.ids_to_text(ids)


def test_rejects_unknown_type(tmp_path):
    with pytest.raises(ValueError, match="tokenizer_type"):
        build_tokenizer(CORPUS, str(tmp_path), tokenizer_type="unigram")
