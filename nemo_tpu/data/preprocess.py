"""Pretraining data preprocessing: jsonl text → memory-mapped token bins.

Reference parity: `scripts/nlp_language_modeling/preprocess_data_for_
megatron.py` (jsonl → Megatron .bin/.idx via an Encoder pool with
sentence splitting / eod appending). Output here is the
`data/indexed_dataset.py` format that `PreTrainingDataModule` and the
C++ sample-index builders consume.

Design: tokenization is the bottleneck and is embarrassingly parallel —
a `multiprocessing` pool maps jsonl lines → token arrays with the
tokenizer constructed once per worker (fork-safe factory), while the
parent streams results into one IndexedDatasetWriter in order.
"""

from __future__ import annotations

import json
import multiprocessing as mp
from typing import Callable, Iterable, Iterator, Optional, Sequence

import numpy as np

from nemo_tpu.data.indexed_dataset import IndexedDataset, IndexedDatasetWriter
from nemo_tpu.utils.logging import logging

_worker_tok = None
_worker_cfg = None


def _init_worker(tokenizer_factory, json_keys, append_eod, eod_id):
    global _worker_tok, _worker_cfg
    _worker_tok = tokenizer_factory()
    _worker_cfg = (list(json_keys), append_eod, eod_id)


def _encode_line(line: str):
    keys, append_eod, eod_id = _worker_cfg
    line = line.strip()
    if not line:
        return []
    doc = json.loads(line)
    out = []
    for key in keys:
        text = doc.get(key)
        if not text:
            continue
        ids = list(_worker_tok.text_to_ids(text))
        if append_eod:
            eod = eod_id
            if eod is None:
                eod = getattr(_worker_tok, "eos_id", None)
            if eod is not None:
                ids.append(int(eod))
        if ids:
            out.append(np.asarray(ids, np.int32))
    return out


def preprocess_jsonl(
    inputs: Sequence[str],
    output_prefix: str,
    tokenizer_factory: Callable[[], object],
    *,
    json_keys: Sequence[str] = ("text",),
    append_eod: bool = True,
    eod_id: Optional[int] = None,
    workers: int = 1,
    dtype: str = "int32",
    log_every: int = 10000,
) -> dict:
    """Tokenize jsonl file(s) into <output_prefix>.bin/.idx.

    tokenizer_factory must be picklable (top-level function or
    functools.partial) — each worker builds its own tokenizer.
    Returns stats {documents, tokens}.
    """

    def lines() -> Iterator[str]:
        for path in inputs:
            with open(path) as f:
                yield from f

    writer = IndexedDatasetWriter(output_prefix, dtype=dtype)
    n_docs = n_tokens = 0

    def consume(docs_iter: Iterable) -> None:
        nonlocal n_docs, n_tokens
        for docs in docs_iter:
            for arr in docs:
                writer.add_document(arr)
                n_docs += 1
                n_tokens += len(arr)
                if log_every and n_docs % log_every == 0:
                    logging.info(f"preprocessed {n_docs} docs, {n_tokens} tokens")

    if workers <= 1:
        _init_worker(tokenizer_factory, json_keys, append_eod, eod_id)
        consume(map(_encode_line, lines()))
    else:
        with mp.get_context("fork").Pool(
            workers, initializer=_init_worker,
            initargs=(tokenizer_factory, json_keys, append_eod, eod_id),
        ) as pool:
            consume(pool.imap(_encode_line, lines(), chunksize=64))
    writer.finalize()
    logging.info(
        f"wrote {output_prefix}.bin/.idx: {n_docs} docs, {n_tokens} tokens")
    return {"documents": n_docs, "tokens": n_tokens}


def _make_hf(path):
    from nemo_tpu.data.text_tokenizers import HFTokenizer

    return HFTokenizer(path)


def _make_char():
    from nemo_tpu.data.text_tokenizers import CharTokenizer
    import string

    return CharTokenizer(list(string.printable))


def _make_byte():
    from nemo_tpu.data.text_tokenizers import ByteLevelTokenizer

    return ByteLevelTokenizer()


def tokenizer_factory_from_spec(spec: str) -> Callable[[], object]:
    """Picklable tokenizer factory from a CLI spec string:
    "hf://<name_or_path>" | "char" | "byte"."""
    import functools

    if spec.startswith("hf://"):
        return functools.partial(_make_hf, spec[len("hf://"):])
    if spec == "char":
        return _make_char
    if spec == "byte":
        return _make_byte
    raise ValueError(f"unknown tokenizer spec: {spec}")


def merge_datasets(prefixes: Sequence[str], output_prefix: str,
                   dtype: str = "int32") -> dict:
    """Concatenate several .bin/.idx datasets into one (the reference
    merge_datasets tool in preprocess_data_for_megatron.py)."""
    writer = IndexedDatasetWriter(output_prefix, dtype=dtype)
    n_docs = n_tokens = 0
    for prefix in prefixes:
        ds = IndexedDataset(prefix)
        for i in range(len(ds)):
            arr = ds[i]
            writer.add_document(arr)
            n_docs += 1
            n_tokens += len(arr)
    writer.finalize()
    return {"documents": n_docs, "tokens": n_tokens}
