"""BERT-style native index builders (VERDICT r2 missing #11):
build_bert_mapping / build_blocks_mapping, C ABI vs numpy fallback."""

import numpy as np
import pytest

import nemo_tpu.data.native as native
from nemo_tpu.data.native import build_bert_mapping, build_blocks_mapping


def _sentences():
    # 4 docs with sentence token counts; docs = offsets into sizes
    sizes = np.array([5, 7, 4, 9, 3, 6, 8, 2, 5, 5, 4], np.int32)
    docs = np.array([0, 3, 5, 9, 11], np.int64)  # doc0: 3 sents, doc1: 2, ...
    return docs, sizes


def test_bert_mapping_invariants():
    docs, sizes = _sentences()
    m = build_bert_mapping(docs, sizes, num_epochs=3, max_num_samples=1000,
                           max_seq_length=12, short_seq_prob=0.2, seed=7)
    assert m.shape[1] == 3 and len(m) > 0
    for start, end, tgt in m:
        assert end > start
        assert 2 <= tgt <= 12
        # sample sentences stay within one document
        d = np.searchsorted(docs, start, side="right") - 1
        assert end <= docs[d + 1]
    # epochs multiply the sample count; seeded shuffle is deterministic
    m2 = build_bert_mapping(docs, sizes, num_epochs=3, max_num_samples=1000,
                            max_seq_length=12, short_seq_prob=0.2, seed=7)
    np.testing.assert_array_equal(m, m2)
    m1 = build_bert_mapping(docs, sizes, num_epochs=1, max_num_samples=1000,
                            max_seq_length=12, short_seq_prob=0.0, seed=7)
    m3 = build_bert_mapping(docs, sizes, num_epochs=3, max_num_samples=1000,
                            max_seq_length=12, short_seq_prob=0.0, seed=7)
    assert len(m3) == 3 * len(m1)


def test_bert_mapping_max_samples_and_min_sent():
    docs, sizes = _sentences()
    m = build_bert_mapping(docs, sizes, num_epochs=10, max_num_samples=4,
                           max_seq_length=12, short_seq_prob=0.0, seed=3)
    assert len(m) == 4
    # min_num_sent=3 excludes 2-sentence docs entirely
    m3 = build_bert_mapping(docs, sizes, num_epochs=1, max_num_samples=100,
                            max_seq_length=100, short_seq_prob=0.0, seed=3,
                            min_num_sent=3)
    for start, end, _ in m3:
        assert end - start >= 3


def test_blocks_mapping_title_budget_and_ids():
    docs, sizes = _sentences()
    titles = np.array([2, 4, 1, 3], np.int32)
    m = build_blocks_mapping(docs, sizes, titles, num_epochs=2,
                             max_num_samples=1000, max_seq_length=14, seed=5)
    assert m.shape[1] == 4 and len(m) > 0
    assert len(np.unique(m[:, 3])) == len(m)  # unique block ids
    for start, end, doc, _ in m:
        assert docs[doc] <= start < end <= docs[doc + 1]


def test_native_matches_numpy_fallback(monkeypatch):
    """The C builders and the numpy fallback must produce the same SET of
    samples (shuffle order may differ — independent generators)."""
    docs, sizes = _sentences()
    kw = dict(num_epochs=2, max_num_samples=1000, max_seq_length=12,
              short_seq_prob=0.0, seed=11)
    native._build_and_load()
    if native._LIB is None:
        pytest.skip("no compiler for the native path")
    m_native = build_bert_mapping(docs, sizes, **kw)
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", True)
    m_numpy = build_bert_mapping(docs, sizes, **kw)
    assert sorted(map(tuple, m_native)) == sorted(map(tuple, m_numpy))

    kwb = dict(num_epochs=2, max_num_samples=1000, max_seq_length=14, seed=5)
    titles = np.array([2, 4, 1, 3], np.int32)
    m_numpy_b = build_blocks_mapping(docs, sizes, titles, **kwb)
    monkeypatch.setattr(native, "_TRIED", False)
    monkeypatch.setattr(native, "_LIB", None)
    native._build_and_load()
    m_native_b = build_blocks_mapping(docs, sizes, titles, **kwb)
    assert sorted(map(tuple, m_native_b)) == sorted(map(tuple, m_numpy_b))
