"""jsonl → token-bin preprocessing (reference:
preprocess_data_for_megatron.py) and the end-to-end pretraining data path.
"""

import json

import numpy as np

from nemo_tpu.data.indexed_dataset import IndexedDataset
from nemo_tpu.data.preprocess import (
    merge_datasets,
    preprocess_jsonl,
    tokenizer_factory_from_spec,
)


def _write_jsonl(path, texts, key="text"):
    with open(path, "w") as f:
        for t in texts:
            f.write(json.dumps({key: t}) + "\n")


def test_preprocess_roundtrip(tmp_path):
    texts = ["hello world", "a longer document with more text", "x"]
    src = tmp_path / "a.jsonl"
    _write_jsonl(src, texts)
    out = str(tmp_path / "ds")
    factory = tokenizer_factory_from_spec("byte")
    stats = preprocess_jsonl([str(src)], out, factory, append_eod=False)
    assert stats["documents"] == 3

    tok = factory()
    ds = IndexedDataset(out)
    assert len(ds) == 3
    for i, t in enumerate(texts):
        np.testing.assert_array_equal(ds[i], np.asarray(tok.text_to_ids(t)))


def test_preprocess_parallel_matches_serial_and_eod(tmp_path):
    texts = [f"document number {i}" for i in range(37)]
    src = tmp_path / "a.jsonl"
    _write_jsonl(src, texts)
    factory = tokenizer_factory_from_spec("byte")
    preprocess_jsonl([str(src)], str(tmp_path / "s"), factory, workers=1,
                     eod_id=7)
    preprocess_jsonl([str(src)], str(tmp_path / "p"), factory, workers=4,
                     eod_id=7)
    a, b = IndexedDataset(str(tmp_path / "s")), IndexedDataset(str(tmp_path / "p"))
    assert len(a) == len(b) == 37
    for i in range(37):
        np.testing.assert_array_equal(a[i], b[i])
        assert a[i][-1] == 7  # append_eod


def test_merge_and_pretraining_datamodule(tmp_path):
    factory = tokenizer_factory_from_spec("byte")
    _write_jsonl(tmp_path / "a.jsonl", ["first shard doc " * 4] * 5)
    _write_jsonl(tmp_path / "b.jsonl", ["second shard doc " * 4] * 5)
    preprocess_jsonl([str(tmp_path / "a.jsonl")], str(tmp_path / "a"), factory)
    preprocess_jsonl([str(tmp_path / "b.jsonl")], str(tmp_path / "b"), factory)
    stats = merge_datasets([str(tmp_path / "a"), str(tmp_path / "b")],
                           str(tmp_path / "ab"))
    assert stats["documents"] == 10

    # the produced dataset feeds the pretraining datamodule directly
    from nemo_tpu.data.gpt_dataset import PreTrainingDataModule

    dm = PreTrainingDataModule(
        [str(tmp_path / "ab")], seq_length=16, global_batch_size=4,
        max_steps=3)
    batch = next(iter(dm.train_batches()))
    assert batch["tokens"].shape[-1] == 16


def test_cli_preprocess(tmp_path, capsys):
    from nemo_tpu.cli import main

    _write_jsonl(tmp_path / "a.jsonl", ["cli document"] * 3)
    rc = main(["llm", "preprocess", f"input={tmp_path}/a.jsonl",
               f"output_prefix={tmp_path}/cli_ds", "tokenizer=byte"])
    assert rc == 0
    assert len(IndexedDataset(str(tmp_path / "cli_ds"))) == 3
