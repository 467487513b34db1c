"""SpeechLM audio-text data pipeline: manifest QA → static SALM batches,
freeze controls (reference speechlm/data/dataset/audio_text_dataset.py +
speech_to_text_llm_model.py freeze_*)."""

import json
import os

import numpy as np
import pytest

from nemo_tpu.data.audio_io import write_wav
from nemo_tpu.data.speechlm_dataset import (
    SpeechLMDataModule, SpeechLMManifestDataset)
from nemo_tpu.data.text_tokenizers import CharTokenizer


def _vocab():
    chars = [chr(ord("a") + i) for i in range(26)]
    return ["<pad>"] + chars + [" ", "?", ":", "Q", "A"]


def _make_corpus(tmp_path, n=6, sr=16000):
    rng = np.random.RandomState(0)
    man = tmp_path / "manifest.jsonl"
    with open(man, "w") as f:
        for i in range(n):
            dur = 0.1 + 0.05 * i
            wav = (0.1 * rng.randn(int(dur * sr))).astype(np.float32)
            path = str(tmp_path / f"utt{i}.wav")
            write_wav(path, wav, sr)
            f.write(json.dumps({
                "audio_filepath": path, "duration": dur,
                "context": "what is said?",
                "answer": f"hello world {i}"}) + "\n")
    return str(man)


def test_manifest_dataset_and_static_batches(tmp_path):
    man = _make_corpus(tmp_path)
    ds = SpeechLMManifestDataset(man)
    assert len(ds) == 6
    tok = CharTokenizer(_vocab(), unk=" ")
    dm = SpeechLMDataModule(
        ds, tok, global_batch_size=2,
        duration_buckets=(0.25, 0.5), token_buckets=(32, 64),
        seed=3)
    batches = list(dm.epoch(0))
    assert len(batches) == 3
    for b in batches:
        # static-shape contract: snapped to buckets
        assert b["audio"].shape[1] in (4000, 8000)
        assert b["tokens"].shape[1] in (32, 64)
        assert b["audio"].shape[0] == 2
        # loss mask covers answer only: strictly fewer 1s than tokens
        n_ans = b["loss_mask"].sum(axis=1)
        n_tok = (b["tokens"] != 0).sum(axis=1)
        assert (n_ans > 0).all() and (n_ans < n_tok).all()
        assert (b["audio_len"] <= b["audio"].shape[1]).all()


def test_context_file_fills_missing_questions(tmp_path):
    sr = 16000
    man = tmp_path / "man.jsonl"
    wav = np.zeros(1600, np.float32)
    path = str(tmp_path / "a.wav")
    write_wav(path, wav, sr)
    with open(man, "w") as f:
        f.write(json.dumps({"audio_filepath": path, "duration": 0.1,
                            "text": "transcribe me"}) + "\n")
    ctxf = tmp_path / "ctx.txt"
    ctxf.write_text("please transcribe\nwhat was said\n")
    ds = SpeechLMManifestDataset(str(man), context_file=str(ctxf))
    assert ds[0]["context"] in ("please transcribe", "what was said")
    # answer falls back to the ASR `text` field
    assert ds[0]["answer"] == "transcribe me"


def test_dp_sharding_disjoint(tmp_path):
    man = _make_corpus(tmp_path, n=8)
    ds = SpeechLMManifestDataset(man)
    tok = CharTokenizer(_vocab(), unk=" ")
    seen = []
    for rank in range(2):
        dm = SpeechLMDataModule(ds, tok, global_batch_size=4,
                                shard_rank=rank, shard_world=2,
                                shuffle=False)
        lens = set()
        for b in dm.epoch(0):
            lens.update(b["audio_len"].tolist())
        seen.append(lens)
    assert seen[0].isdisjoint(seen[1])
    assert len(seen[0] | seen[1]) == 8


def test_salm_trains_from_manifest_with_frozen_llm(tmp_path):
    import jax

    from nemo_tpu.models.asr.configs import conformer_ctc
    from nemo_tpu.models.llm.config import tiny_test
    from nemo_tpu.models.speechlm.salm import SALMConfig
    from nemo_tpu.models.speechlm.train import SALMTrainModule

    man = _make_corpus(tmp_path, n=4)
    ds = SpeechLMManifestDataset(man)
    tok = CharTokenizer(_vocab(), unk=" ")
    dm = SpeechLMDataModule(ds, tok, global_batch_size=2,
                            duration_buckets=(0.5,), token_buckets=(64,))

    enc = dict(conformer_ctc("large").encoder.to_dict())
    enc.update(n_layers=2, d_model=32, n_heads=4, feat_in=32)
    cfg = SALMConfig(llm=tiny_test(seq_length=64), encoder=enc,
                     mel_features=32, frame_stacking=2)
    mod = SALMTrainModule(cfg, freeze=("llm", "speech"))
    state = mod.init_state()
    p0 = jax.tree_util.tree_map(np.asarray, state.params["params"])
    batch = next(dm.train_batches())
    state, metrics = mod.train_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    p1 = state.params["params"]
    # frozen towers identical; projector moved
    assert all(np.array_equal(a, b) for a, b in zip(
        jax.tree_util.tree_leaves(p0["llm"]),
        jax.tree_util.tree_leaves(p1["llm"])))
    assert all(np.array_equal(a, b) for a, b in zip(
        jax.tree_util.tree_leaves(p0["encoder"]),
        jax.tree_util.tree_leaves(p1["encoder"])))
    assert not all(np.array_equal(a, b) for a, b in zip(
        jax.tree_util.tree_leaves(p0["projector"]),
        jax.tree_util.tree_leaves(p1["projector"])))
    # trainable_parameters reports only the adapter
    names = [n for n, _ in mod.trainable_parameters(p1)]
    assert names and all(n.startswith("projector") for n in names)
