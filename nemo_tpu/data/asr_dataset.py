"""ASR datasets: manifest (jsonl) + tarred audio, bucketing loader.

Reference parity: AudioToCharDataset/AudioToBPEDataset
(`asr/data/audio_to_text.py:512,604` — jsonl manifests with
{audio_filepath, duration, text}), tarred webdataset variants (`:1019`),
and duration-bucketed batching (the Lhotse dynamic bucketing sampler's
role, `common/data/lhotse/dataloader.py`).

TPU-first: batches are padded to per-bucket static shapes (duration buckets
× token-length buckets) so jit compiles a small fixed set of programs.
"""

from __future__ import annotations

import json
import math
import os
import tarfile
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from nemo_tpu.data.audio_io import read_wav
from nemo_tpu.utils.logging import logging


class ManifestDataset:
    """jsonl manifest → (audio path, text, duration) entries."""

    def __init__(self, manifest_path: str, max_duration: Optional[float] = None,
                 min_duration: float = 0.1):
        self.entries = []
        base = os.path.dirname(os.path.abspath(manifest_path))
        with open(manifest_path) as f:
            for line in f:
                if not line.strip():
                    continue
                e = json.loads(line)
                dur = float(e.get("duration", 0.0))
                if max_duration and dur > max_duration:
                    continue
                if dur and dur < min_duration:
                    continue
                path = e["audio_filepath"]
                if not os.path.isabs(path):
                    path = os.path.join(base, path)
                self.entries.append({"audio": path, "text": e.get("text", ""), "duration": dur})
        logging.info(f"ManifestDataset: {len(self.entries)} entries from {manifest_path}")

    def __len__(self):
        return len(self.entries)

    def __getitem__(self, i):
        return self.entries[i]


class TarredAudioDataset:
    """Webdataset-style tar shards of wavs + a manifest for transcripts
    (reference audio_to_text.py:1019; shard scatter :208-224)."""

    def __init__(self, tar_paths: Sequence[str], manifest_path: str,
                 shard_rank: int = 0, shard_world: int = 1):
        self.manifest = {}
        with open(manifest_path) as f:
            for line in f:
                if line.strip():
                    e = json.loads(line)
                    key = os.path.basename(e["audio_filepath"])
                    self.manifest[key] = e.get("text", "")
        # scatter shards across workers
        self.tar_paths = [p for i, p in enumerate(sorted(tar_paths)) if i % shard_world == shard_rank]

    def __iter__(self):
        for tp in self.tar_paths:
            with tarfile.open(tp) as tar:
                for m in tar.getmembers():
                    if not m.name.endswith(".wav"):
                        continue
                    text = self.manifest.get(os.path.basename(m.name))
                    if text is None:
                        continue
                    import io as _io
                    import wave as _wave

                    raw = tar.extractfile(m).read()
                    with _wave.open(_io.BytesIO(raw)) as w:
                        sr = w.getframerate()
                        x = np.frombuffer(w.readframes(w.getnframes()), "<i2").astype(np.float32) / 32768.0
                    yield {"samples": x, "sample_rate": sr, "text": text}


def _bucket_size(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class AudioToTextLoader:
    """Batches manifest entries into padded static-shape arrays.

    Yields {"audio": [B,T], "audio_len": [B], "text": [B,U], "text_len": [B]}
    with T snapped to duration buckets and U to token buckets.
    """

    def __init__(
        self,
        dataset: ManifestDataset,
        tokenizer,  # .text_to_ids / CTCDecoding-style vocab
        batch_size: int,
        sample_rate: int = 16000,
        duration_buckets: Sequence[float] = (2, 4, 8, 12, 16, 20, 30),
        token_buckets: Sequence[int] = (32, 64, 128, 256),
        shuffle: bool = True,
        seed: int = 0,
        bucket_by_duration: bool = True,
    ):
        self.ds = dataset
        self.tokenizer = tokenizer
        self.batch_size = batch_size
        self.sample_rate = sample_rate
        self.sample_buckets = [int(b * sample_rate) for b in duration_buckets]
        self.token_buckets = list(token_buckets)
        self.shuffle = shuffle
        self.seed = seed
        self.bucket_by_duration = bucket_by_duration

    def _tokenize(self, text: str) -> List[int]:
        return self.tokenizer.text_to_ids(text)

    def epoch(self, epoch_idx: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        import jax.numpy as jnp

        order = np.arange(len(self.ds))
        if self.shuffle:
            np.random.RandomState(self.seed + epoch_idx).shuffle(order)
        if self.bucket_by_duration:
            order = sorted(order, key=lambda i: self.ds[i].get("duration", 0.0))
            # group sorted entries into batches, then shuffle batch order
            batches = [order[i : i + self.batch_size] for i in range(0, len(order), self.batch_size)]
            np.random.RandomState(self.seed + epoch_idx).shuffle(batches)
        else:
            batches = [order[i : i + self.batch_size] for i in range(0, len(order), self.batch_size)]

        for batch_ids in batches:
            if len(batch_ids) < self.batch_size:
                continue  # drop last ragged batch (static shapes)
            sigs, texts = [], []
            for i in batch_ids:
                e = self.ds[int(i)]
                x, _ = read_wav(e["audio"], target_sr=self.sample_rate)
                sigs.append(x)
                texts.append(self._tokenize(e["text"]))
            T = _bucket_size(max(len(s) for s in sigs), self.sample_buckets)
            U = _bucket_size(max(1, max(len(t) for t in texts)), self.token_buckets)
            audio = np.zeros((self.batch_size, T), np.float32)
            audio_len = np.zeros(self.batch_size, np.int32)
            text = np.zeros((self.batch_size, U), np.int32)
            text_len = np.zeros(self.batch_size, np.int32)
            for b, (s, t) in enumerate(zip(sigs, texts)):
                s = s[:T]
                t = t[:U]
                audio[b, : len(s)] = s
                audio_len[b] = len(s)
                text[b, : len(t)] = t
                text_len[b] = len(t)
            yield {
                "audio": jnp.asarray(audio),
                "audio_len": jnp.asarray(audio_len),
                "text": jnp.asarray(text),
                "text_len": jnp.asarray(text_len),
            }

    def train_batches(self, start_step: int = 0) -> Iterator[Dict]:
        epoch = 0
        skip = start_step
        while True:
            for batch in self.epoch(epoch):
                if skip > 0:
                    skip -= 1
                    continue
                yield batch
            epoch += 1
