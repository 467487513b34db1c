"""Audio-to-audio data pipeline: paired-signal manifests → static batches.

Reference parity: `nemo/collections/audio/data/audio_to_audio.py`
(AudioToTargetDataset: jsonl manifests mapping input/target audio files;
AudioToTargetWithReferenceDataset adds a reference signal — e.g. an
enrollment utterance for target-speaker extraction; multichannel wavs
supported) and `audio_to_audio_dataset.py` factories.

TPU-first shape: every batch snaps sample length to duration buckets so
the jitted enhancement train step (batch contract
`nemo_tpu.models.audio.train`: {"noisy" [B,T] or [B,T,C], "clean"
[B,T]}) compiles once per bucket. Random fixed-length crops (`audio_duration`,
the reference's random_offset+audio_duration) make every example the
same static shape within an epoch.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterator, Optional, Sequence

import numpy as np

from nemo_tpu.data.audio_io import read_wav
from nemo_tpu.utils import logging


class AudioPairManifestDataset:
    """jsonl manifest → (input path, target path, optional reference
    path, duration). Manifest line (reference audio_to_audio.py):
        {"input_filepath": "noisy/1.wav", "target_filepath": "clean/1.wav",
         "duration": 2.1}
    `input_key`/`target_key`/`reference_key` rename fields (the
    reference's input_cfg mapping)."""

    def __init__(self, manifest_path: str,
                 input_key: str = "input_filepath",
                 target_key: str = "target_filepath",
                 reference_key: Optional[str] = None,
                 max_duration: Optional[float] = None,
                 min_duration: float = 0.05):
        self.entries = []
        base = os.path.dirname(os.path.abspath(manifest_path))

        def absolutize(p):
            return p if os.path.isabs(p) else os.path.join(base, p)

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
                ent = {"input": absolutize(e[input_key]),
                       "target": absolutize(e[target_key]),
                       "duration": dur}
                if reference_key and reference_key in e:
                    ent["reference"] = absolutize(e[reference_key])
                self.entries.append(ent)
        if reference_key:
            # all-or-none: a mixed manifest would np.stack a reference
            # batch with fewer rows than noisy/clean — silently misaligned
            n_ref = sum("reference" in e for e in self.entries)
            if 0 < n_ref < len(self.entries):
                raise ValueError(
                    f"manifest {manifest_path}: reference_key="
                    f"'{reference_key}' present on {n_ref}/"
                    f"{len(self.entries)} entries — must be all or none")
        logging.info(f"AudioPairManifestDataset: {len(self.entries)} "
                     f"entries from {manifest_path}")

    def __len__(self):
        return len(self.entries)

    def __getitem__(self, i):
        return self.entries[i]


class AudioToAudioDataModule:
    """Batches paired-audio manifest entries into static-shape train
    batches for the enhancement stacks.

    audio_duration: crop/pad every signal to this many seconds (random
    crop offset per example when training — reference random_offset).
    Yields {"noisy" [B,T], "clean" [B,T]} (+ "reference" [B,Tr] when the
    dataset carries one). Multichannel inputs keep their channel axis:
    [B,T,C] (the multichannel beamforming stacks' contract)."""

    def __init__(self, dataset: AudioPairManifestDataset,
                 global_batch_size: int,
                 audio_duration: float = 2.0,
                 reference_duration: Optional[float] = None,
                 sample_rate: int = 16000,
                 multichannel_input: bool = False,
                 shard_rank: int = 0, shard_world: int = 1,
                 shuffle: bool = True, seed: int = 0):
        assert global_batch_size % shard_world == 0
        self.ds = dataset
        self.global_batch_size = global_batch_size
        self.batch_size = global_batch_size // shard_world
        self.T = int(audio_duration * sample_rate)
        self.Tr = int((reference_duration or audio_duration) * sample_rate)
        self.sample_rate = sample_rate
        self.multichannel_input = multichannel_input
        self.shard_rank = shard_rank
        self.shard_world = shard_world
        self.shuffle = shuffle
        self.seed = seed
        self.micro_batch_size = None

    def _load(self, path: str, T: int, rng, offset_frac: float,
              mono: bool = True) -> np.ndarray:
        x, _sr = read_wav(path, target_sr=self.sample_rate, mono=mono)
        if x.ndim == 1 and len(x) > T:
            off = int(offset_frac * (len(x) - T))
            x = x[off:off + T]
        elif x.ndim == 2 and x.shape[0] > T:  # [T, C] multichannel
            off = int(offset_frac * (x.shape[0] - T))
            x = x[off:off + T]
        pad = T - x.shape[0]
        if pad > 0:
            width = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            x = np.pad(x, width)
        return x.astype(np.float32)

    def _batch(self, idxs: Sequence[int], rng) -> Dict[str, np.ndarray]:
        noisy, clean, refs = [], [], []
        for i in idxs:
            e = self.ds[int(i)]
            # same crop offset for input and target: they are time-aligned
            off = float(rng.rand()) if self.shuffle else 0.0
            noisy.append(self._load(e["input"], self.T, rng, off,
                                    mono=not self.multichannel_input))
            clean.append(self._load(e["target"], self.T, rng, off))
            if "reference" in e:
                refs.append(self._load(e["reference"], self.Tr, rng,
                                       float(rng.rand())))
        batch = {"noisy": np.stack(noisy), "clean": np.stack(clean)}
        if refs:
            batch["reference"] = np.stack(refs)
        return batch

    def epoch(self, epoch_idx: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.RandomState(self.seed + epoch_idx)
        order = np.arange(len(self.ds))
        if self.shuffle:
            rng.shuffle(order)
        order = order[self.shard_rank::self.shard_world]
        for i in range(0, len(order) - self.batch_size + 1, self.batch_size):
            yield self._batch(order[i:i + self.batch_size], rng)

    def train_batches(self, start_step: int = 0) -> Iterator[Dict]:
        # count from the ACTUAL strided shard slice: rank 0 gets
        # ceil(N/world) examples when N % world != 0, and a mismatched
        # per_epoch skips/replays a batch on resume
        shard_n = len(range(self.shard_rank, len(self.ds), self.shard_world))
        per_epoch = max(1, shard_n // self.batch_size)
        epoch = start_step // per_epoch
        skip = start_step % per_epoch
        while True:
            for i, b in enumerate(self.epoch(epoch)):
                if epoch == start_step // per_epoch and i < skip:
                    continue
                yield b
            epoch += 1
