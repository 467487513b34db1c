"""SpeechLM audio-text data pipeline: manifest QA datasets → SALM batches.

Reference parity: `nemo/collections/speechlm/data/dataset/audio_text_dataset.py`
(AudioTextDataset: jsonl manifests with audio_filepath/duration/context/answer,
optional context_file of random questions, TextProcessing prompt templating,
collation to padded tensors) and `speechlm/data/audio_to_text_module.py`
(the DataModule wrapper with DP sharding + consumed-samples resume).

TPU-first shape: every yielded batch has STATIC shapes — audio length is
snapped to duration buckets and token length to token buckets, so the
jitted SALM train step compiles once per (audio_bucket, token_bucket)
pair instead of once per batch. Batch contract matches
`nemo_tpu.models.speechlm.salm.SALM.loss_fn`:
{audio [B,T], audio_len [B], tokens [B,S], loss_mask [B,S]}.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from nemo_tpu.data.audio_io import read_wav
from nemo_tpu.utils import logging


class SpeechLMManifestDataset:
    """jsonl manifest → (audio path, context, answer, duration) entries.

    Manifest lines (reference audio_text_dataset.py:200):
        {"audio_filepath": "1.wav", "duration": 1.12,
         "context": "what is said?", "answer": "hello world"}

    `context_key`/`answer_key` rename the fields; if an entry has no
    context, one is drawn (deterministically per index) from
    `context_file` — the reference's random-question mechanism.
    """

    def __init__(self, manifest_path: str, context_key: str = "context",
                 answer_key: str = "answer",
                 context_file: Optional[str] = None,
                 max_duration: Optional[float] = None,
                 min_duration: float = 0.05, seed: int = 0):
        self._contexts: List[str] = []
        if context_file:
            with open(context_file) as f:
                self._contexts = [ln.strip() for ln in f if ln.strip()]
        rng = np.random.RandomState(seed)
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
                ctx = e.get(context_key, "")
                if not ctx and self._contexts:
                    ctx = self._contexts[rng.randint(len(self._contexts))]
                # `text` fallback: plain ASR manifests usable as
                # transcription QA (reference answer_key default 'text')
                ans = e.get(answer_key, e.get("text", ""))
                self.entries.append({"audio": path, "context": ctx,
                                     "answer": ans, "duration": dur})
        logging.info(
            f"SpeechLMManifestDataset: {len(self.entries)} entries "
            f"from {manifest_path}")

    def __len__(self):
        return len(self.entries)

    def __getitem__(self, i):
        return self.entries[i]


def _snap(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class SpeechLMDataModule:
    """Batches QA manifest entries into static-shape SALM train batches.

    Prompt layout (reference TextProcessing, text_processing.py):
        [BOS] <prompt_template % context> <answer> [EOS]
    with loss_mask = 1 only on answer(+EOS) tokens. Audio is loaded from
    disk, resampled to `sample_rate`, padded to a duration bucket.

    DP sharding: pass shard_rank/shard_world to give each data-parallel
    rank a disjoint strided slice (reference MegatronDataSampler
    consumed-samples contract: resume via start_step).
    """

    def __init__(self, dataset: SpeechLMManifestDataset, tokenizer,
                 global_batch_size: int,
                 prompt_template: str = "Q: {context} A:",
                 sample_rate: int = 16000,
                 duration_buckets: Sequence[float] = (2, 4, 8, 16, 30),
                 token_buckets: Sequence[int] = (32, 64, 128, 256),
                 shard_rank: int = 0, shard_world: int = 1,
                 shuffle: bool = True, seed: int = 0):
        assert global_batch_size % shard_world == 0
        self.ds = dataset
        self.tokenizer = tokenizer
        self.global_batch_size = global_batch_size
        self.batch_size = global_batch_size // shard_world
        self.prompt_template = prompt_template
        self.sample_rate = sample_rate
        self.sample_buckets = [int(b * sample_rate) for b in duration_buckets]
        self.token_buckets = list(token_buckets)
        self.shard_rank = shard_rank
        self.shard_world = shard_world
        self.shuffle = shuffle
        self.seed = seed
        self.seq_length = self.token_buckets[-1]
        self.micro_batch_size = None

    def _encode(self, e: Dict) -> Dict[str, np.ndarray]:
        tok = self.tokenizer
        prompt = self.prompt_template.format(context=e["context"])
        p_ids = list(tok.text_to_ids(prompt))
        a_ids = list(tok.text_to_ids(" " + e["answer"]))
        bos = getattr(tok, "bos_id", None)
        eos = getattr(tok, "eos_id", None)
        ids = ([bos] if bos is not None else []) + p_ids + a_ids
        mask = [0.0] * (len(ids) - len(a_ids)) + [1.0] * len(a_ids)
        if eos is not None:
            ids.append(eos)
            mask.append(1.0)
        return {"ids": np.asarray(ids, np.int32),
                "mask": np.asarray(mask, np.float32)}

    def _batch(self, idxs: Sequence[int]) -> Dict[str, np.ndarray]:
        audios, texts = [], []
        for i in idxs:
            e = self.ds[int(i)]
            x, _sr = read_wav(e["audio"], target_sr=self.sample_rate)
            audios.append(x.astype(np.float32))
            texts.append(self._encode(e))
        T = _snap(max(len(a) for a in audios), self.sample_buckets)
        S = _snap(max(len(t["ids"]) for t in texts), self.token_buckets)
        B = len(idxs)
        audio = np.zeros((B, T), np.float32)
        audio_len = np.zeros((B,), np.int32)
        tokens = np.zeros((B, S), np.int32)
        loss_mask = np.zeros((B, S), np.float32)
        for b, (a, t) in enumerate(zip(audios, texts)):
            n = min(len(a), T)
            audio[b, :n] = a[:n]
            audio_len[b] = n
            m = min(len(t["ids"]), S)
            tokens[b, :m] = t["ids"][:m]
            loss_mask[b, :m] = t["mask"][:m]
        return {"audio": audio, "audio_len": audio_len,
                "tokens": tokens, "loss_mask": loss_mask}

    def epoch(self, epoch_idx: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.ds))
        rng = np.random.RandomState(self.seed + epoch_idx)
        if self.shuffle:
            rng.shuffle(order)
        # duration-sorted batching within the shuffled epoch: minimizes
        # padding waste per bucket (lhotse-style; asr_dataset.py pattern).
        # Epoch-seeded multiplicative jitter on the sort key keeps rough
        # bucketing while varying BATCH MEMBERSHIP across epochs — a
        # stable sort would otherwise regroup the exact same examples
        # every epoch (reference bucketed sampling has within-bucket
        # randomness).
        durs = np.asarray([self.ds[int(i)]["duration"] for i in order])
        if self.shuffle:
            durs = durs * rng.uniform(0.85, 1.15, len(durs))
        order = order[np.argsort(durs, kind="stable")]
        order = order[self.shard_rank::self.shard_world]
        batches = [order[i:i + self.batch_size]
                   for i in range(0, len(order), self.batch_size)]
        batches = [b for b in batches if len(b) == self.batch_size]
        if self.shuffle:
            np.random.RandomState(self.seed + 7 * epoch_idx + 1).shuffle(batches)
        for b in batches:
            yield self._batch(b)

    def _per_epoch(self) -> int:
        """Batches one epoch() actually yields for THIS shard: rank 0's
        strided slice gets ceil(N/world) examples when N % world != 0, so
        deriving from (N // world) would skip/replay a batch on resume."""
        shard_n = len(range(self.shard_rank, len(self.ds), self.shard_world))
        return max(1, shard_n // self.batch_size)

    def train_batches(self, start_step: int = 0) -> Iterator[Dict]:
        """Infinite epoch-cycling iterator; start_step skips consumed
        batches for AutoResume (MegatronDataSampler analog)."""
        per_epoch = self._per_epoch()
        epoch = start_step // per_epoch
        skip = start_step % per_epoch
        while True:
            for i, b in enumerate(self.epoch(epoch)):
                if epoch == start_step // per_epoch and i < skip:
                    continue
                yield b
            epoch += 1
