"""GPT pretraining dataset + sampler + datamodules.

Reference parity:
- GPTDataset over token bins with epoch-tiled sample/shuffle indices
  (nlp/data/language_modeling/megatron/gpt_dataset.py + helpers.cpp)
- BlendedDataset with weighted mixing (blendable_dataset.py)
- MegatronPretrainingSampler: DP-sharded contiguous batches driven by
  consumed_samples (nemo/lightning/data.py:312), rampup supported by the
  data module
- PreTrainingDataModule / MockDataModule (llm/gpt/data/{pre_training,mock}.py)
  with checkpointable consumed-samples state.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from nemo_tpu.data.indexed_dataset import IndexedDataset
from nemo_tpu.data.native import build_blending_indices, build_sample_idx


class GPTDataset:
    """Maps sample k → seq_length+1 token window over shuffled documents."""

    def __init__(
        self,
        indexed: IndexedDataset,
        seq_length: int,
        num_samples: int,
        seed: int = 0,
    ):
        self.indexed = indexed
        self.seq_length = seq_length
        tokens_per_epoch = indexed.total_tokens
        samples_per_epoch = max((tokens_per_epoch - 1) // seq_length, 1)
        epochs = int(np.ceil(num_samples / samples_per_epoch))
        rng = np.random.RandomState(seed)
        doc_idx = np.concatenate(
            [rng.permutation(len(indexed)) for _ in range(epochs)]
        ).astype(np.int64)
        self.sample_idx = build_sample_idx(
            indexed.sizes, doc_idx, seq_length, min(num_samples, epochs * samples_per_epoch)
        )
        self.doc_idx = doc_idx
        self.shuffle_idx = rng.permutation(len(self.sample_idx) - 1)
        self.num_samples = len(self.shuffle_idx)

    def __len__(self) -> int:
        return self.num_samples

    def __getitem__(self, k: int) -> np.ndarray:
        k = int(self.shuffle_idx[k % self.num_samples])
        (p0, o0), (p1, o1) = self.sample_idx[k], self.sample_idx[k + 1]
        parts = []
        need = self.seq_length + 1
        pos, off = p0, o0
        while need > 0 and pos < len(self.doc_idx):
            doc = self.indexed[int(self.doc_idx[pos])]
            take = doc[off : off + need]
            parts.append(take)
            need -= len(take)
            pos += 1
            off = 0
        out = np.concatenate(parts) if parts else np.zeros(0, np.int32)
        if len(out) < self.seq_length + 1:  # tail clamp
            out = np.pad(out, (0, self.seq_length + 1 - len(out)))
        return out[: self.seq_length + 1].astype(np.int32)


class BlendedDataset:
    """Weighted mix of GPTDatasets (reference blendable_dataset.py)."""

    def __init__(self, datasets: Sequence[GPTDataset], weights: Sequence[float], size: int):
        w = np.asarray(weights, np.float64)
        w = w / w.sum()
        self.datasets = list(datasets)
        self.ds_index, self.ds_sample = build_blending_indices(w, size)
        self.size = size

    def __len__(self) -> int:
        return self.size

    def __getitem__(self, k: int) -> np.ndarray:
        return self.datasets[int(self.ds_index[k])][int(self.ds_sample[k])]


@dataclasses.dataclass
class MegatronPretrainingSampler:
    """Contiguous DP-sharded sample ids per global batch
    (reference data.py:312). Yields index arrays for THIS process.

    rampup_batch_size=[start_gbs, increment, rampup_samples] grows the
    effective GBS linearly in `increment` steps across the first
    `rampup_samples` consumed samples (reference: MegatronDataSampler
    rampup_batch_size / megatron num_microbatches_calculator)."""

    total_samples: int
    global_batch_size: int
    consumed_samples: int = 0
    dp_rank: int = 0
    dp_size: int = 1
    rampup_batch_size: Optional[Sequence[int]] = None

    def current_gbs(self, consumed: int) -> int:
        if not self.rampup_batch_size:
            return self.global_batch_size
        start, incr, ramp_samples = self.rampup_batch_size
        n_incr = max(1, (self.global_batch_size - start) // incr)
        samples_per_incr = max(1, ramp_samples // n_incr)
        gbs = start + incr * (consumed // samples_per_incr)
        return int(min(gbs, self.global_batch_size))

    def __iter__(self) -> Iterator[np.ndarray]:
        cur = self.consumed_samples
        while True:
            gbs = self.current_gbs(cur)
            if cur + gbs > self.total_samples:
                return
            per_rank = gbs // self.dp_size
            start = cur + self.dp_rank * per_rank
            yield np.arange(start, start + per_rank)
            cur += gbs


class PreTrainingDataModule:
    """Bin-backed GPT pretraining data with consumed-samples bookkeeping
    (reference llm/gpt/data/pre_training.py:113)."""

    def __init__(
        self,
        paths,  # prefix or list of (weight, prefix)
        seq_length: int,
        global_batch_size: int,
        micro_batch_size: Optional[int] = None,
        max_steps: int = 10000,
        seed: int = 0,
        dp_rank: int = 0,
        dp_size: int = 1,
    ):
        self.seq_length = seq_length
        self.global_batch_size = global_batch_size
        self.micro_batch_size = micro_batch_size  # per-DP-rank; None = no accum
        num_samples = max_steps * global_batch_size
        if isinstance(paths, (list, tuple)) and paths and isinstance(paths[0], (list, tuple)):
            weights = [w for w, _ in paths]
            ds = [
                GPTDataset(IndexedDataset(p), seq_length, int(num_samples * w * 1.1) + 16, seed)
                for w, p in paths
            ]
            self.dataset = BlendedDataset(ds, weights, num_samples)
        else:
            prefix = paths if isinstance(paths, str) else paths[0]
            self.dataset = GPTDataset(IndexedDataset(prefix), seq_length, num_samples, seed)
        self.dp_rank, self.dp_size = dp_rank, dp_size
        self.consumed_samples = 0

    def _make_batch(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        import jax.numpy as jnp

        rows = np.stack([self.dataset[int(i)] for i in idx])
        tokens = rows[:, :-1]
        labels = rows[:, 1:]
        mbs = self.micro_batch_size
        A = (len(idx) // mbs) if mbs else 1
        shape = (A, mbs, self.seq_length) if A > 1 else (len(idx), self.seq_length)
        return {
            "tokens": jnp.asarray(tokens.reshape(shape)),
            "labels": jnp.asarray(labels.reshape(shape)),
            "loss_mask": jnp.ones(shape, np.float32),
        }

    def train_batches(self, start_step: int = 0):
        self.consumed_samples = start_step * self.global_batch_size
        sampler = MegatronPretrainingSampler(
            total_samples=len(self.dataset),
            global_batch_size=self.global_batch_size,
            consumed_samples=self.consumed_samples,
            dp_rank=self.dp_rank,
            dp_size=self.dp_size,
        )
        for idx in sampler:
            self.consumed_samples += self.global_batch_size
            yield self._make_batch(idx)

    def state_dict(self) -> Dict:
        return {"consumed_samples": self.consumed_samples}

    def load_state_dict(self, sd: Dict):
        self.consumed_samples = int(sd["consumed_samples"])


class MockDataModule:
    """Random-token datamodule (reference llm/gpt/data/mock.py:33)."""

    def __init__(self, seq_length: int, global_batch_size: int, vocab_size: int,
                 micro_batch_size: Optional[int] = None, num_microbatches: int = 1,
                 seed: int = 0):
        self.seq_length = seq_length
        self.global_batch_size = global_batch_size
        self.micro_batch_size = micro_batch_size  # per-DP-rank; None = no accum
        self.num_microbatches = num_microbatches
        self.vocab_size = vocab_size
        self.seed = seed

    def _batch(self, rng):
        import jax.numpy as jnp

        A = self.num_microbatches
        shape = (
            (A, self.micro_batch_size, self.seq_length)
            if A > 1
            else (self.global_batch_size, self.seq_length)
        )
        toks = rng.randint(0, self.vocab_size, shape).astype(np.int32)
        return {
            "tokens": jnp.asarray(toks),
            "labels": jnp.asarray(np.roll(toks, -1, axis=-1)),
            "loss_mask": jnp.ones(shape, np.float32),
        }

    def train_batches(self, start_step: int = 0):
        rng = np.random.RandomState(self.seed + start_step)
        while True:
            yield self._batch(rng)

    def val_batches(self):
        rng = np.random.RandomState(self.seed + 777)
        for _ in range(2):
            yield self._batch(rng)
