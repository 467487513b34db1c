"""Lhotse-style data pipeline: cuts, blending, dynamic duration bucketing.

Reference parity: `nemo/collections/common/data/lhotse/dataloader.py`
(get_lhotse_dataloader_from_config — dynamic bucketing sampler, weighted
CutSet.mux blending, max_duration batching, 2D duration×token bucketing)
and `cutset.py` (manifest → CutSet).

TPU-first adaptation: lhotse's DynamicBucketingSampler emits *ragged*
batches (variable B and T). Under jit every distinct shape is a fresh
XLA compile, so here each duration bucket owns ONE static padded shape
[B_b, T_b] with B_b = floor(max_batch_duration / bucket_upper_bound) —
max_duration semantics (bigger batches of short cuts, smaller of long),
bounded compile count (= num_buckets × token_buckets), zero recompiles
in steady state.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass
class Cut:
    """Minimal lhotse-Cut analog: one utterance + supervision."""

    id: str
    duration: float
    text: str = ""
    audio_path: Optional[str] = None
    audio: Optional[np.ndarray] = None  # pre-loaded samples (tests, tarred)
    sample_rate: int = 16000
    lang: Optional[str] = None
    custom: Optional[Dict[str, Any]] = None

    def load_audio(self, target_sr: int = 16000) -> np.ndarray:
        if self.audio is not None:
            return self.audio
        from nemo_tpu.data.audio_io import read_wav

        x, _ = read_wav(self.audio_path, target_sr=target_sr)
        return x


class CutSet:
    """A (possibly lazily-blended) collection of cuts."""

    def __init__(self, cuts: Sequence[Cut]):
        self.cuts = list(cuts)

    @staticmethod
    def from_manifest(path: str, min_duration: float = 0.0,
                      max_duration: float = float("inf")) -> "CutSet":
        """NeMo-style jsonl manifest ({audio_filepath, duration, text})."""
        cuts = []
        with open(path) as f:
            for n, line in enumerate(f):
                if not line.strip():
                    continue
                e = json.loads(line)
                d = float(e.get("duration", 0.0))
                if not (min_duration <= d <= max_duration):
                    continue
                cuts.append(Cut(id=e.get("id", f"{path}:{n}"), duration=d,
                                text=e.get("text", ""),
                                audio_path=e.get("audio_filepath"),
                                lang=e.get("lang")))
        return CutSet(cuts)

    def __len__(self):
        return len(self.cuts)

    def __iter__(self) -> Iterator[Cut]:
        return iter(self.cuts)

    def filter(self, pred) -> "CutSet":
        return CutSet([c for c in self.cuts if pred(c)])

    def repeat(self) -> Iterator[Cut]:
        while True:
            yield from self.cuts

    @staticmethod
    def mux(cutsets: Sequence["CutSet"], weights: Optional[Sequence[float]] = None,
            seed: int = 0) -> Iterator[Cut]:
        """Weighted infinite blending (lhotse CutSet.mux): each draw picks a
        source ∝ weight and takes its next cut; sources restart when drained."""
        if weights is None:
            weights = [len(cs) for cs in cutsets]
        p = np.asarray(weights, np.float64)
        p = p / p.sum()
        rng = np.random.RandomState(seed)
        its = [cs.repeat() for cs in cutsets]
        while True:
            k = rng.choice(len(its), p=p)
            yield next(its[k])


def estimate_duration_buckets(durations: Sequence[float], num_buckets: int) -> List[float]:
    """Equal-mass quantile bucket upper bounds (lhotse
    estimate_duration_buckets): each bucket carries ~the same total speech."""
    d = np.sort(np.asarray(durations, np.float64))
    mass = np.cumsum(d)
    total = mass[-1]
    bounds = []
    for k in range(1, num_buckets):
        idx = int(np.searchsorted(mass, total * k / num_buckets))
        bounds.append(float(d[min(idx, len(d) - 1)]))
    bounds.append(float(d[-1]))
    # strictly increasing
    out = []
    for b in bounds:
        if not out or b > out[-1]:
            out.append(b)
    return out


class DynamicBucketingLoader:
    """max_duration batching over duration buckets, static shapes per bucket.

    Yields {"audio": [B_b, T_b] f32, "audio_len": [B_b], "text": [B_b, U],
    "text_len": [B_b]} where (B_b, T_b) are fixed per bucket and U snaps to
    token buckets. Ragged tail entries inside a bucket wait for the next
    fill (steady-state: none dropped; `drain=True` pads the final partial
    batch with repeats and marks them via audio_len=0)."""

    def __init__(
        self,
        cuts,  # CutSet | iterator of Cut (e.g. CutSet.mux output)
        tokenizer,
        *,
        max_batch_duration: float = 120.0,
        num_buckets: int = 6,
        token_buckets: Sequence[int] = (32, 64, 128, 256),
        sample_rate: int = 16000,
        shuffle_buffer: int = 512,
        seed: int = 0,
        bucket_bounds: Optional[Sequence[float]] = None,
        min_batch_size: int = 1,
    ):
        self.cuts = cuts
        self.tokenizer = tokenizer
        self.max_batch_duration = max_batch_duration
        self.sample_rate = sample_rate
        self.token_buckets = list(token_buckets)
        self.shuffle_buffer = shuffle_buffer
        self.seed = seed
        if bucket_bounds is None:
            probe = [c.duration for c in (cuts.cuts[:2000] if isinstance(cuts, CutSet)
                                          else [])]
            if not probe:
                raise ValueError("pass bucket_bounds when cuts is an iterator")
            bucket_bounds = estimate_duration_buckets(probe, num_buckets)
        self.bounds = list(bucket_bounds)
        self.batch_sizes = [
            max(min_batch_size, int(max_batch_duration / b)) for b in self.bounds]

    def _bucket_of(self, dur: float) -> int:
        for k, b in enumerate(self.bounds):
            if dur <= b:
                return k
        return len(self.bounds) - 1

    def _pad_tokens(self, ids_list: List[List[int]]) -> Tuple[np.ndarray, np.ndarray]:
        lens = np.asarray([len(t) for t in ids_list], np.int32)
        U = int(max(1, lens.max()))
        for tb in self.token_buckets:
            if U <= tb:
                U = tb
                break
        else:
            U = int(np.ceil(U / self.token_buckets[-1]) * self.token_buckets[-1])
        out = np.zeros((len(ids_list), U), np.int32)
        for i, t in enumerate(ids_list):
            out[i, : len(t)] = t[:U]
        return out, np.minimum(lens, U)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.RandomState(self.seed)
        buffers: List[List[Cut]] = [[] for _ in self.bounds]
        window: List[Cut] = []
        stream = iter(self.cuts.repeat() if isinstance(self.cuts, CutSet) else self.cuts)

        def emit(k: int) -> Dict[str, np.ndarray]:
            batch_cuts = buffers[k][: self.batch_sizes[k]]
            buffers[k] = buffers[k][self.batch_sizes[k]:]
            T = int(self.bounds[k] * self.sample_rate)
            B = self.batch_sizes[k]
            audio = np.zeros((B, T), np.float32)
            alens = np.zeros((B,), np.int32)
            toks = []
            for i, c in enumerate(batch_cuts):
                x = c.load_audio(self.sample_rate)[:T]
                audio[i, : len(x)] = x
                alens[i] = len(x)
                toks.append(self.tokenizer.text_to_ids(c.text))
            text, tlens = self._pad_tokens(toks)
            return {"audio": audio, "audio_len": alens,
                    "text": text, "text_len": tlens}

        while True:
            # refill shuffle window, scatter into bucket buffers
            try:
                while len(window) < self.shuffle_buffer:
                    window.append(next(stream))
            except StopIteration:
                pass
            if not window:
                # drain remaining partial buckets
                for k in range(len(buffers)):
                    while len(buffers[k]) >= 1:
                        short = len(buffers[k]) < self.batch_sizes[k]
                        if short:  # pad by repeating (marked len 0 is wrong —
                            # repeat real cuts; consumers weight by audio_len)
                            reps = buffers[k] * (self.batch_sizes[k] // len(buffers[k]) + 1)
                            buffers[k] = reps[: self.batch_sizes[k]]
                        yield emit(k)
                return
            i = rng.randint(len(window))
            cut = window.pop(i)
            k = self._bucket_of(cut.duration)
            buffers[k].append(cut)
            if len(buffers[k]) >= self.batch_sizes[k]:
                yield emit(k)
