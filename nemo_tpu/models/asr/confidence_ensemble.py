"""Confidence-based ASR model ensemble.

Reference parity: `nemo/collections/asr/models/confidence_ensemble.py`
(ConfidenceEnsembleModel — N member models; each utterance is transcribed
by every member, a confidence score is computed from the member's frame
posteriors, and the most confident member's transcript wins) plus the
confidence-measure framework (`asr/parts/utils/asr_confidence_utils.py`:
max-prob and normalized-entropy frame confidence, mean/min/prod
aggregation).

TPU shape: members already produce on-device log-probs; confidence is a
cheap host reduction over the fetched [T, V] posteriors of each utterance.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Union

import numpy as np


def frame_confidence(
    log_probs: np.ndarray,  # [T, V]
    method: str = "entropy_gibbs",
    alpha: float = 0.33,
) -> np.ndarray:
    """Per-frame confidence in [0, 1] (reference asr_confidence_utils
    measures):
      max_prob        — the winning class's probability
      entropy_gibbs   — 1 − H(p)/log V (Gibbs/Shannon, exp-normalized)
      entropy_tsallis — Tsallis-α entropy, normalized to [0,1]
      entropy_renyi   — Rényi-α entropy, normalized to [0,1]
    """
    lp = log_probs.astype(np.float64)
    lp = lp - lp.max(-1, keepdims=True)
    p = np.exp(lp)
    p /= p.sum(-1, keepdims=True)
    V = p.shape[-1]
    if method == "max_prob":
        return p.max(-1)
    if method == "entropy_gibbs":
        h = -(p * np.log(np.maximum(p, 1e-30))).sum(-1)
        return 1.0 - h / np.log(V)
    if method == "entropy_tsallis":
        # S_α = (1 − Σ p^α)/(α − 1); max at uniform: (1 − V^{1−α})/(α − 1)
        s = (1.0 - (p ** alpha).sum(-1)) / (alpha - 1.0)
        s_max = (1.0 - V ** (1.0 - alpha)) / (alpha - 1.0)
        return 1.0 - s / s_max
    if method == "entropy_renyi":
        # H_α = log(Σ p^α)/(1 − α); max at uniform: log V
        h = np.log(np.maximum((p ** alpha).sum(-1), 1e-30)) / (1.0 - alpha)
        return 1.0 - h / np.log(V)
    raise ValueError(f"unknown confidence method: {method}")


def aggregate_confidence(frame_conf: np.ndarray, how: str = "mean") -> float:
    if len(frame_conf) == 0:
        return 0.0
    if how == "mean":
        return float(frame_conf.mean())
    if how == "min":
        return float(frame_conf.min())
    if how == "prod":
        return float(np.exp(np.log(np.maximum(frame_conf, 1e-30)).mean()))
    raise ValueError(f"unknown aggregation: {how}")


@dataclasses.dataclass
class ConfidenceSpec:
    method: str = "entropy_gibbs"
    alpha: float = 0.33
    aggregation: str = "mean"
    exclude_blank: bool = True


class ConfidenceEnsembleModel:
    """Transcribes with every member model and keeps, per utterance, the
    transcript of the member whose posteriors are most confident —
    e.g. one acoustic model per language/domain (the reference's usage).

    Members must expose `forward(signal, length) -> (log_probs, enc_len)`
    and a `decoding` with ids_to_text/blank_id (EncDecCTCModel protocol)."""

    def __init__(self, models: Sequence, confidence: Optional[ConfidenceSpec] = None):
        if not models:
            raise ValueError("need at least one member model")
        self.models = list(models)
        self.confidence = confidence or ConfidenceSpec()
        self.sample_rate = getattr(models[0], "sample_rate", 16000)

    def _score(self, log_probs: np.ndarray, blank_id: int) -> float:
        c = self.confidence
        lp = log_probs
        if c.exclude_blank:
            # score only emitting frames — blank-heavy silence is
            # uninformatively confident for every member
            keep = lp.argmax(-1) != blank_id
            if keep.any():
                lp = lp[keep]
        fc = frame_confidence(lp, c.method, c.alpha)
        return aggregate_confidence(fc, c.aggregation)

    def transcribe(
        self,
        audio: Sequence[Union[str, np.ndarray]],
        batch_size: int = 4,
        return_confidence: bool = False,
    ) -> List:
        """Per-utterance argmax over member confidences."""
        import jax.numpy as jnp

        from nemo_tpu.data.audio_io import read_wav
        from nemo_tpu.ops.ctc import ctc_collapse

        texts = [[None] * len(audio) for _ in self.models]
        confs = np.zeros((len(self.models), len(audio)))
        for start in range(0, len(audio), batch_size):
            batch = audio[start:start + batch_size]
            sigs = []
            for a in batch:
                if isinstance(a, str):
                    x, _ = read_wav(a, target_sr=self.sample_rate)
                else:
                    x = np.asarray(a, np.float32)
                sigs.append(x)
            lens = np.array([len(s) for s in sigs], np.int32)
            pad = int(2 ** np.ceil(np.log2(max(int(lens.max()), 16000))))
            padded = np.zeros((len(sigs), pad), np.float32)
            for i, s in enumerate(sigs):
                padded[i, :len(s)] = s
            for mi, m in enumerate(self.models):
                log_probs, enc_len = m.forward(
                    jnp.asarray(padded), jnp.asarray(lens))
                lp_np = np.asarray(log_probs)
                el = np.asarray(enc_len)
                ids = ctc_collapse(
                    np.argmax(lp_np, -1), el, blank=m.decoding.blank_id)
                for b in range(len(sigs)):
                    texts[mi][start + b] = m.decoding.ids_to_text(ids[b])
                    confs[mi, start + b] = self._score(
                        lp_np[b, : int(el[b])], m.decoding.blank_id)
        pick = confs.argmax(0)
        out = [texts[pick[i]][i] for i in range(len(audio))]
        if return_confidence:
            return [
                {"text": out[i], "model": int(pick[i]),
                 "confidence": float(confs[pick[i], i])}
                for i in range(len(audio))
            ]
        return out
