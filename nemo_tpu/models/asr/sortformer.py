"""Sortformer: end-to-end neural speaker diarization.

Reference parity: `nemo/collections/asr/models/sortformer_diar_models.py`
(SortformerEncLabelModel): FastConformer encoder → transformer encoder →
per-frame per-speaker sigmoid activities, trained with the hybrid
Sort-Loss + permutation-invariant loss (`asr/losses/sortformer_loss.py`:
arrival-time-ordered targets remove the permutation ambiguity; the PIL term
keeps the best-permutation BCE as a safety net).

TPU-native: PIL enumerates all N! speaker permutations as one batched
gather+BCE (N≤4 → 24 perms, a single vectorized reduction — no Hungarian
host code on the hot path); arrival-order sorting is an argsort on first
-activity frame indices, fully on device.
"""

from __future__ import annotations

import itertools
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from nemo_tpu.core.config import ConfigDict
from nemo_tpu.core.model import Model
from nemo_tpu.models.asr.ctc_models import _mel_cfg_from, build_encoder
from nemo_tpu.ops.audio import mel_spectrogram


class _TransformerBlock(nn.Module):
    d_model: int
    n_heads: int
    ff_mult: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, mask, *, train: bool = False):
        h = nn.LayerNorm(name="ln1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, dropout_rate=self.dropout,
            deterministic=not train, name="mha",
        )(h, h, mask=mask[:, None, None, :])
        x = x + h
        h = nn.LayerNorm(name="ln2")(x)
        h = nn.Dense(self.d_model * self.ff_mult, name="ff1")(h)
        h = nn.relu(h)
        h = nn.Dense(self.d_model, name="ff2")(h)
        return x + h


class _SortformerNet(nn.Module):
    enc_cfg: Any
    feat_in: int
    d_enc: int
    d_model: int = 192
    n_transformer_layers: int = 4
    n_heads: int = 8
    max_speakers: int = 4

    @nn.compact
    def __call__(self, feats, lengths, *, train: bool = False):
        enc, enc_len = build_encoder(ConfigDict(dict(self.enc_cfg)),
                                     self.feat_in, name="encoder")(
            feats, lengths, train=train)
        x = jnp.transpose(enc, (0, 2, 1))  # [B, T, H]
        x = nn.Dense(self.d_model, name="proj")(x)
        T = x.shape[1]
        mask = jnp.arange(T)[None, :] < enc_len[:, None]
        for i in range(self.n_transformer_layers):
            x = _TransformerBlock(self.d_model, self.n_heads,
                                  name=f"tf{i}")(x, mask, train=train)
        logits = nn.Dense(self.max_speakers, name="spk_head")(x)  # [B,T,N]
        return logits, enc_len


def arrival_sort_targets(targets: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Reorder speaker channels by first-activity frame (sortformer's
    arrival-time ordering, sortformer_loss.py sort_targets)."""
    B, T, N = targets.shape
    frames = jnp.arange(T, dtype=jnp.float32)[None, :, None]
    active = targets > 0.5
    first = jnp.where(active, frames, jnp.float32(T + 1)).min(axis=1)  # [B,N]
    order = jnp.argsort(first, axis=-1)  # [B, N]
    return jnp.take_along_axis(targets, order[:, None, :], axis=2)


def _bce(logits, targets):
    return optax.sigmoid_binary_cross_entropy(logits, targets)


def sort_loss(logits, targets, lengths):
    """BCE vs arrival-ordered targets."""
    tgt = arrival_sort_targets(targets, lengths)
    T = logits.shape[1]
    m = (jnp.arange(T)[None, :] < lengths[:, None])[..., None]
    l = _bce(logits, tgt)
    return jnp.sum(jnp.where(m, l, 0.0)) / jnp.maximum(jnp.sum(m), 1)


def pil_loss(logits, targets, lengths):
    """Permutation-invariant BCE: min over all speaker permutations,
    vectorized (one [P,B] reduction, no host Hungarian)."""
    N = logits.shape[-1]
    perms = jnp.asarray(list(itertools.permutations(range(N))))  # [P, N]
    T = logits.shape[1]
    m = (jnp.arange(T)[None, :] < lengths[:, None])[..., None]

    def perm_loss(p):
        tgt = targets[:, :, p]
        l = _bce(logits, tgt)
        return jnp.sum(jnp.where(m, l, 0.0), axis=(1, 2))  # [B]

    losses = jax.vmap(perm_loss)(perms)  # [P, B]
    best = jnp.min(losses, axis=0)
    denom = jnp.maximum(jnp.sum(m, axis=(1, 2)), 1)
    return jnp.mean(best / denom)


class SortformerDiarizer(Model):
    """End-to-end diarization model; `diarize()` → RTTM-style segments."""

    def __init__(self, cfg: Optional[ConfigDict] = None, init_params: bool = True):
        cfg = ConfigDict(cfg or {})
        super().__init__(cfg)
        self.sample_rate = int(cfg.get("sample_rate", 16000))
        self.mel_cfg = _mel_cfg_from(cfg.get("preprocessor", {}))
        self.max_speakers = int(cfg.get("max_speakers", 4))
        self.sort_weight = float(cfg.get("sort_loss_weight", 0.5))
        enc_cfg = cfg.get("encoder", ConfigDict(
            feat_in=self.mel_cfg.features,
            jasper=[{"filters": 64, "repeat": 1, "kernel": 11,
                     "separable": True}]))
        d_enc = int(enc_cfg.get("d_model",
                    enc_cfg.get("jasper", [{"filters": 64}])[-1]["filters"]))
        self.net = _SortformerNet(
            enc_cfg=dict(enc_cfg),
            feat_in=int(enc_cfg.get("feat_in", self.mel_cfg.features)),
            d_enc=d_enc,
            d_model=int(cfg.get("d_model", 192)),
            n_transformer_layers=int(cfg.get("n_transformer_layers", 4)),
            n_heads=int(cfg.get("n_heads", 8)),
            max_speakers=self.max_speakers,
        )
        if init_params:
            feats = jnp.zeros((1, self.mel_cfg.features, 64), jnp.float32)
            self.variables = self.net.init(
                jax.random.PRNGKey(0), feats, jnp.asarray([64]))
        self._jit_fwd = jax.jit(
            lambda v, f, l: self.net.apply(v, f, l, train=False))

    # -- training ------------------------------------------------------------
    def loss(self, variables, feats, lengths, targets, rng=None):
        logits, enc_len = self.net.apply(variables, feats, lengths, train=False)
        sl = sort_loss(logits, targets, enc_len)
        pl = pil_loss(logits, targets, enc_len)
        w = self.sort_weight
        return w * sl + (1 - w) * pl, {"sort": sl, "pil": pl}

    def make_train_step(self, lr: float = 1e-3):
        tx = optax.adamw(lr)
        opt = tx.init(self.variables)

        @jax.jit
        def step(variables, opt_state, feats, lengths, targets):
            (total, parts), g = jax.value_and_grad(
                lambda v: self.loss(v, feats, lengths, targets),
                has_aux=True)(variables)
            up, opt_state = tx.update(g, opt_state, variables)
            return optax.apply_updates(variables, up), opt_state, total, parts

        return step, opt

    # -- inference -----------------------------------------------------------
    def forward_activities(self, audio: np.ndarray) -> Tuple[np.ndarray, int]:
        """audio [T] → per-frame speaker probs [F, N] + frames/sec factor."""
        sig = jnp.asarray(audio, jnp.float32)[None]
        feats, flen = mel_spectrogram(
            sig, jnp.asarray([sig.shape[1]]), self.mel_cfg, training=False)
        logits, enc_len = self._jit_fwd(self.variables, feats, flen)
        probs = jax.nn.sigmoid(logits[0, : int(enc_len[0])])
        return np.asarray(probs), int(enc_len[0])

    def diarize(self, audio: np.ndarray, threshold: float = 0.5,
                min_frames: int = 2) -> List[Dict]:
        """Segments [{'speaker', 'start_frame', 'end_frame'}] per speaker
        (reference sortformer inference → RTTM)."""
        probs, F = self.forward_activities(audio)
        segs = []
        for s in range(probs.shape[1]):
            on = probs[:, s] > threshold
            start = None
            for f in range(F + 1):
                active = f < F and on[f]
                if active and start is None:
                    start = f
                elif not active and start is not None:
                    if f - start >= min_frames:
                        segs.append({"speaker": s, "start_frame": start,
                                     "end_frame": f})
                    start = None
        return segs


class StreamingSortformer:
    """Online diarization over a Sortformer model.

    Reference parity: `asr/models/online_diarizer.py` + the streaming
    sortformer path: audio arrives in chunks; each update re-encodes a
    bounded trailing window (the buffered-streaming pattern — recompute
    rides one jit, cheap at TPU speeds) and emits finalized frame
    activities older than the lookahead. Speaker-label consistency across
    windows is restored by matching the new window's channels to the
    previous output on their overlapping frames (arrival-order alone is
    not stable once early speakers fall out of the window).
    """

    def __init__(self, model: SortformerDiarizer, window_secs: float = 8.0,
                 hop_secs: float = 2.0, sample_rate: int = 16000):
        self.model = model
        self.sr = sample_rate
        self.window = int(window_secs * sample_rate)
        self.hop = int(hop_secs * sample_rate)
        self.reset()

    def reset(self):
        self._audio = np.zeros(0, np.float32)
        self._emitted = 0  # finalized frames
        self._acts: List[np.ndarray] = []  # finalized [N] rows
        self._frames_per_sample: Optional[float] = None
        self._pending = 0

    def _match_channels(self, prev: np.ndarray, new: np.ndarray) -> np.ndarray:
        """Permute new's channels to best match prev on overlapping rows."""
        import itertools

        N = new.shape[1]
        if prev.shape[0] == 0:
            return np.arange(N)
        best, best_score = np.arange(N), -1.0
        for perm in itertools.permutations(range(N)):
            score = float(np.sum(prev * new[:, list(perm)]))
            if score > best_score:
                best_score, best = score, np.array(perm)
        return best

    def push_audio(self, chunk: np.ndarray) -> np.ndarray:
        """Feed samples; returns newly-finalized activity rows [F_new, N]."""
        self._audio = np.concatenate(
            [self._audio, np.asarray(chunk, np.float32)])
        self._pending += len(chunk)
        if self._pending < self.hop:
            return np.zeros((0, self.model.max_speakers), np.float32)
        self._pending = 0

        start = max(0, len(self._audio) - self.window)
        win = self._audio[start:]
        probs, F = self.model.forward_activities(win)
        if self._frames_per_sample is None and len(win):
            self._frames_per_sample = F / len(win)
        fps = self._frames_per_sample or 0.0
        start_frame = int(round(start * fps))
        # overlap region with already-finalized output: frames
        # [start_frame, emitted) exist in both the window and the history
        if self._emitted > start_frame:
            prev = np.stack(self._acts[start_frame:self._emitted])
            perm = self._match_channels(prev, probs[:prev.shape[0]])
        else:
            perm = np.arange(self.model.max_speakers)
        probs = probs[:, perm]
        # finalize frames past the already-emitted point
        new_rows = probs[self._emitted - start_frame:]
        for r in new_rows:
            self._acts.append(r)
        self._emitted = start_frame + probs.shape[0]
        return new_rows

    @property
    def activities(self) -> np.ndarray:
        return (np.stack(self._acts) if self._acts
                else np.zeros((0, self.model.max_speakers), np.float32))
