"""RNNT ASR models (Conformer-Transducer / ContextNet style).

Reference parity: EncDecRNNTModel (`asr/models/rnnt_models.py`) — encoder +
prediction + joint, transcribe() via batched greedy decoding
(`rnnt_greedy_decoding.py:529`), loss = RNNT NLL (`losses/rnnt.py`).
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nemo_tpu.core.config import ConfigDict
from nemo_tpu.core.model import Model
from nemo_tpu.data.audio_io import read_wav
from nemo_tpu.models.asr.ctc_models import _bucket, _mel_cfg_from, build_encoder
from nemo_tpu.models.asr.modules.rnnt import (
    PredictionNetwork,
    RNNTJoint,
    rnnt_beam_decode,
    rnnt_greedy_decode,
    rnnt_greedy_decode_label_looping,
)
from nemo_tpu.ops.audio import mel_spectrogram
from nemo_tpu.ops.rnnt import rnnt_loss_mean
from nemo_tpu.ops.tdt import tdt_greedy_decode, tdt_loss


class _RNNTNet(nn.Module):
    enc_cfg: Any  # dict
    feat_in: int
    enc_out: int
    vocab_size: int
    pred_hidden: int
    pred_rnn_layers: int
    joint_hidden: int
    num_durations: int = 0  # >0 → TDT
    num_big_blanks: int = 0  # >0 → multiblank RNNT

    def setup(self):
        self.encoder = build_encoder(ConfigDict(dict(self.enc_cfg)), self.feat_in)
        self.prediction = PredictionNetwork(
            vocab_size=self.vocab_size,
            pred_hidden=self.pred_hidden,
            pred_rnn_layers=self.pred_rnn_layers,
        )
        self.joint = RNNTJoint(num_classes=self.vocab_size, joint_hidden=self.joint_hidden,
                               num_durations=self.num_durations,
                               num_big_blanks=self.num_big_blanks)

    def encode(self, feats, lengths, train: bool = False):
        enc, enc_len = self.encoder(feats, lengths, train=train)
        return jnp.transpose(enc, (0, 2, 1)), enc_len  # [B, T, H]

    def encode_stream(self, feats, lengths, cache):
        """Cache-aware streaming encode (conformer only)."""
        enc, enc_len, new_cache = self.encoder(feats, lengths, train=False,
                                               cache=cache)
        return jnp.transpose(enc, (0, 2, 1)), enc_len, new_cache

    def predict(self, targets, train: bool = False):
        return self.prediction(targets, train=train)  # [B, U+1, H]

    def pred_step(self, token, state):
        return self.prediction.step(token, state)

    def joint_logits(self, enc, pred, train: bool = False):
        return self.joint(enc, pred, train=train)

    def __call__(self, feats, lengths, targets, train: bool = False):
        """Training path: full joint logits [B, T, U+1, V+1]."""
        enc, enc_len = self.encode(feats, lengths, train=train)
        pred = self.predict(targets, train=train)
        logits = self.joint(enc[:, :, None, :], pred[:, None, :, :], train=train)
        return logits, enc_len

    def fused_blank_label(self, feats, lengths, targets, train: bool = False,
                          chunk: int = 32):
        """Memory-chunked training path: (lp_blank, lp_label) [B,T,U+1]
        without the [B,T,U+1,V+1] joint (the DEFAULT loss producer —
        Conformer-Transducer-L at realistic T/U does not fit the full
        joint; reference memory-chunked RNNTJoint rnnt.py:1280)."""
        enc, enc_len = self.encode(feats, lengths, train=train)
        pred = self.predict(targets, train=train)
        lp_b, lp_l = self.joint.fused_log_probs(enc, pred, targets, chunk)
        return lp_b, lp_l, enc_len


class EncDecRNNTModel(Model):
    """Config contract mirrors the reference RNNT YAMLs:
    model.{labels, preprocessor, encoder, decoder{pred_hidden, pred_rnn_layers},
    joint{joint_hidden}}."""

    def __init__(self, cfg: ConfigDict, init_params: bool = True):
        super().__init__(cfg)
        cfg = self.cfg
        self.sample_rate = int(cfg.get("sample_rate", 16000))
        self.mel_cfg = _mel_cfg_from(cfg.get("preprocessor", {}))
        labels = cfg.get("labels") or cfg.get("decoder", {}).get("vocabulary")
        self.labels = list(labels)
        self.blank_id = len(self.labels)
        enc_cfg = cfg.encoder
        if "d_model" in enc_cfg:
            enc_out = int(enc_cfg.d_model)
        else:
            enc_out = int(enc_cfg.jasper[-1]["filters"])
        dec_cfg = cfg.get("decoder", ConfigDict())
        joint_cfg = cfg.get("joint", ConfigDict())
        dec_strategy = cfg.get("decoding", {})
        self.max_symbols = int(dec_strategy.get("max_symbols", 10))
        # strategy: greedy_batch (label-looping, default) | greedy (frame
        # loop) | beam (batched ALSD)
        self.decoding_strategy = str(dec_strategy.get("strategy", "greedy_batch"))
        self.beam_size = int(dec_strategy.get("beam", {}).get("beam_size", 4)
                             if hasattr(dec_strategy.get("beam", {}), "get")
                             else 4)
        # n-gram shallow fusion (reference: decoding.beam.ngram_lm_model /
        # ngram_lm_alpha); attach at runtime with set_ngram_lm()
        self.ngram_lm = None
        self.ngram_lm_weight = float(dec_strategy.get("beam", {}).get(
            "ngram_lm_alpha", 0.0) if hasattr(dec_strategy.get("beam", {}),
                                              "get") else 0.0)
        # TDT support (reference fastconformer-TDT): model_defaults.tdt_durations
        self.durations = tuple(cfg.get("model_defaults", {}).get("tdt_durations", ()))
        # multiblank RNNT (reference multiblank big_blank_durations)
        self.big_blank_durations = tuple(
            cfg.get("model_defaults", {}).get("big_blank_durations", ()))
        self.net = _RNNTNet(
            enc_cfg=enc_cfg.to_dict(),
            feat_in=int(enc_cfg.get("feat_in", self.mel_cfg.features)),
            enc_out=enc_out,
            vocab_size=len(self.labels),
            pred_hidden=int(dec_cfg.get("pred_hidden", 640)),
            pred_rnn_layers=int(dec_cfg.get("pred_rnn_layers", 1)),
            joint_hidden=int(joint_cfg.get("joint_hidden", 640)),
            num_durations=len(self.durations),
            num_big_blanks=len(self.big_blank_durations),
        )
        if init_params:
            self._init_params()
        self._jit_decode = jax.jit(self._decode_fn)
        self._jit_logits = jax.jit(self._logits_fn)

    def set_ngram_lm(self, lm, weight: float = 0.3,
                     strategy: str = "beam") -> None:
        """Attach an `ops.ngram_lm.NGramLM` for shallow fusion in beam
        decoding (reference: `decoding.beam.ngram_lm_model` +
        `ngram_lm_alpha`). Re-jits the decode path so the LM tables are
        captured as constants."""
        self.ngram_lm = lm
        self.ngram_lm_weight = float(weight)
        self.decoding_strategy = strategy
        self._jit_decode = jax.jit(self._decode_fn)

    def _init_params(self, seed: int = 0):
        feats = jnp.zeros((1, self.mel_cfg.features, 128), jnp.float32)
        lens = jnp.array([128], jnp.int32)
        tgt = jnp.zeros((1, 4), jnp.int32)
        self.variables = self.net.init(
            jax.random.PRNGKey(seed), feats, lens, tgt, train=False
        )

    # -- training -----------------------------------------------------------
    def _logits_fn(self, variables, signal, length, targets):
        feats, feat_len = mel_spectrogram(signal, length, self.mel_cfg, training=False)
        return self.net.apply(variables, feats, feat_len, targets, train=False)

    def loss_fused(self, variables, signal, length, targets, target_len,
                   chunk: int = 32):
        """DEFAULT training loss: memory-chunked joint → assoc-scan DP.
        Peak memory is one [B, chunk, U+1, V+1] tile instead of the full
        [B, T, U+1, V+1] joint (plain RNNT only; TDT/multiblank gather
        more than two planes and keep the full-joint path)."""
        from nemo_tpu.ops.rnnt import rnnt_loss_from_log_probs

        if self.big_blank_durations or self.durations:
            logits, enc_len = self._logits_fn(variables, signal, length, targets)
            return self.loss(logits, targets, enc_len, target_len)
        feats, feat_len = mel_spectrogram(signal, length, self.mel_cfg,
                                          training=False)
        lp_b, lp_l, enc_len = self.net.apply(
            variables, feats, feat_len, targets, chunk=chunk,
            method=_RNNTNet.fused_blank_label)
        nll = rnnt_loss_from_log_probs(lp_b, lp_l, enc_len, target_len + 1)
        return jnp.mean(nll)

    def make_train_step(self, lr: float = 1e-3, chunk: int = 32):
        """Jitted transducer train step over the memory-chunked loss."""
        import optax

        tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adamw(lr))
        loss_fused = self.loss_fused

        @jax.jit
        def train_step(variables, opt_state, signal, length, targets, target_len):
            def f(v):
                return loss_fused(v, signal, length, targets, target_len,
                                  chunk=chunk)

            loss, grads = jax.value_and_grad(f)(variables)
            updates, opt_state = tx.update(grads, opt_state, variables)
            return optax.apply_updates(variables, updates), opt_state, loss

        return tx, train_step

    def loss(self, logits, targets, enc_len, target_len):
        if self.big_blank_durations:
            from nemo_tpu.ops.multiblank import multiblank_rnnt_loss
            import jax.numpy as _jnp

            nll = multiblank_rnnt_loss(logits, targets, enc_len, target_len,
                                       self.big_blank_durations)
            return _jnp.mean(nll)
        if self.durations:
            tok, dur = logits
            nll = tdt_loss(tok, dur, targets, enc_len, target_len, self.durations)
            import jax.numpy as _jnp

            return _jnp.mean(nll)
        return rnnt_loss_mean(logits, targets, enc_len, target_len)

    # -- inference ----------------------------------------------------------
    def _decode_fn(self, variables, signal, length):
        if signal.dtype == jnp.int16:
            # raw 16-bit PCM (half the host→device bytes; exact)
            signal = signal.astype(jnp.float32) / 32768.0
        feats, feat_len = mel_spectrogram(signal, length, self.mel_cfg, training=False)
        enc, enc_len = self.net.apply(
            variables, feats, feat_len, train=False, method=_RNNTNet.encode
        )

        def joint_fn(enc_t, pred_out):
            return self.net.apply(
                variables, enc_t, pred_out, method=_RNNTNet.joint_logits
            )

        def pred_step_fn(token, state):
            return self.net.apply(variables, token, state, method=_RNNTNet.pred_step)

        B = enc.shape[0]
        zeros = jnp.zeros((B, self.net.pred_hidden), jnp.float32)
        state0 = tuple((zeros, zeros) for _ in range(self.net.pred_rnn_layers))
        if self.big_blank_durations:
            from nemo_tpu.ops.multiblank import multiblank_greedy_decode

            tokens, counts = multiblank_greedy_decode(
                joint_fn, pred_step_fn, state0, enc, enc_len, self.blank_id,
                self.big_blank_durations, self.max_symbols,
            )
        elif self.durations:
            tokens, counts = tdt_greedy_decode(
                joint_fn, pred_step_fn, state0, enc, enc_len, self.blank_id,
                self.durations,
            )
        elif self.decoding_strategy == "beam":
            tokens, counts, _ = rnnt_beam_decode(
                joint_fn, pred_step_fn, state0, enc, enc_len, self.blank_id,
                beam_size=self.beam_size, max_symbols=self.max_symbols,
                lm=self.ngram_lm, lm_weight=self.ngram_lm_weight,
            )
        elif self.decoding_strategy == "maes":
            from nemo_tpu.models.asr.modules.rnnt import rnnt_beam_decode_maes

            tokens, counts, _ = rnnt_beam_decode_maes(
                joint_fn, pred_step_fn, state0, enc, enc_len, self.blank_id,
                beam_size=self.beam_size,
            )
        elif self.decoding_strategy == "greedy":
            tokens, counts = rnnt_greedy_decode(
                joint_fn, pred_step_fn, state0, enc, enc_len, self.blank_id,
                self.max_symbols,
            )
        else:  # greedy_batch: label-looping fast path (reference default)
            tokens, counts = rnnt_greedy_decode_label_looping(
                joint_fn, pred_step_fn, state0, enc, enc_len, self.blank_id,
                self.max_symbols,
            )
        return tokens, counts

    def _decode_aligned_fn(self, variables, signal, length):
        """Greedy decode that also returns per-token (frame, logp)."""
        from nemo_tpu.models.asr.modules.rnnt import (
            rnnt_greedy_decode_with_alignments)

        feats, feat_len = mel_spectrogram(signal, length, self.mel_cfg,
                                          training=False)
        enc, enc_len = self.net.apply(
            variables, feats, feat_len, train=False, method=_RNNTNet.encode)

        def joint_fn(enc_t, pred_out):
            return self.net.apply(
                variables, enc_t, pred_out, method=_RNNTNet.joint_logits)

        def pred_step_fn(token, state):
            return self.net.apply(variables, token, state,
                                  method=_RNNTNet.pred_step)

        B = enc.shape[0]
        zeros = jnp.zeros((B, self.net.pred_hidden), jnp.float32)
        state0 = tuple((zeros, zeros) for _ in range(self.net.pred_rnn_layers))
        return rnnt_greedy_decode_with_alignments(
            joint_fn, pred_step_fn, state0, enc, enc_len, self.blank_id,
            self.max_symbols)

    def transcribe_with_timestamps(
        self, audio: Sequence[Union[str, np.ndarray]], batch_size: int = 4
    ) -> List[dict]:
        """Greedy transcription with per-token encoder-frame timestamps
        and confidence (joint softmax prob of the emitted token) —
        reference: rnnt_greedy_decoding.py preserve_alignments /
        preserve_frame_confidence hypotheses."""
        if not hasattr(self, "_jit_decode_aligned"):
            self._jit_decode_aligned = jax.jit(self._decode_aligned_fn)
        results: List[dict] = []
        for start in range(0, len(audio), batch_size):
            batch = audio[start : start + batch_size]
            sigs = []
            for a in batch:
                if isinstance(a, str):
                    x, _ = read_wav(a, target_sr=self.sample_rate)
                else:
                    x = np.asarray(a, np.float32)
                sigs.append(x)
            lens = np.array([len(s) for s in sigs], np.int32)
            pad_len = _bucket(int(lens.max()))
            padded = np.zeros((batch_size, pad_len), np.float32)
            for i, s in enumerate(sigs):
                padded[i, : len(s)] = s
            full_lens = np.ones(batch_size, np.int32)
            full_lens[: len(sigs)] = lens
            tokens, counts, frames, logps = self._jit_decode_aligned(
                self.variables, jnp.asarray(padded), jnp.asarray(full_lens))
            tokens, counts, frames, logps = jax.device_get(
                (tokens, counts, frames, logps))
            for b in range(len(sigs)):
                n = int(counts[b])
                ids = tokens[b, :n]
                results.append({
                    "text": "".join(self.labels[i] for i in ids),
                    "tokens": ids.tolist(),
                    "timestamps": frames[b, :n].tolist(),
                    "confidence": np.exp(logps[b, :n]).tolist(),
                })
        return results

    def transcribe(
        self, audio: Sequence[Union[str, np.ndarray]], batch_size: int = 4
    ) -> List[str]:
        results: List[str] = []
        for start in range(0, len(audio), batch_size):
            batch = audio[start : start + batch_size]
            sigs = []
            for a in batch:
                if isinstance(a, str):
                    x, _ = read_wav(a, target_sr=self.sample_rate)
                else:
                    x = np.asarray(a, np.float32)
                sigs.append(x)
            lens = np.array([len(s) for s in sigs], np.int32)
            pad_len = _bucket(int(lens.max()))
            padded = np.zeros((batch_size, pad_len), np.float32)
            for i, s in enumerate(sigs):
                padded[i, : len(s)] = s
            full_lens = np.ones(batch_size, np.int32)
            full_lens[: len(sigs)] = lens
            tokens, counts = self._jit_decode(
                self.variables, jnp.asarray(padded), jnp.asarray(full_lens)
            )
            tokens, counts = jax.device_get((tokens, counts))
            for b in range(len(sigs)):
                ids = tokens[b, : counts[b]]
                results.append("".join(self.labels[i] for i in ids))
        return results

    def transcribe_staged(self, staged) -> List[str]:
        """Full RNNT transcription over device-resident PCM batches.

        staged: sequence of (signal [B,T] int16/f32 jax.Array already on
        device, lengths [B], n_valid). Identical pipeline to transcribe()
        minus the host→device upload — the reference's local-disk harness
        topology (transcribe_speech.py RTFx protocol); host text assembly
        of batch i−1 overlaps the device decoding batch i."""
        results: List[str] = []
        pending = None

        def drain():
            nonlocal pending
            if pending is None:
                return
            tokens, counts, n = pending
            pending = None
            # one batched fetch (two np.asarray calls = two relay RTTs)
            tokens, counts = jax.device_get((tokens, counts))
            for b in range(n):
                ids = tokens[b, : counts[b]]
                results.append("".join(self.labels[i] for i in ids))

        for sig, lens, n in staged:
            tokens, counts = self._jit_decode(self.variables, sig, lens)
            drain()
            pending = (tokens, counts, n)
        drain()
        return results
