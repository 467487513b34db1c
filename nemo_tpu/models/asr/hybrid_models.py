"""Hybrid RNNT+CTC model (shared encoder, two decoders).

Reference parity: EncDecHybridRNNTCTCModel
(`asr/models/hybrid_rnnt_ctc_models.py`): one encoder feeding both a
transducer head (primary) and a CTC head (auxiliary), trained with
loss = rnnt + ctc_weight·ctc; decoding can use either head
(`change_decoding_strategy` equivalent via `decode_with`).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from nemo_tpu.core.config import ConfigDict
from nemo_tpu.models.asr.ctc_models import _bucket
from nemo_tpu.models.asr.modules.conv_asr import ConvASRDecoder
from nemo_tpu.models.asr.parts.ctc_decoding import CTCDecoding
from nemo_tpu.models.asr.rnnt_models import EncDecRNNTModel, _RNNTNet
from nemo_tpu.ops.ctc import ctc_loss_mean
from nemo_tpu.ops.audio import mel_spectrogram

import flax.linen as nn


class _HybridNet(_RNNTNet):
    """RNNT net + auxiliary CTC decoder over the shared encoder."""

    def setup(self):
        super().setup()
        self.ctc_decoder = ConvASRDecoder(
            feat_in=self.enc_out, num_classes=self.vocab_size
        )

    def ctc_log_probs(self, feats, lengths, train: bool = False):
        enc, enc_len = self.encoder(feats, lengths, train=train)
        return self.ctc_decoder(enc), enc_len

    def init_all(self, feats, lengths, targets):
        """Init path touching every submodule (both heads)."""
        out = self(feats, lengths, targets)
        ctc = self.ctc_log_probs(feats, lengths)
        return out, ctc


class EncDecHybridRNNTCTCModel(EncDecRNNTModel):
    def __init__(self, cfg: ConfigDict, init_params: bool = True):
        cfg = ConfigDict(cfg)
        self.ctc_weight = float(cfg.get("aux_ctc", {}).get("ctc_loss_weight", 0.3))
        super().__init__(cfg, init_params=False)
        # swap net class for the hybrid variant (same fields)
        self.net = _HybridNet(
            enc_cfg=self.net.enc_cfg,
            feat_in=self.net.feat_in,
            enc_out=self.net.enc_out,
            vocab_size=self.net.vocab_size,
            pred_hidden=self.net.pred_hidden,
            pred_rnn_layers=self.net.pred_rnn_layers,
            joint_hidden=self.net.joint_hidden,
            num_durations=self.net.num_durations,
        )
        self.ctc_decoding = CTCDecoding(self.labels)
        self.decode_with = "rnnt"  # or "ctc"
        if init_params:
            feats = jnp.zeros((1, self.mel_cfg.features, 128), jnp.float32)
            lens = jnp.array([128], jnp.int32)
            tgt = jnp.zeros((1, 4), jnp.int32)
            self.variables = self.net.init(
                jax.random.PRNGKey(0), feats, lens, tgt, method=_HybridNet.init_all
            )
        self._jit_decode = jax.jit(self._decode_fn)
        self._jit_logits = jax.jit(self._logits_fn)
        self._jit_ctc = jax.jit(self._ctc_fn)

    def _ctc_fn(self, variables, signal, length):
        feats, feat_len = mel_spectrogram(signal, length, self.mel_cfg, training=False)
        return self.net.apply(
            variables, feats, feat_len, train=False, method=_HybridNet.ctc_log_probs
        )

    def hybrid_loss(self, rnnt_logits, ctc_log_probs, targets, enc_len, target_len):
        """rnnt + w·ctc (reference hybrid training_step)."""
        rnnt = self.loss(rnnt_logits, targets, enc_len, target_len)
        ctc = ctc_loss_mean(ctc_log_probs, enc_len, targets, target_len)
        return rnnt + self.ctc_weight * ctc, {"rnnt_loss": rnnt, "ctc_loss": ctc}

    def transcribe(self, audio, batch_size: int = 4) -> List[str]:
        if self.decode_with == "rnnt":
            return super().transcribe(audio, batch_size)
        from nemo_tpu.data.audio_io import read_wav

        results = []
        for start in range(0, len(audio), batch_size):
            batch = audio[start : start + batch_size]
            sigs = [
                read_wav(a, target_sr=self.sample_rate)[0] if isinstance(a, str)
                else np.asarray(a, np.float32)
                for a in batch
            ]
            lens = np.array([len(s) for s in sigs], np.int32)
            pad_len = _bucket(int(lens.max()))
            padded = np.zeros((batch_size, pad_len), np.float32)
            for i, s in enumerate(sigs):
                padded[i, : len(s)] = s
            full = np.ones(batch_size, np.int32)
            full[: len(sigs)] = lens
            lp, el = self._jit_ctc(self.variables, jnp.asarray(padded), jnp.asarray(full))
            results.extend(self.ctc_decoding.decode(lp[: len(sigs)], el[: len(sigs)]))
        return results
