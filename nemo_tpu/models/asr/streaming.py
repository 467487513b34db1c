"""Streaming transcription (buffered, cache-free).

Reference parity: the buffered/chunked streaming inference path
(`asr/parts/utils/streaming_utils.py` FrameBatchASR and the cache-aware
streaming configs, conformer_encoder.py:927-1073). This implementation uses
overlapping buffers — each `push(chunk)` re-encodes [left-context | chunk |
lookahead] and emits only the tokens whose receptive field is complete, so
with a causal/limited-context encoder the streaming transcript EQUALS the
offline transcript (tested); no recurrent caches needed (recompute rides the
same jit program, an acceptable trade at TPU speeds — SURVEY §2.9's stance
on CUDA-graph-style state).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

import jax.numpy as jnp

from nemo_tpu.models.asr.ctc_models import EncDecCTCModel


class BufferedStreamingCTC:
    """Push audio chunks, pull incremental text.

    For exact streaming==offline equivalence the model should use
    normalize='none' features and a limited/causal attention context
    (att_context_size=(L, 0)); with lookahead > 0 a small emission delay
    buys exactness for the non-causal subsampling convs.
    """

    def __init__(
        self,
        model: EncDecCTCModel,
        chunk_secs: float = 1.0,
        left_secs: float = 4.0,
        lookahead_secs: float = 0.32,
    ):
        self.model = model
        sr = model.sample_rate
        self.chunk = int(chunk_secs * sr)
        self.left = int(left_secs * sr)
        self.lookahead = int(lookahead_secs * sr)
        self.reset()

    def reset(self):
        self._audio = np.zeros(0, np.float32)
        self._emitted_frames = 0  # encoder frames already emitted
        self._ids: List[int] = []
        self._last_token = -1  # for cross-chunk CTC dedup

    def _subsampling_factor(self) -> int:
        enc_cfg = self.model.cfg.encoder
        if "d_model" in enc_cfg:
            return int(enc_cfg.get("subsampling_factor", 4))
        stride = 1
        for blk in enc_cfg.get("jasper", []):
            sv = blk.get("stride", 1)
            stride *= sv[0] if isinstance(sv, (list, tuple)) else sv
        return stride

    def _frames_for_samples(self, n: int) -> int:
        """Exact encoder frame count for the first n samples (matches the
        model's length formulas)."""
        from nemo_tpu.ops.audio import mel_seq_len

        m = int(np.asarray(mel_seq_len(self.model.mel_cfg, jnp.array([n]))[0]))
        enc_cfg = self.model.cfg.encoder
        if "d_model" in enc_cfg:
            import math

            n_layers = int(math.log2(int(enc_cfg.get("subsampling_factor", 4))))
            for _ in range(n_layers):
                m = (m - 1) // 2 + 1
            return m
        from nemo_tpu.models.asr.modules.conv_asr import conv_out_length

        for blk in enc_cfg.get("jasper", []):
            sv = blk.get("stride", 1)
            sv = sv[0] if isinstance(sv, (list, tuple)) else sv
            kv = blk.get("kernel", 11)
            kv = kv[0] if isinstance(kv, (list, tuple)) else kv
            dv = blk.get("dilation", 1)
            dv = dv[0] if isinstance(dv, (list, tuple)) else dv
            m = int(np.asarray(conv_out_length(jnp.array([m]), kv, sv, dv)[0]))
        return m

    def push(self, chunk: np.ndarray) -> str:
        """Feed `chunk` samples; returns newly-finalized text."""
        self._audio = np.concatenate([self._audio, np.asarray(chunk, np.float32)])
        # frames finalizable now: receptive field complete up to len - lookahead
        usable = len(self._audio) - self.lookahead
        if usable <= 0:
            return ""
        target_frames = self._frames_for_samples(usable)
        if target_frames <= self._emitted_frames:
            return ""
        # run on a window ending at the current audio, bounded left context;
        # snap start to a full-subsampling-stride multiple of the mel hop so
        # window frames align exactly with full-signal frames
        start = max(0, len(self._audio) - (self.left + self.chunk + self.lookahead))
        snap = self.model.mel_cfg.hop_length * self._subsampling_factor()
        start = (start // snap) * snap
        window = self._audio[start:]
        log_probs, enc_len = self.model.forward(
            jnp.asarray(window[None]), jnp.array([len(window)], jnp.int32)
        )
        preds = np.asarray(jnp.argmax(log_probs[0], axis=-1))[: int(enc_len[0])]
        snap = self.model.mel_cfg.hop_length * self._subsampling_factor()
        skip = start // snap if start else 0
        # frames of the full signal present in this window: indices skip..skip+len
        new = []
        blank = self.model.decoding.blank_id
        for f in range(self._emitted_frames, min(target_frames, skip + len(preds))):
            tok = int(preds[f - skip])
            if tok != self._last_token and tok != blank:
                new.append(tok)
            self._last_token = tok
        self._emitted_frames = min(target_frames, skip + len(preds))
        self._ids.extend(new)
        return self.model.decoding.ids_to_text(new)

    def finish(self) -> str:
        """Flush the lookahead delay: emit all remaining frames using the true
        audio end (no padding — padding would enter the attention mask and
        diverge from offline)."""
        saved, self.lookahead = self.lookahead, 0
        out = self.push(np.zeros(0, np.float32))
        self.lookahead = saved
        return out

    @property
    def text(self) -> str:
        return self.model.decoding.ids_to_text(self._ids)


class CacheAwareStreamingCTC:
    """True recurrent-cache streaming (reference: cache-aware streaming
    Conformer, `conformer_encoder.py` streaming_forward with
    cache_last_channel / cache_last_time; simulation feeds preprocessed
    feature chunks as in `examples/asr/asr_cache_aware_streaming/`).

    Each `stream_step(feats_chunk)` runs ONE jitted fixed-shape step:
    O(chunk) work with per-layer KV windows and conv histories carried
    between calls — no re-encoding. Exact vs offline for fully-causal
    configs (att_context_size=(L,0), causal_downsampling=True); tested
    chunk-size-independently.
    """

    def __init__(self, model: EncDecCTCModel, chunk_frames: int = 16):
        import jax

        enc_cfg = model.cfg.encoder
        if "d_model" not in enc_cfg:
            raise ValueError("cache-aware streaming requires a conformer encoder")
        sub = int(enc_cfg.get("subsampling_factor", 4))
        if chunk_frames % sub:
            raise ValueError(f"chunk_frames must be divisible by {sub}")
        self.model = model
        self.chunk = chunk_frames
        from nemo_tpu.models.asr.ctc_models import build_encoder
        from nemo_tpu.models.asr.modules.conformer import ConformerEncoder

        self.encoder = build_encoder(
            model.cfg.encoder, model.mel_cfg.features)
        if not isinstance(self.encoder, ConformerEncoder):
            raise ValueError("cache-aware streaming requires a conformer")
        self.blank = model.decoding.blank_id

        def step(variables, feats, cache):
            log_probs, _, new_cache = model.net.apply(
                variables, feats,
                jnp.full((feats.shape[0],), feats.shape[2], jnp.int32),
                train=False, cache=cache,
            )
            return jnp.argmax(log_probs, axis=-1).astype(jnp.int32), new_cache

        self._jit_step = jax.jit(step)
        self.reset()

    def reset(self, batch: int = 1):
        self._cache = self.encoder.init_stream_cache(batch)
        self._ids: List[int] = []
        self._last_token = -1

    def stream_step(self, feats_chunk: np.ndarray) -> str:
        """[B=1, D, chunk_frames] mel features → newly-emitted text."""
        ids, self._cache = self._jit_step(
            self.model.variables, jnp.asarray(feats_chunk), self._cache)
        new = []
        for tok in np.asarray(ids[0]).tolist():
            if tok != self._last_token and tok != self.blank:
                new.append(int(tok))
            self._last_token = tok
        self._ids.extend(new)
        return self.model.decoding.ids_to_text(new)

    @property
    def text(self) -> str:
        return self.model.decoding.ids_to_text(self._ids)


class CacheAwareStreamingRNNT:
    """Streaming transducer: cache-aware encoder + carried prediction-net
    state (reference: cache-aware streaming RNNT/fastconformer-transducer;
    the decode side of `asr_cache_aware_streaming`).

    Each `stream_step(feats_chunk)` is one jitted program: O(chunk) encoder
    work through recurrent KV/conv caches, then the compiled greedy decode
    with the prediction-net context flowing across chunk boundaries —
    streaming transcript == offline greedy EXACTLY for causal encoders.
    """

    def __init__(self, model, chunk_frames: int = 16):
        import jax

        from nemo_tpu.models.asr.ctc_models import build_encoder
        from nemo_tpu.models.asr.modules.conformer import ConformerEncoder
        from nemo_tpu.models.asr.modules.rnnt import rnnt_greedy_decode
        from nemo_tpu.models.asr.rnnt_models import _RNNTNet

        enc_cfg = model.cfg.encoder
        sub = int(enc_cfg.get("subsampling_factor", 4))
        if chunk_frames % sub:
            raise ValueError(f"chunk_frames must be divisible by {sub}")
        self.model = model
        self.chunk = chunk_frames
        self.encoder = build_encoder(enc_cfg, model.mel_cfg.features)
        if not isinstance(self.encoder, ConformerEncoder):
            raise ValueError("cache-aware streaming requires a conformer")

        def step(variables, feats, enc_cache, dec_carry):
            enc, enc_len, new_cache = model.net.apply(
                variables, feats,
                jnp.full((feats.shape[0],), feats.shape[2], jnp.int32),
                method=_RNNTNet.encode_stream, cache=enc_cache)

            def joint_fn(enc_t, pred_out):
                return model.net.apply(variables, enc_t, pred_out,
                                       method=_RNNTNet.joint_logits)

            def pred_step_fn(token, state):
                return model.net.apply(variables, token, state,
                                       method=_RNNTNet.pred_step)

            toks, counts, carry = rnnt_greedy_decode(
                joint_fn, pred_step_fn, None, enc, enc_len,
                model.blank_id, model.max_symbols,
                carry_in=dec_carry, return_carry=True)
            return toks, counts, new_cache, carry

        self._jit_step = jax.jit(step)
        self._rnnt_net_cls = _RNNTNet
        self.reset()

    def reset(self, batch: int = 1):
        import jax

        from nemo_tpu.models.asr.rnnt_models import _RNNTNet

        self._enc_cache = self.encoder.init_stream_cache(batch)
        zeros = jnp.zeros((batch, self.model.net.pred_hidden), jnp.float32)
        state0 = tuple((zeros, zeros)
                       for _ in range(self.model.net.pred_rnn_layers))
        pred_out0, state0 = self.model.net.apply(
            self.model.variables, jnp.full((batch,), -1, jnp.int32), state0,
            method=_RNNTNet.pred_step)
        self._dec_carry = (pred_out0, state0)
        self._ids: List[int] = []

    def stream_step(self, feats_chunk: np.ndarray) -> str:
        """[1, D, chunk_frames] mel features → newly-emitted text."""
        toks, counts, self._enc_cache, self._dec_carry = self._jit_step(
            self.model.variables, jnp.asarray(feats_chunk),
            self._enc_cache, self._dec_carry)
        new = [int(t) for t in np.asarray(toks[0][: int(counts[0])])]
        self._ids.extend(new)
        return "".join(self.model.labels[t] for t in new
                       if t < len(self.model.labels))

    @property
    def text(self) -> str:
        return "".join(self.model.labels[t] for t in self._ids
                       if t < len(self.model.labels))
