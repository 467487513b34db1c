"""CTC ASR models (QuartzNet / Jasper / Citrinet / Conformer-CTC).

Reference parity: EncDecCTCModel (`nemo/collections/asr/models/ctc_models.py:49`)
with `transcribe()` mirroring the TranscriptionMixin flow
(`asr/parts/mixins/transcription.py:175`): input processing → batched
forward → decoding, with train-only augmentation disabled.

TPU-first: one jitted forward per padded-length bucket (audio is padded to
power-of-two sample counts so jit caches stay small); features are computed
on-chip by the fused mel frontend.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, List, Optional, Sequence, Union

import flax.core
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nemo_tpu.core.config import ConfigDict
from nemo_tpu.core.model import Model
from nemo_tpu.core.neural_types import typecheck as _typecheck
from nemo_tpu.data.audio_io import read_wav
from nemo_tpu.models.asr.modules.conv_asr import ConvASRDecoder, ConvASREncoder
from nemo_tpu.models.asr.parts.ctc_decoding import CTCDecoding
from nemo_tpu.ops.audio import MelSpectrogramConfig, mel_spectrogram
from nemo_tpu.ops.ctc import ctc_loss_mean
from nemo_tpu.utils.logging import logging


def _mel_cfg_from(cfg: ConfigDict) -> MelSpectrogramConfig:
    import dataclasses

    names = {f.name for f in dataclasses.fields(MelSpectrogramConfig)}
    kwargs = {k: v for k, v in dict(cfg or {}).items() if k in names}
    # normalize yaml nulls
    return MelSpectrogramConfig(**kwargs)


def build_encoder(enc_cfg: ConfigDict, default_feat_in: int, name: Optional[str] = None) -> nn.Module:
    """Encoder dispatch from reference-style config nodes: `_target_` ending in
    ConformerEncoder / ConvASREncoder, or inferred from the keys present."""
    target = str(enc_cfg.get("_target_", ""))

    def _build(cls):
        import dataclasses as _dc

        names = {f.name for f in _dc.fields(cls) if f.name != "parent"}
        kwargs = {k: v for k, v in dict(enc_cfg).items() if k in names}
        kwargs.setdefault("feat_in", default_feat_in)
        return cls(name=name, **kwargs)

    if target.endswith("SqueezeformerEncoder"):
        from nemo_tpu.models.asr.modules.squeezeformer import SqueezeformerEncoder

        return _build(SqueezeformerEncoder)
    if target.endswith("RNNEncoder"):
        from nemo_tpu.models.asr.modules.squeezeformer import RNNEncoder

        return _build(RNNEncoder)
    is_conformer = target.endswith("ConformerEncoder") or "d_model" in enc_cfg
    if is_conformer:
        from nemo_tpu.models.asr.modules.conformer import ConformerEncoder

        return _build(ConformerEncoder)
    import jax.numpy as _jnp

    dtype = {"float32": _jnp.float32, "bfloat16": _jnp.bfloat16}[
        str(enc_cfg.get("compute_dtype", "float32"))
    ]
    return ConvASREncoder(
        feat_in=int(enc_cfg.get("feat_in", default_feat_in)),
        jasper=tuple(dict(b) for b in enc_cfg.jasper),
        dtype=dtype,
        name=name,
    )


class _CTCNet(nn.Module):
    enc_cfg: Any  # hashable config tuple; rebuilt into ConfigDict
    feat_in: int
    d_enc: int
    num_classes: int

    @nn.compact
    def __call__(self, feats, lengths, *, train: bool = False, cache=None):
        enc_cfg = ConfigDict(dict(self.enc_cfg))
        encoder = build_encoder(enc_cfg, self.feat_in, name="encoder")
        if cache is not None:  # cache-aware streaming step (conformer only)
            enc, enc_len, new_cache = encoder(feats, lengths, train=train,
                                              cache=cache)
        else:
            enc, enc_len = encoder(feats, lengths, train=train)
        log_probs = ConvASRDecoder(
            feat_in=self.d_enc, num_classes=self.num_classes, name="decoder"
        )(enc)
        if cache is not None:
            return log_probs, enc_len, new_cache
        return log_probs, enc_len


class EncDecCTCModel(Model):
    """Accepts reference-style model configs:
    model.{sample_rate, labels, preprocessor, encoder{feat_in, jasper}, decoder{num_classes, vocabulary}}
    (see SURVEY.md §2.4 ASR config contract)."""

    def __init__(self, cfg: ConfigDict, init_params: bool = True):
        super().__init__(cfg)
        cfg = self.cfg
        self.sample_rate = int(cfg.get("sample_rate", 16000))
        self.mel_cfg = _mel_cfg_from(cfg.get("preprocessor", {}))
        labels = cfg.get("labels") or cfg.get("decoder", {}).get("vocabulary")
        if labels is None:
            raise ValueError("config must provide labels / decoder.vocabulary")
        self.labels = list(labels)
        enc_cfg = cfg.encoder
        dec_cfg = cfg.get("decoder", ConfigDict())
        if "d_model" in enc_cfg:
            d_enc = int(dec_cfg.get("feat_in") or enc_cfg.d_model)
        else:
            d_enc = int(dec_cfg.get("feat_in") or enc_cfg.jasper[-1]["filters"])
        self.net = _CTCNet(
            enc_cfg=enc_cfg.to_dict(),
            feat_in=int(enc_cfg.get("feat_in", self.mel_cfg.features)),
            d_enc=d_enc,
            num_classes=len(self.labels),
        )
        self.decoding = CTCDecoding(self.labels)
        if init_params:
            self._init_params()
        self._jit_infer = jax.jit(self._infer_fn)
        self._jit_infer_ids = jax.jit(self._infer_ids_fn)
        self._jit_infer_ids_feats = jax.jit(self._infer_ids_feats_fn)

    # ------------------------------------------------------------------
    def _init_params(self, seed: int = 0):
        feats = jnp.zeros((1, self.mel_cfg.features, 128), jnp.float32)
        lens = jnp.array([128], jnp.int32)
        self.variables = self.net.init(jax.random.PRNGKey(seed), feats, lens, train=False)

    def _infer_fn(self, variables, signal, length):
        if signal.dtype == jnp.int16:
            # 16-bit PCM shipped raw (half the host→device bytes; exact —
            # the wav samples were int16 to begin with)
            signal = signal.astype(jnp.float32) / 32768.0
        feats, feat_len = mel_spectrogram(signal, length, self.mel_cfg, training=False)
        return self.net.apply(variables, feats, feat_len, train=False)

    def _infer_ids_fn(self, variables, signal, length):
        """Forward + on-device argmax: only [B, F] token ids leave the chip."""
        log_probs, enc_len = self._infer_fn(variables, signal, length)
        return jnp.argmax(log_probs, axis=-1).astype(jnp.int32), enc_len

    def _infer_ids_feats_fn(self, variables, feats, feat_len):
        """Features-input variant (host mel frontend): [B, D, F] bf16 mels →
        argmax ids. Reference analog: precomputed-features / DALI path."""
        log_probs, enc_len = self.net.apply(
            variables, feats.astype(jnp.float32), feat_len, train=False)
        return jnp.argmax(log_probs, axis=-1).astype(jnp.int32), enc_len

    # semantic ports (reference: EncDecCTCModel input_types/output_types,
    # ctc_models.py:49 via nemo.core Typing)
    @property
    def input_types(self):
        from nemo_tpu.core.neural_types import (
            AudioSignal, LengthsType, NeuralType)
        return {
            "signal": NeuralType(("B", "T"), AudioSignal()),
            "length": NeuralType(("B",), LengthsType()),
        }

    @property
    def output_types(self):
        from nemo_tpu.core.neural_types import (
            LengthsType, LogprobsType, NeuralType)
        return {
            "logprobs": NeuralType(("B", "T", "D"), LogprobsType()),
            "encoded_lengths": NeuralType(("B",), LengthsType()),
        }

    @_typecheck
    def forward(self, signal: jnp.ndarray, length: jnp.ndarray):
        """[B, T] float audio, [B] sample counts → (log_probs [B,F,V+1], frame lens)."""
        return self._jit_infer(self.variables, signal, length)

    # -- loss (training) -------------------------------------------------
    def loss(self, log_probs, encoded_len, targets, target_len):
        return ctc_loss_mean(log_probs, encoded_len, targets, target_len)

    # -- vocabulary / decoding hot-swap ------------------------------------
    def change_vocabulary(self, new_vocabulary: Sequence[str], seed: int = 0):
        """Swap the decoder head for a new label set, keeping the trained
        encoder — the cross-language fine-tune entry point (reference:
        EncDecCTCModel.change_vocabulary, asr/models/ctc_models.py:194)."""
        new_labels = list(new_vocabulary)
        old_vars = self.variables
        self.labels = new_labels
        self.net = dataclasses.replace(self.net, num_classes=len(new_labels))
        self._init_params(seed)  # fresh tree with the new decoder shape
        fresh = flax.core.unfreeze(self.variables)
        old = flax.core.unfreeze(old_vars)
        for col in fresh:  # keep every trained leaf outside the decoder
            for key in fresh[col]:
                if key != "decoder" and key in old.get(col, {}):
                    fresh[col][key] = old[col][key]
        self.variables = fresh
        self.decoding = CTCDecoding(new_labels)
        if "decoder" in self.cfg:
            self.cfg.decoder.vocabulary = new_labels
            self.cfg.decoder.num_classes = len(new_labels)
        if "labels" in self.cfg:
            self.cfg.labels = new_labels

    def change_decoding_strategy(self, strategy: str = "greedy", **kw):
        """Select the decoding used by transcribe(): 'greedy' (on-device
        argmax) or 'beam' (batched on-device prefix beam; kw: beam_size,
        lm, lm_weight). Reference: change_decoding_strategy,
        asr/models/ctc_models.py:265."""
        if strategy not in ("greedy", "beam"):
            raise ValueError(f"unknown decoding strategy: {strategy}")
        self._decoding_cfg = {"strategy": strategy, **kw}

    # -- transcription API (reference transcription.py:175) --------------
    def transcribe(
        self,
        audio: Sequence[Union[str, np.ndarray]],
        batch_size: int = 4,
        verbose: bool = False,
        frontend: str = "device",
    ) -> List[str]:
        """Pipelined batched transcription: while the device runs batch i,
        the host reads/pads/uploads batch i+1 and collapses batch i−1's ids
        (only [B, F] int32 ids are fetched — decode itself is on-device
        argmax). Wav inputs ship as raw int16 PCM (exact, half the transfer).

        frontend="host" computes the mel on the CPU (ops/audio_host —
        the DALI-offload analog) and ships bf16 features instead of PCM:
        half the wire bytes again and no frontend on the device; a
        producer thread overlaps mel + upload with device compute.
        """
        dec = getattr(self, "_decoding_cfg", None)
        if dec and dec.get("strategy") == "beam":
            kw = {k: v for k, v in dec.items() if k != "strategy"}
            return self.transcribe_beam(audio, batch_size=batch_size, **kw)
        if frontend == "host":
            return self._transcribe_host_frontend(audio, batch_size, verbose)
        from nemo_tpu.ops.ctc import ctc_collapse

        results: List[str] = []
        pending = None  # (preds_dev, enc_len_dev, n_valid)

        def drain():
            nonlocal pending
            if pending is None:
                return
            preds, enc_len, n = pending
            pending = None
            id_lists = ctc_collapse(preds[:n], enc_len[:n], blank=self.decoding.blank_id)
            results.extend(self.decoding.ids_to_text(ids) for ids in id_lists)

        for start in range(0, len(audio), batch_size):
            batch = audio[start : start + batch_size]
            sigs = []
            all_i16 = True
            for a in batch:
                if isinstance(a, str):
                    x, _ = read_wav(a, target_sr=self.sample_rate)
                else:
                    x = np.asarray(a, np.float32)
                    all_i16 = False
                sigs.append(x)
            lens = np.array([len(s) for s in sigs], np.int32)
            pad_len = _bucket(int(lens.max()))
            dtype = np.int16 if all_i16 else np.float32
            padded = np.zeros((batch_size, pad_len), dtype)
            for i, s in enumerate(sigs):
                if dtype == np.int16:
                    s = np.clip(np.rint(s * 32768.0), -32768, 32767).astype(np.int16)
                padded[i, : len(s)] = s
            full_lens = np.ones(batch_size, np.int32)
            full_lens[: len(sigs)] = lens
            preds, enc_len = self._jit_infer_ids(
                self.variables, jnp.asarray(padded), jnp.asarray(full_lens)
            )
            drain()  # host-collapse previous batch while this one computes
            pending = (preds, enc_len, len(sigs))
            if verbose:
                logging.info(f"transcribed {start + len(batch)}/{len(audio)}")
        drain()
        return results

    def transcribe_staged(self, staged) -> List[str]:
        """Full transcription over device-resident PCM batches.

        staged: sequence of (signal [B,T] int16/f32 jax.Array already on
        device, lengths [B] jax.Array, n_valid). Runs the identical
        pipeline as transcribe() minus the host→device upload — for
        serving topologies where audio lands on the TPU host directly
        (the reference's local-disk harness setup)."""
        from nemo_tpu.ops.ctc import ctc_collapse

        results: List[str] = []
        pending = None

        def drain():
            nonlocal pending
            if pending is None:
                return
            preds, enc_len, n = pending
            pending = None
            id_lists = ctc_collapse(preds[:n], enc_len[:n], blank=self.decoding.blank_id)
            results.extend(self.decoding.ids_to_text(ids) for ids in id_lists)

        for sig, lens, n in staged:
            preds, enc_len = self._jit_infer_ids(self.variables, sig, lens)
            drain()
            pending = (preds, enc_len, n)
        drain()
        return results

    def _transcribe_host_frontend(self, audio, batch_size: int, verbose: bool
                                  ) -> List[str]:
        import queue
        import threading

        import ml_dtypes

        from nemo_tpu.ops.audio_host import host_mel
        from nemo_tpu.ops.ctc import ctc_collapse

        q: "queue.Queue" = queue.Queue(maxsize=2)

        def producer():
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
                feats, flen = host_mel(padded, full_lens, self.mel_cfg,
                                       out_dtype=ml_dtypes.bfloat16)
                # transfer happens in this thread — overlaps device compute
                feats_dev = jax.device_put(jnp.asarray(feats))
                q.put((feats_dev, jnp.asarray(flen), len(sigs)))
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()

        results: List[str] = []
        pending = None

        def drain():
            nonlocal pending
            if pending is None:
                return
            preds, enc_len, n = pending
            pending = None
            id_lists = ctc_collapse(preds[:n], enc_len[:n], blank=self.decoding.blank_id)
            results.extend(self.decoding.ids_to_text(ids) for ids in id_lists)

        done_batches = 0
        while True:
            item = q.get()
            if item is None:
                break
            feats_dev, flen_dev, n = item
            preds, enc_len = self._jit_infer_ids_feats(self.variables, feats_dev, flen_dev)
            drain()
            pending = (preds, enc_len, n)
            done_batches += 1
            if verbose:
                logging.info(f"transcribed ~{done_batches * batch_size}/{len(audio)}")
        drain()
        t.join()
        return results


def _bucket(n: int, minimum: int = 16000) -> int:
    """Pad target: next power of two ≥ n (bounds the number of jit compiles)."""
    return max(minimum, 2 ** math.ceil(math.log2(max(n, 1))))


def _transcribe_beam(self, audio, batch_size: int = 4, beam_size: int = 8,
                     lm=None, lm_weight: float = 0.0) -> List[str]:
    """Beam-search transcription (reference beam decoding path,
    `ctc_beam_decoding.py` / batched GPU beam): forward on device, then the
    fully on-device batched prefix beam (`parts/ctc_batched_beam.py`).
    With `lm`, falls back to the host prefix beam with shallow fusion."""
    from nemo_tpu.models.asr.parts.ctc_batched_beam import ctc_beam_search_batched
    from nemo_tpu.models.asr.parts.ctc_beam import ctc_prefix_beam_search

    results: List[str] = []
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
        pad_len = _bucket(int(lens.max()))
        padded = np.zeros((len(sigs), pad_len), np.float32)
        for i, s in enumerate(sigs):
            padded[i, : len(s)] = s
        log_probs, enc_len = self.forward(
            jnp.asarray(padded), jnp.asarray(lens))
        if lm is not None:
            for b in range(len(sigs)):
                lp = np.asarray(log_probs[b][: int(enc_len[b])])
                hyp = ctc_prefix_beam_search(
                    lp, beam_size=beam_size, lm=lm, lm_weight=lm_weight)
                results.append(self.decoding.ids_to_text(list(hyp[0][0])))
        else:
            toks, cnts, _ = ctc_beam_search_batched(
                log_probs, enc_len, beam_size=beam_size,
                blank=self.decoding.blank_id)
            for b in range(len(sigs)):
                ids = [int(t) for t in np.asarray(toks[b][: int(cnts[b])])]
                results.append(self.decoding.ids_to_text(ids))
    return results


EncDecCTCModel.transcribe_beam = _transcribe_beam


def _transcribe_buffered(self, audio, chunk_secs: float = 20.0,
                         context_secs: float = 2.0,
                         batch_size: int = 4) -> List[str]:
    """Long-audio transcription by overlapping windows (reference:
    FrameBatchASR / speech_to_text_buffered_inference_ctc.py — each window
    carries `context_secs` of acoustic context on both sides; only the
    MIDDLE chunk's frames are kept, then greedy-collapsed across the
    concatenated sequence).

    Windows share ONE static shape → one jit compile regardless of audio
    length; windows batch across and within files."""
    from nemo_tpu.ops.ctc import ctc_collapse

    sr = self.sample_rate
    win = int((chunk_secs + 2 * context_secs) * sr)
    hop = int(chunk_secs * sr)
    ctx = int(context_secs * sr)

    results: List[str] = []
    for a in audio:
        if isinstance(a, str):
            x, _ = read_wav(a, target_sr=sr)
        else:
            x = np.asarray(a, np.float32)
        if len(x) <= win:
            results.append(self.transcribe([x], batch_size=1)[0])
            continue
        ids_mid = self._buffered_frame_ids(
            x, chunk_secs=chunk_secs, context_secs=context_secs,
            batch_size=batch_size)
        merged = ctc_collapse(
            np.asarray(ids_mid)[None, :],
            np.asarray([len(ids_mid)]), blank=self.decoding.blank_id)[0]
        results.append(self.decoding.ids_to_text(merged))
    return results


def _buffered_frame_ids(self, x: np.ndarray, chunk_secs: float,
                        context_secs: float, batch_size: int) -> List[int]:
    """Concatenated middle-frame argmax ids over overlapping windows (the
    pre-collapse stage of transcribe_buffered; exposed for frame-level
    agreement checks vs the offline forward)."""
    sr = self.sample_rate
    win = int((chunk_secs + 2 * context_secs) * sr)
    hop = int(chunk_secs * sr)
    ctx = int(context_secs * sr)
    # left-pad by ctx so window 0's middle starts at sample 0
    x = np.concatenate([np.zeros(ctx, np.float32), np.asarray(x, np.float32)])
    n_win = int(np.ceil((len(x) - 2 * ctx) / hop))
    pad_total = 2 * ctx + n_win * hop
    x = np.concatenate([x, np.zeros(max(0, pad_total - len(x)), np.float32)])
    windows = np.stack([x[i * hop: i * hop + win] for i in range(n_win)])
    ids_mid: List[int] = []
    for s in range(0, n_win, batch_size):
        wb = windows[s: s + batch_size]
        nb = len(wb)
        if nb < batch_size:
            wb = np.concatenate(
                [wb, np.zeros((batch_size - nb, win), np.float32)])
        preds, enc_len = self._jit_infer_ids(
            self.variables, jnp.asarray(wb),
            jnp.full((batch_size,), win, jnp.int32))
        preds = np.asarray(preds)
        F = int(np.asarray(enc_len)[0])  # same for every full window
        # middle frame span: drop the context fraction on each side
        f_ctx = int(round(F * ctx / win))
        for b in range(nb):
            ids_mid.extend(preds[b, f_ctx: F - f_ctx].tolist())
    return ids_mid


EncDecCTCModel.transcribe_buffered = _transcribe_buffered
EncDecCTCModel._buffered_frame_ids = _buffered_frame_ids
