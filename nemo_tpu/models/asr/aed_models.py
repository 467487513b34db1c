"""AED multitask ASR (Canary-style): conformer encoder + transformer decoder
with prompt conditioning.

Reference parity: EncDecMultiTaskModel
(`/root/reference/nemo/collections/asr/models/aed_multitask_models.py`) — the
flagship attention-encoder-decoder family: FastConformer encoder, transformer
decoder with cross-attention, task/language/PnC prompt tokens steering the
decode (`parts/submodules/multitask_decoding.py`).

TPU-first shape: training is one jitted teacher-forced pass (encoder +
causal decoder over [B, U]); inference is a `lax.scan` decode loop with
static-shape self-attention KV caches and per-layer precomputed cross-attn
K/V — the whole autoregressive decode compiles to a single program.
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nemo_tpu.core.config import ConfigDict
from nemo_tpu.core.model import Model
from nemo_tpu.core.neural_types import typecheck as _typecheck
from nemo_tpu.data.audio_io import read_wav
from nemo_tpu.models.asr.ctc_models import _bucket, _mel_cfg_from, build_encoder
from nemo_tpu.ops.audio import mel_spectrogram


def _sinusoidal(max_len: int, d: int) -> np.ndarray:
    pos = np.arange(max_len)[:, None]
    inv = np.exp(-math.log(10000.0) * np.arange(0, d, 2) / d)
    ang = pos * inv[None, :]
    out = np.zeros((max_len, d), np.float32)
    out[:, 0::2] = np.sin(ang)
    out[:, 1::2] = np.cos(ang)
    return out


class _MHA(nn.Module):
    """Multi-head attention with optional causal masking and KV cache."""

    d_model: int
    n_heads: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, q_in, kv_in, mask=None, kv_cache=None, decode_index=None,
                 *, causal=False, train=False):
        H = self.n_heads
        D = self.d_model // H
        q = nn.DenseGeneral((H, D), name="q")(q_in)
        k = nn.DenseGeneral((H, D), name="k")(kv_in)
        v = nn.DenseGeneral((H, D), name="v")(kv_in)
        kv_offset = 0
        if kv_cache is not None:
            ck, cv = kv_cache
            ck = jax.lax.dynamic_update_slice_in_dim(ck, k.astype(ck.dtype), decode_index, 1)
            cv = jax.lax.dynamic_update_slice_in_dim(cv, v.astype(cv.dtype), decode_index, 1)
            k, v, kv_cache = ck, cv, (ck, cv)
            kv_offset = decode_index
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        s = s / math.sqrt(D)
        Sq, Sk = q.shape[1], k.shape[1]
        m = jnp.ones((Sq, Sk), bool)
        if causal:
            m = jnp.arange(Sk)[None, :] <= (jnp.arange(Sq)[:, None] + kv_offset)
        m = jnp.broadcast_to(m[None], (q_in.shape[0], Sq, Sk))
        if mask is not None:
            m = m & mask[:, None, :]
        s = jnp.where(m[:, None], s, -1e30)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        p = nn.Dropout(self.dropout, deterministic=not train)(p)
        out = jnp.einsum("bhqk,bkhd->bqhd", p, v)
        out = nn.DenseGeneral(self.d_model, axis=(-2, -1), name="out")(out)
        return out, kv_cache


class TransformerDecoderLayer(nn.Module):
    d_model: int
    n_heads: int
    ffn: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, enc, enc_mask, self_cache=None, decode_index=None,
                 *, train=False):
        h = nn.LayerNorm(name="norm_self")(x)
        a, self_cache = _MHA(self.d_model, self.n_heads, self.dropout, name="self_attn")(
            h, h, kv_cache=self_cache, decode_index=decode_index, causal=True, train=train
        )
        x = x + nn.Dropout(self.dropout, deterministic=not train)(a)
        h = nn.LayerNorm(name="norm_cross")(x)
        a, _ = _MHA(self.d_model, self.n_heads, self.dropout, name="cross_attn")(
            h, enc, mask=enc_mask, train=train
        )
        x = x + nn.Dropout(self.dropout, deterministic=not train)(a)
        h = nn.LayerNorm(name="norm_ff")(x)
        h = nn.Dense(self.ffn, name="fc1")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.d_model, name="fc2")(h)
        x = x + nn.Dropout(self.dropout, deterministic=not train)(h)
        return x, self_cache


class _AEDNet(nn.Module):
    enc_cfg: Any
    feat_in: int
    vocab_size: int  # incl. specials
    d_model: int
    dec_layers: int
    dec_heads: int
    dec_ffn: int
    dropout: float = 0.1
    max_dec_len: int = 512

    def setup(self):
        self.encoder = build_encoder(ConfigDict(dict(self.enc_cfg)), self.feat_in)
        enc_d = int(dict(self.enc_cfg).get("d_model") or dict(self.enc_cfg)["jasper"][-1]["filters"])
        self.enc_proj = nn.Dense(self.d_model) if enc_d != self.d_model else None
        self.embed = nn.Embed(self.vocab_size, self.d_model)
        self.layers = [
            TransformerDecoderLayer(self.d_model, self.dec_heads, self.dec_ffn,
                                    self.dropout, name=f"layer{i}")
            for i in range(self.dec_layers)
        ]
        self.final_norm = nn.LayerNorm()
        self.pos = jnp.asarray(_sinusoidal(self.max_dec_len, self.d_model))

    def encode(self, feats, lengths, train: bool = False):
        enc, enc_len = self.encoder(feats, lengths, train=train)
        enc = jnp.transpose(enc, (0, 2, 1))  # [B, T, H]
        if self.enc_proj is not None:
            enc = self.enc_proj(enc)
        return enc, enc_len

    def _embed_pos(self, tokens, offset=0):
        x = self.embed(tokens) * math.sqrt(self.d_model)
        if tokens.shape[1] == 1:  # decode step: dynamic position
            p = jax.lax.dynamic_slice_in_dim(self.pos, offset, 1, axis=0)[None]
        else:
            p = self.pos[None, : tokens.shape[1]]
        return x + p

    def decode_train(self, enc, enc_len, dec_in, train: bool = False):
        """dec_in [B, U] → logits [B, U, V] (teacher forcing)."""
        enc_mask = jnp.arange(enc.shape[1])[None, :] < enc_len[:, None]
        x = self._embed_pos(dec_in)
        for layer in self.layers:
            x, _ = layer(x, enc, enc_mask, train=train)
        x = self.final_norm(x)
        return self.embed.attend(x)  # tied output head

    # semantic ports (reference: aed_multitask_models.py input_types)
    @property
    def input_types(self):
        from nemo_tpu.core.neural_types import (
            LabelsType, LengthsType, NeuralType, SpectrogramType)
        return {
            "feats": NeuralType(("B", "D", "T"), SpectrogramType()),
            "lengths": NeuralType(("B",), LengthsType()),
            "dec_in": NeuralType(("B", "T"), LabelsType()),
        }

    @property
    def output_types(self):
        from nemo_tpu.core.neural_types import (
            LengthsType, LogitsType, NeuralType)
        return {
            "logits": NeuralType(("B", "T", "D"), LogitsType()),
            "encoded_lengths": NeuralType(("B",), LengthsType()),
        }

    @_typecheck
    def __call__(self, feats, lengths, dec_in, train: bool = False):
        enc, enc_len = self.encode(feats, lengths, train=train)
        return self.decode_train(enc, enc_len, dec_in, train=train), enc_len

    def decode_step(self, enc, enc_mask, token, caches, index):
        """token [B, 1], caches: list of (k, v) per layer → (logits [B, V], caches)."""
        x = self._embed_pos(token, offset=index)
        new_caches = []
        for layer, cache in zip(self.layers, caches):
            x, cache = layer(x, enc, enc_mask, self_cache=cache, decode_index=index)
            new_caches.append(cache)
        x = self.final_norm(x)
        return self.embed.attend(x)[:, 0], new_caches


class EncDecMultiTaskModel(Model):
    """Canary-style AED model. Config contract (mirrors the reference
    multitask YAMLs): model.{labels, preprocessor, encoder,
    transf_decoder{num_layers, hidden_size, inner_size, num_attention_heads},
    prompt_format{langs, tasks}}.

    Vocabulary = labels + specials: <pad> <bos> <eos> + one token per
    language and task + <pnc> <nopnc> (reference: canary prompt schema,
    aed_multitask_models.py + prompt formatters)."""

    def __init__(self, cfg: ConfigDict, init_params: bool = True):
        super().__init__(cfg)
        cfg = self.cfg
        self.sample_rate = int(cfg.get("sample_rate", 16000))
        self.mel_cfg = _mel_cfg_from(cfg.get("preprocessor", {}))
        pf = cfg.get("prompt_format", {})
        self.langs = list(pf.get("langs", ["en"]))
        self.tasks = list(pf.get("tasks", ["transcribe", "translate"]))
        tok_cfg = cfg.get("tokenizer", {})
        self.tokenizer = None
        if tok_cfg and tok_cfg.get("type") == "canary":
            # multilingual protocol: per-language sub-tokenizers fused into
            # one id space + the canary special-token prompt schema
            # (reference: canary_tokenizer.py / aggregate_tokenizer.py)
            from nemo_tpu.data.text_tokenizers import (
                CanaryTokenizer, CharTokenizer, SentencePieceTokenizer)

            subs = {}
            for lang, sub in dict(tok_cfg["langs"]).items():
                sub = dict(sub)
                if "vocab" in sub:
                    subs[lang] = CharTokenizer(list(sub["vocab"]))
                else:
                    subs[lang] = SentencePieceTokenizer(sub["json"])
            self.tokenizer = CanaryTokenizer(
                subs, langs=list(subs), tasks=self.tasks)
            self.langs = [l for l in self.tokenizer.langs
                          if l != "spl_tokens"]
            self.labels = None
            self.vocab = None
            self.pad_id = self.tokenizer.pad_id
            self.bos_id = self.tokenizer.bos_id
            self.eos_id = self.tokenizer.eos_id
            vocab_size = self.tokenizer.vocab_size
        else:
            self.labels = list(cfg.get("labels"))
            specials = ["<pad>", "<bos>", "<eos>"]
            specials += [f"<|{l}|>" for l in self.langs]
            specials += [f"<|{t}|>" for t in self.tasks]
            specials += ["<|pnc|>", "<|nopnc|>"]
            self.specials = specials
            self.vocab = specials + self.labels
            self.pad_id, self.bos_id, self.eos_id = 0, 1, 2
            self._tok2id = {t: i for i, t in enumerate(self.vocab)}
            vocab_size = len(self.vocab)
        dec = cfg.get("transf_decoder", ConfigDict())
        enc_cfg = cfg.encoder
        self.max_dec_len = int(cfg.get("max_dec_len", 512))
        self.net = _AEDNet(
            enc_cfg=enc_cfg.to_dict(),
            feat_in=int(enc_cfg.get("feat_in", self.mel_cfg.features)),
            vocab_size=vocab_size,
            d_model=int(dec.get("hidden_size", 512)),
            dec_layers=int(dec.get("num_layers", 4)),
            dec_heads=int(dec.get("num_attention_heads", 8)),
            dec_ffn=int(dec.get("inner_size", 2048)),
            max_dec_len=self.max_dec_len,
        )
        if init_params:
            self._init_params()
        self._jit_decode = jax.jit(self._decode_fn, static_argnames=("max_len",))

    def _init_params(self, seed: int = 0):
        feats = jnp.zeros((1, self.mel_cfg.features, 128), jnp.float32)
        lens = jnp.array([128], jnp.int32)
        dec_in = jnp.zeros((1, 8), jnp.int32)
        self.variables = self.net.init(jax.random.PRNGKey(seed), feats, lens, dec_in)

    # -- prompt -------------------------------------------------------------
    def prompt_ids(self, lang: str = None, task: str = "transcribe",
                   pnc: bool = True, target_lang: str = None) -> List[int]:
        """[bos, <|lang|>, <|task|>[, <|target|>], <|pnc|>] (reference
        canary prompt; translate prompts carry the target language)."""
        lang = lang or self.langs[0]
        if self.tokenizer is not None:
            return self.tokenizer.prompt_ids(lang, target_lang, task, pnc)
        return [
            self.bos_id,
            self._tok2id[f"<|{lang}|>"],
            self._tok2id[f"<|{task}|>"],
            self._tok2id["<|pnc|>" if pnc else "<|nopnc|>"],
        ]

    def text_to_ids(self, text: str, lang: str = None) -> List[int]:
        if self.tokenizer is not None:
            return self.tokenizer.text_to_ids(text, lang or self.langs[0])
        off = len(self.specials)
        lut = {c: off + i for i, c in enumerate(self.labels)}
        return [lut[c] for c in text if c in lut]

    def ids_to_text(self, ids: Sequence[int]) -> str:
        if self.tokenizer is not None:
            # drop the special-token span (the first aggregate interval)
            from nemo_tpu.data.text_tokenizers import CANARY_SPECIAL
            lo = self.tokenizer.token_id_offset[CANARY_SPECIAL]
            hi = lo + self.tokenizer.tokenizers_dict[CANARY_SPECIAL].vocab_size
            return self.tokenizer.ids_to_text(
                [i for i in ids if not (lo <= int(i) < hi)])
        off = len(self.specials)
        return "".join(self.vocab[i] for i in ids if i >= off)

    # -- training -----------------------------------------------------------
    def make_batch(self, transcripts: Sequence[str], max_len: int,
                   lang=None, task: str = "transcribe", pnc: bool = True):
        """→ (dec_in [B, U], labels [B, U], loss_mask [B, U]): input is
        prompt+text, labels shifted left with <eos>; loss only on text+eos
        (prompt positions are conditioning, not targets). `lang` may be a
        single language or a per-sample list (multilingual batches route
        each transcript through its language's sub-tokenizer)."""
        B = len(transcripts)
        langs = lang if isinstance(lang, (list, tuple)) else [lang] * B
        dec_in = np.full((B, max_len), self.pad_id, np.int32)
        labels = np.full((B, max_len), self.pad_id, np.int32)
        mask = np.zeros((B, max_len), np.float32)
        for b, text in enumerate(transcripts):
            prompt = self.prompt_ids(langs[b], task, pnc)
            ids = prompt + self.text_to_ids(text, langs[b])
            tgt = ids[1:] + [self.eos_id]
            n = min(len(ids), max_len)
            dec_in[b, :n] = ids[:n]
            labels[b, :n] = tgt[:n]
            mask[b, len(prompt) - 1 : n] = 1.0  # from first text prediction
        return jnp.asarray(dec_in), jnp.asarray(labels), jnp.asarray(mask)

    def loss_fn(self, variables, signal, sig_len, dec_in, labels, loss_mask, rng=None):
        feats, feat_len = mel_spectrogram(signal, sig_len, self.mel_cfg, training=False)
        rngs = {"dropout": rng} if rng is not None else None
        if rng is not None:
            (logits, _), _ = self.net.apply(
                variables, feats, feat_len, dec_in, train=True, rngs=rngs,
                mutable=["batch_stats"],
            )
        else:
            logits, _ = self.net.apply(variables, feats, feat_len, dec_in)
        logits = logits.astype(jnp.float32)
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        gold = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
        nll = (lse - gold) * loss_mask
        return jnp.sum(nll) / jnp.maximum(jnp.sum(loss_mask), 1.0)

    # -- inference ----------------------------------------------------------
    def _decode_fn(self, variables, signal, sig_len, prompt, *, max_len):
        """prompt: [P] int32 (shared across batch) → (tokens [B, max_len], n [B])."""
        feats, feat_len = mel_spectrogram(signal, sig_len, self.mel_cfg, training=False)
        enc, enc_len = self.net.apply(variables, feats, feat_len, method=_AEDNet.encode)
        B = enc.shape[0]
        enc_mask = jnp.arange(enc.shape[1])[None, :] < enc_len[:, None]
        d = self.net.d_model // self.net.dec_heads
        caches = [
            (
                jnp.zeros((B, self.max_dec_len, self.net.dec_heads, d), jnp.float32),
                jnp.zeros((B, self.max_dec_len, self.net.dec_heads, d), jnp.float32),
            )
            for _ in range(self.net.dec_layers)
        ]
        P = prompt.shape[0]

        def step_fn(carry, i):
            token, caches, done, out, count = carry
            logits, caches = self.net.apply(
                variables, enc, enc_mask, token, caches, i,
                method=_AEDNet.decode_step,
            )
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            # while feeding the prompt, the "next token" is forced
            in_prompt = i + 1 < P
            forced = jnp.where(in_prompt, prompt[jnp.minimum(i + 1, P - 1)], 0)
            nxt = jnp.where(in_prompt, jnp.full((B,), forced, jnp.int32), nxt)
            now_done = done | (~in_prompt & (nxt == self.eos_id))
            emit = ~in_prompt & ~done & (nxt != self.eos_id)
            out = out.at[:, i].set(jnp.where(emit, nxt, self.pad_id))
            count = count + emit.astype(jnp.int32)
            return (nxt[:, None], caches, now_done, out, count), None

        token0 = jnp.full((B, 1), prompt[0], jnp.int32)
        out0 = jnp.full((B, max_len), self.pad_id, jnp.int32)
        done0 = jnp.zeros((B,), bool)
        count0 = jnp.zeros((B,), jnp.int32)
        (token, caches, done, out, count), _ = jax.lax.scan(
            step_fn, (token0, caches, done0, out0, count0), jnp.arange(max_len)
        )
        return out, count

    def transcribe(
        self,
        audio: Sequence[Union[str, np.ndarray]],
        batch_size: int = 4,
        lang: str = None,
        task: str = "transcribe",
        pnc: bool = True,
        max_len: int = 128,
    ) -> List[str]:
        prompt = jnp.asarray(self.prompt_ids(lang, task, pnc), jnp.int32)
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
            out, count = self._jit_decode(
                self.variables, jnp.asarray(padded), jnp.asarray(full_lens),
                prompt, max_len=max_len,
            )
            out = np.asarray(out)
            for b in range(len(sigs)):
                ids = [int(t) for t in out[b] if t != self.pad_id]
                results.append(self.ids_to_text(ids))
        return results

    def evaluate(
        self,
        audio: Sequence[Union[str, np.ndarray]],
        references: Sequence[str],
        *,
        task: str = "transcribe",
        lang: str = None,
        batch_size: int = 4,
        max_len: int = 128,
    ) -> dict:
        """Task-appropriate scoring (reference: Canary multitask validation —
        WER for `transcribe`, corpus BLEU for `translate`/AST)."""
        from nemo_tpu.models.asr.metrics import corpus_bleu, word_error_rate

        hyps = self.transcribe(audio, batch_size=batch_size, lang=lang,
                               task=task, max_len=max_len)
        out = {"hypotheses": hyps}
        if task == "translate":
            out["bleu"] = corpus_bleu(hyps, list(references))
        else:
            out["wer"] = word_error_rate(hyps, list(references))
        return out
