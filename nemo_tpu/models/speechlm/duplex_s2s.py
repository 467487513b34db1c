"""Duplex speech-to-speech models: the model listens and speaks at once.

Reference parity: `nemo/collections/speechlm2/models/duplex_s2s_model.py`
(LLM backbone consuming per-frame [source speech + its OWN previous text
token + its OWN previous audio-codec tokens], two heads: text lm_head +
K-codebook audio head; special speech BOS/EOS/DELAY codes substituted at
text BOS/EOS positions, one-frame delay shift) and
`duplex_s2s_speech_decoder_model.py` + `modules/speech_generation.py`
(TransformerARSpeechDecoder: a separate causal transformer over LLM
hidden states predicting the codec codebooks).

TPU-first: the K codebook embeddings are ONE [K, Vs, H] table summed with
a single gather+reduce (no K sequential embedding lookups); the audio
head is one [H, K·Vs] GEMM reshaped to [B,T,K,Vs]; offline duplex
inference is a `lax.scan` over frames with the stacked GPT KV cache —
one compiled step regardless of session length.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nemo_tpu.models.llm.config import GPTConfig
from nemo_tpu.models.llm.gpt import GPTModel, init_kv_caches


@dataclasses.dataclass(frozen=True)
class DuplexS2SConfig:
    llm: GPTConfig = dataclasses.field(default_factory=GPTConfig)
    num_codebooks: int = 4
    codebook_size: int = 64
    text_loss_weight: float = 1.0
    audio_loss_weight: float = 1.0
    # per-frame weight on the user (source) channel added to the input
    duplex_user_channel_weight: float = 1.0
    # speech-decoder variant: layers of the separate AR speech decoder
    # (0 → predict audio from the LLM hidden state directly)
    speech_decoder_layers: int = 0
    speech_decoder_hidden: int = 64
    speech_decoder_heads: int = 2

    # control codes appended to the codec vocabulary
    @property
    def speech_vocab_size(self) -> int:
        return self.codebook_size + 3

    @property
    def speech_bos_id(self) -> int:
        return self.codebook_size

    @property
    def speech_eos_id(self) -> int:
        return self.codebook_size + 1

    @property
    def speech_delay_id(self) -> int:
        return self.codebook_size + 2


class TransformerARSpeechDecoder(nn.Module):
    """Causal transformer over frames: LLM hidden [B,T,H_llm] + previous-
    frame audio tokens → per-codebook logits (speech_generation.py:22)."""

    cfg: DuplexS2SConfig

    @nn.compact
    def __call__(self, llm_hidden, audio_inputs):
        cfg = self.cfg
        D = cfg.speech_decoder_hidden
        Hh = cfg.speech_decoder_heads
        dh = D // Hh
        B, T = audio_inputs.shape[:2]
        emb = self.param("audio_emb", nn.initializers.normal(0.02),
                         (cfg.num_codebooks, cfg.speech_vocab_size, D))
        x = nn.Dense(D, name="cond_proj")(llm_hidden)
        x = x + _sum_codebook_embed(emb, audio_inputs)
        causal = jnp.tril(jnp.ones((T, T), bool))[None, None]
        for i in range(cfg.speech_decoder_layers):
            h = nn.LayerNorm(name=f"ln1_{i}")(x)
            q = nn.DenseGeneral((Hh, dh), name=f"q{i}")(h)
            k = nn.DenseGeneral((Hh, dh), name=f"k{i}")(h)
            v = nn.DenseGeneral((Hh, dh), name=f"v{i}")(h)
            s = jnp.einsum("bshd,bthd->bhst", q, k) / np.sqrt(dh)
            s = jnp.where(causal, s, -1e30)
            p = jax.nn.softmax(s.astype(jnp.float32), -1).astype(x.dtype)
            att = jnp.einsum("bhst,bthd->bshd", p, v)
            x = x + nn.DenseGeneral(D, axis=(-2, -1), name=f"o{i}")(att)
            h = nn.LayerNorm(name=f"ln2_{i}")(x)
            h = nn.Dense(4 * D, name=f"fc1_{i}")(h)
            x = x + nn.Dense(D, name=f"fc2_{i}")(nn.gelu(h, approximate=True))
        logits = nn.Dense(cfg.num_codebooks * cfg.speech_vocab_size,
                          name="audio_head")(nn.LayerNorm(name="ln_f")(x))
        return logits.reshape(B, T, cfg.num_codebooks, cfg.speech_vocab_size)


def _sum_codebook_embed(emb, audio_tokens):
    """emb [K,Vs,D], audio_tokens [B,T,K] → summed embeddings [B,T,D]."""
    onehot = None  # gather per codebook then sum: one vmapped take
    gathered = jax.vmap(
        lambda e, t: jnp.take(e, t, axis=0),
        in_axes=(0, 2), out_axes=2)(emb, audio_tokens)  # [B,T,K,D]
    return gathered.sum(2)


class DuplexS2SNet(nn.Module):
    """The text head lives OUTSIDE the LLM (reference model.py:70-74 moves
    lm_head/embed_tokens out of the HF module): the LLM runs
    output_hidden=True and both heads read the shared hidden state."""

    cfg: DuplexS2SConfig

    def setup(self):
        cfg = self.cfg
        self.llm = GPTModel(cfg.llm, name="llm")
        self.audio_token_emb = self.param(
            "audio_token_emb", nn.initializers.normal(0.02),
            (cfg.num_codebooks, cfg.speech_vocab_size, cfg.llm.hidden_size))
        self.text_head = nn.Dense(cfg.llm.vocab_size, use_bias=False,
                                  name="text_head")
        if cfg.speech_decoder_layers > 0:
            self.speech_decoder = TransformerARSpeechDecoder(
                cfg, name="speech_decoder")
        else:
            self.audio_head = nn.Dense(
                cfg.num_codebooks * cfg.speech_vocab_size, name="audio_head")

    def build_input_embeds(self, source_encoded, text_inputs, audio_inputs):
        """[source speech + prev text + prev audio] per frame → [B,T,H].
        Addition order matches the reference (model.py:278): text + audio
        codebooks + weighted source."""
        x = self.llm.embed_tokens(text_inputs)
        x = x + _sum_codebook_embed(
            self.audio_token_emb, audio_inputs).astype(x.dtype)
        return x + (self.cfg.duplex_user_channel_weight
                    * source_encoded).astype(x.dtype)

    def _audio_logits(self, hidden, audio_inputs):
        cfg = self.cfg
        if cfg.speech_decoder_layers > 0:
            return self.speech_decoder(hidden, audio_inputs)
        B, T = audio_inputs.shape[:2]
        return self.audio_head(hidden).reshape(
            B, T, cfg.num_codebooks, cfg.speech_vocab_size)

    def __call__(self, source_encoded, text_inputs, audio_inputs, *,
                 train=False):
        """→ (text_logits [B,T,Vt], audio_logits [B,T,K,Vs])."""
        x = self.build_input_embeds(source_encoded, text_inputs, audio_inputs)
        hidden = self.llm(tokens=None, inputs_embeds=x, train=train,
                          output_hidden=True)
        return self.text_head(hidden), self._audio_logits(hidden,
                                                          audio_inputs)

    def decode_step(self, source_frame, text_tok, audio_toks, caches, t):
        """One duplex frame: inputs are the model's OWN previous outputs
        plus the live user frame. → (text_tok', audio_toks', caches)."""
        x = self.build_input_embeds(
            source_frame[:, None], text_tok[:, None], audio_toks[:, None])
        B = x.shape[0]
        pos = t * jnp.ones((B, 1), jnp.int32)
        hidden, caches = self.llm(
            tokens=None, inputs_embeds=x, positions=pos, kv_caches=caches,
            decode_index=t, output_hidden=True)
        text_next = jnp.argmax(self.text_head(hidden)[:, -1], -1)
        a_logits = self._audio_logits(hidden, audio_toks[:, None])
        audio_next = jnp.argmax(a_logits[:, -1], -1)
        return text_next, audio_next, caches


def prepare_duplex_inputs(cfg: DuplexS2SConfig, target_tokens, target_codes,
                          text_bos_id: int, text_eos_id: int):
    """Control-code substitution + delay shift (model.py:236-258):
    audio codes at text-BOS frames become speech_bos, at text-EOS frames
    speech_eos; the audio channel is delayed one frame with speech_delay
    at t=0; inputs are frames [:-1], labels frames [1:]."""
    btt = target_tokens[..., None]
    codes = jnp.where(btt == text_bos_id, cfg.speech_bos_id, target_codes)
    codes = jnp.where(btt == text_eos_id, cfg.speech_eos_id, codes)
    delay = jnp.full_like(codes[:, :1], cfg.speech_delay_id)
    codes = jnp.concatenate([delay, codes[:, :-1]], axis=1)
    return {
        "text_inputs": target_tokens[:, :-1],
        "text_labels": target_tokens[:, 1:],
        "audio_inputs": codes[:, :-1],
        "audio_labels": codes[:, 1:],
    }


class DuplexS2SModel:
    """User-facing wrapper: loss over both channels, offline inference."""

    def __init__(self, cfg: DuplexS2SConfig, seed: int = 0,
                 source_dim: Optional[int] = None):
        self.cfg = cfg
        self.net = DuplexS2SNet(cfg)
        H = cfg.llm.hidden_size if source_dim is None else source_dim
        src = jnp.zeros((1, 8, cfg.llm.hidden_size), jnp.float32)
        toks = jnp.zeros((1, 8), jnp.int32)
        codes = jnp.zeros((1, 8, cfg.num_codebooks), jnp.int32)
        self.variables = self.net.init(
            jax.random.PRNGKey(seed), src, toks, codes, train=False)

    def loss_fn(self, params, batch, rng=None):
        """batch: source_encoded [B,T,H], target_tokens [B,T],
        target_codes [B,T,K], frame_mask [B,T], text_bos/eos ids."""
        cfg = self.cfg
        prep = prepare_duplex_inputs(
            cfg, batch["target_tokens"], batch["target_codes"],
            batch.get("text_bos_id", 1), batch.get("text_eos_id", 2))
        rngs = {"dropout": rng} if rng is not None else {}
        text_logits, audio_logits = self.net.apply(
            {"params": params}, batch["source_encoded"][:, :-1],
            prep["text_inputs"], prep["audio_inputs"],
            train=rng is not None, rngs=rngs)
        mask = batch.get("frame_mask")
        mask = (jnp.ones(prep["text_labels"].shape, jnp.float32)
                if mask is None else mask[:, 1:])
        n = jnp.maximum(mask.sum(), 1.0)

        lp = jax.nn.log_softmax(text_logits.astype(jnp.float32))
        text_nll = -jnp.take_along_axis(
            lp, prep["text_labels"][..., None], -1)[..., 0]
        text_loss = (text_nll * mask).sum() / n

        lpa = jax.nn.log_softmax(audio_logits.astype(jnp.float32))
        audio_nll = -jnp.take_along_axis(
            lpa, prep["audio_labels"][..., None], -1)[..., 0]
        audio_loss = (audio_nll * mask[..., None]).sum() / (
            n * cfg.num_codebooks)

        loss = (cfg.text_loss_weight * text_loss
                + cfg.audio_loss_weight * audio_loss)
        return loss, {"text_loss": text_loss, "audio_loss": audio_loss}

    def offline_inference(self, params, source_encoded,
                          text_bos_tok: int = 0):
        """Run the duplex session: at each frame the model consumes the
        user frame + its own previous outputs (scan + KV cache). Returns
        text tokens [B,T] and audio codes [B,T,K]."""
        cfg = self.cfg
        B, T, _ = source_encoded.shape
        caches = init_kv_caches(
            cfg.llm, B, T,
            jnp.float32 if cfg.llm.compute_dtype == "float32"
            else jnp.bfloat16)
        text0 = jnp.full((B,), text_bos_tok, jnp.int32)
        audio0 = jnp.full((B, cfg.num_codebooks), cfg.speech_delay_id,
                          jnp.int32)

        def step(carry, t):
            text_tok, audio_toks, caches = carry
            text_n, audio_n, caches = self.net.apply(
                {"params": params}, source_encoded[:, t], text_tok,
                audio_toks, caches, t, method=DuplexS2SNet.decode_step)
            return (text_n, audio_n, caches), (text_n, audio_n)

        _, (texts, audios) = jax.lax.scan(
            step, (text0, audio0, caches), jnp.arange(T))
        return jnp.moveaxis(texts, 0, 1), jnp.moveaxis(audios, 0, 1)
