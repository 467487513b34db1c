"""m-ar: multimodal autoregressive image generation over VQ tokens.

Reference parity: the `nemo/collections/multimodal` / m-ar family
(autoregressive text→image generation over discrete image tokens from a
learned VQ tokenizer). Two TPU-native pieces:

- `ImageVQVAE`: strided conv encoder → vector quantizer (the same
  ResidualVectorQuantizer used by the audio codec, 1 level) → transposed
  conv decoder. Tokenizes an image into a h/8 × w/8 grid of codebook ids.
- `MultimodalAR`: the native GPT stack over one joint vocabulary
  [text | image codes | BOI]; training is plain next-token CE over
  interleaved [text … BOI img …] sequences, generation samples image
  positions autoregressively and decodes them with the VQ-VAE.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nemo_tpu.models.llm.config import GPTConfig
from nemo_tpu.models.llm.gpt import GPTModel
from nemo_tpu.models.tts.modules.codec import ResidualVectorQuantizer


class ImageVQVAE(nn.Module):
    """[B, H, W, 3] → codes [B, (H/2^n)·(W/2^n)] and back."""

    dim: int = 64
    codebook_size: int = 256
    n_down: int = 3
    base_ch: int = 32

    def setup(self):
        self.vq = ResidualVectorQuantizer(
            num_levels=1, codebook_size=self.codebook_size, dim=self.dim,
            name="vq")
        self.encs = [nn.Conv(self.base_ch * (2 ** i), (4, 4), strides=(2, 2),
                             padding="SAME", name=f"enc{i}")
                     for i in range(self.n_down)]
        self.enc_proj = nn.Dense(self.dim, name="enc_proj")
        self.decs = [nn.ConvTranspose(
            self.base_ch * (2 ** (self.n_down - 1 - i)), (4, 4),
            strides=(2, 2), padding="SAME", name=f"dec{i}")
            for i in range(self.n_down)]
        self.head = nn.Conv(3, (3, 3), padding="SAME", name="head")

    def encode_features(self, img, *, train: bool = False):
        h = img
        for conv in self.encs:
            h = nn.gelu(conv(h))
        B, Hh, Ww, C = h.shape
        h = self.enc_proj(h)
        return h.reshape(B, Hh * Ww, self.dim), (Hh, Ww)

    def decode_features(self, z, grid: Tuple[int, int], *, train: bool = False):
        B = z.shape[0]
        Hh, Ww = grid
        h = z.reshape(B, Hh, Ww, self.dim)
        for deconv in self.decs:
            h = nn.gelu(deconv(h))
        return jnp.tanh(self.head(h))

    def __call__(self, img, *, train: bool = False):
        z, grid = self.encode_features(img, train=train)
        q, codes, vq_loss = self.vq(z)
        recon = self.decode_features(q, grid, train=train)
        rec_loss = jnp.mean(jnp.square(recon - img))
        return {"recon": recon, "codes": codes[:, 0], "grid": grid,
                "loss": rec_loss + vq_loss, "rec_loss": rec_loss}

    def tokenize(self, img):
        z, grid = self.encode_features(img)
        _, codes, _ = self.vq(z)
        return codes[:, 0], grid  # [B, P]

    def detokenize(self, codes, grid):
        z = self.vq.decode_codes(codes[:, None, :])
        return self.decode_features(z, grid)


@dataclasses.dataclass(frozen=True)
class MARConfig:
    text_vocab: int = 128
    image_codebook: int = 256
    llm: Optional[GPTConfig] = None

    @property
    def boi_id(self) -> int:  # begin-of-image separator
        return self.text_vocab + self.image_codebook

    @property
    def joint_vocab(self) -> int:
        return self.text_vocab + self.image_codebook + 1


class MultimodalAR(nn.Module):
    """GPT over the joint [text | image | BOI] vocabulary."""

    cfg: MARConfig

    def setup(self):
        llm_cfg = self.cfg.llm or GPTConfig(
            num_layers=2, hidden_size=64, ffn_hidden_size=128,
            num_attention_heads=4, vocab_size=self.cfg.joint_vocab,
            seq_length=512, compute_dtype="float32")
        llm_cfg = dataclasses.replace(llm_cfg, vocab_size=self.cfg.joint_vocab)
        self.llm = GPTModel(llm_cfg, name="llm")

    def pack(self, text_tokens, image_codes):
        """[text … BOI img…] with image ids offset into the joint vocab."""
        boi = jnp.full((text_tokens.shape[0], 1), self.cfg.boi_id, jnp.int32)
        img = image_codes.astype(jnp.int32) + self.cfg.text_vocab
        return jnp.concatenate([text_tokens, boi, img], axis=1)

    def __call__(self, tokens, *, train: bool = False):
        return self.llm(tokens, train=train)

    def loss(self, text_tokens, image_codes, *, train: bool = False):
        seq = self.pack(text_tokens, image_codes)
        logits = self(seq, train=train)
        lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
        tgt = seq[:, 1:]
        return -jnp.mean(jnp.take_along_axis(lp, tgt[..., None], -1))

    def generate_image_codes(self, text_tokens, n_image_tokens: int,
                             rng, temperature: float = 1.0):
        """Sample image positions AR (full re-forward per step — compact
        reference path; production decode rides the KV-cache engine)."""
        seq = jnp.concatenate(
            [text_tokens,
             jnp.full((text_tokens.shape[0], 1), self.cfg.boi_id, jnp.int32)],
            axis=1)
        lo, hi = self.cfg.text_vocab, self.cfg.text_vocab + self.cfg.image_codebook
        for i in range(n_image_tokens):
            logits = self(seq)[:, -1]
            logits = logits.at[:, :lo].set(-1e30).at[:, hi:].set(-1e30)
            rng, sub = jax.random.split(rng)
            if temperature <= 0:
                nxt = jnp.argmax(logits, -1)
            else:
                nxt = jax.random.categorical(sub, logits / temperature, -1)
            seq = jnp.concatenate([seq, nxt[:, None].astype(jnp.int32)], axis=1)
        return seq[:, -n_image_tokens:] - lo
