"""Tacotron 2: attention-based autoregressive mel synthesis.

Reference parity: `nemo/collections/tts/models/tacotron2.py` +
`modules/submodules/tacotron2.py` (Encoder: embed → 3×conv-BN-relu →
biLSTM; Decoder: prenet, attention-LSTM + location-sensitive attention,
decoder-LSTM, frame + gate projections; Postnet: 5×conv residual).

TPU-native: the teacher-forced decoder is ONE `lax.scan` over mel frames
(all recurrences carried as scan state — no per-step Python); inference is
the same scan with the predicted frame fed back and a gate-driven stop mask
(static max length, jit-friendly).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class Tacotron2Encoder(nn.Module):
    n_symbols: int
    d_model: int = 512
    kernel: int = 5
    n_convs: int = 3

    @nn.compact
    def __call__(self, tokens, token_len, *, train: bool = False):
        x = nn.Embed(self.n_symbols, self.d_model, name="embedding")(tokens)
        mask = jnp.arange(x.shape[1])[None, :] < token_len[:, None]
        for i in range(self.n_convs):
            x = nn.Conv(self.d_model, (self.kernel,), padding="SAME",
                        name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             name=f"bn{i}")(x)
            x = nn.relu(x)
            x = jnp.where(mask[..., None], x, 0.0)
        half = self.d_model // 2
        fwd = nn.RNN(nn.OptimizedLSTMCell(half), name="lstm_f")(x)
        bwd = jnp.flip(nn.RNN(nn.OptimizedLSTMCell(half), name="lstm_b")(
            jnp.flip(x, 1)), 1)
        out = jnp.concatenate([fwd, bwd], -1)
        return jnp.where(mask[..., None], out, 0.0), mask


class Prenet(nn.Module):
    sizes: Tuple[int, ...] = (256, 256)
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, rng):
        # reference applies prenet dropout at inference too (tacotron2.py
        # Prenet: always-on dropout — crucial for autoregressive stability)
        for i, s in enumerate(self.sizes):
            x = nn.relu(nn.Dense(s, use_bias=False, name=f"fc{i}")(x))
            rng, sub = jax.random.split(rng)
            keep = jax.random.bernoulli(sub, 1.0 - self.dropout, x.shape)
            x = jnp.where(keep, x / (1.0 - self.dropout), 0.0)
        return x, rng


class Tacotron2Decoder(nn.Module):
    """One scan step = attention LSTM → location attention → decoder LSTM →
    frame/gate projections."""

    n_mels: int = 80
    d_enc: int = 512
    d_att_rnn: int = 1024
    d_dec_rnn: int = 1024
    d_att: int = 128
    att_loc_filters: int = 32
    att_loc_kernel: int = 31
    prenet_dim: int = 256
    gate_threshold: float = 0.5

    def setup(self):
        self.prenet = Prenet((self.prenet_dim, self.prenet_dim))
        self.att_cell = nn.OptimizedLSTMCell(self.d_att_rnn)
        self.dec_cell = nn.OptimizedLSTMCell(self.d_dec_rnn)
        self.query_proj = nn.Dense(self.d_att, use_bias=False)
        self.memory_proj = nn.Dense(self.d_att, use_bias=False)
        self.loc_conv = nn.Conv(self.att_loc_filters, (self.att_loc_kernel,),
                                padding="SAME", use_bias=False)
        self.loc_proj = nn.Dense(self.d_att, use_bias=False)
        self.att_v = nn.Dense(1, use_bias=False)
        self.frame_proj = nn.Dense(self.n_mels)
        self.gate_proj = nn.Dense(1)

    def _attend(self, query, memory, processed_memory, att_weights_cat, mask):
        """Location-sensitive attention (attention.py in reference)."""
        q = self.query_proj(query)[:, None]  # [B,1,A]
        loc = self.loc_proj(self.loc_conv(att_weights_cat))  # [B,U,A]
        e = self.att_v(jnp.tanh(q + loc + processed_memory))[..., 0]  # [B,U]
        e = jnp.where(mask, e, -1e30)
        w = jax.nn.softmax(e, -1)
        ctx = jnp.einsum("bu,bud->bd", w, memory)
        return ctx, w

    def _step(self, carry, mel_in, memory, processed_memory, mask):
        (att_state, dec_state, ctx, w, w_cum, rng) = carry
        pre, rng = self.prenet(mel_in, rng)
        att_in = jnp.concatenate([pre, ctx], -1)
        att_state, att_h = self.att_cell(att_state, att_in)
        w_cat = jnp.stack([w, w_cum], -1)  # [B,U,2]
        ctx, w = self._attend(att_h, memory, processed_memory, w_cat, mask)
        w_cum = w_cum + w
        dec_in = jnp.concatenate([att_h, ctx], -1)
        dec_state, dec_h = self.dec_cell(dec_state, dec_in)
        proj_in = jnp.concatenate([dec_h, ctx], -1)
        frame = self.frame_proj(proj_in)
        gate = self.gate_proj(proj_in)[..., 0]
        return (att_state, dec_state, ctx, w, w_cum, rng), (frame, gate, w)

    def _init_carry(self, B, U, memory, rng):
        att_state = self.att_cell.initialize_carry(jax.random.PRNGKey(0),
                                                   (B, 1))
        dec_state = self.dec_cell.initialize_carry(jax.random.PRNGKey(0),
                                                   (B, 1))
        ctx = jnp.zeros((B, memory.shape[-1]))
        w = jnp.zeros((B, U))
        w_cum = jnp.zeros((B, U))
        return (att_state, dec_state, ctx, w, w_cum, rng)

    def __call__(self, memory, mask, mels, rng):
        """Teacher forced: mels [B, n_mels, T] → (frames, gates, aligns)."""
        B, U, _ = memory.shape
        processed = self.memory_proj(memory)
        T = mels.shape[2]
        # decoder inputs: go-frame + shifted targets
        tgt = jnp.transpose(mels, (0, 2, 1))  # [B,T,M]
        go = jnp.zeros((B, 1, self.n_mels))
        dec_in = jnp.concatenate([go, tgt[:, :-1]], 1)  # [B,T,M]

        def step(carry, x):
            return self._step(carry, x, memory, processed, mask)

        carry0 = self._init_carry(B, U, memory, rng)
        _, (frames, gates, ws) = nn.scan(
            lambda mdl, c, x: step(c, x),
            variable_broadcast="params", split_rngs={"params": False},
            in_axes=1, out_axes=1,
        )(self, carry0, dec_in)
        return jnp.transpose(frames, (0, 2, 1)), gates, ws

    def infer(self, memory, mask, rng, max_steps: int = 500):
        """Autoregressive: feed back predictions; stop via gate (masked)."""
        B, U, _ = memory.shape
        processed = self.memory_proj(memory)

        def step(carry, _):
            (dec_carry, prev_frame, done) = carry
            new_dec, (frame, gate, w) = self._step(
                dec_carry, prev_frame, memory, processed, mask)
            stopped = jax.nn.sigmoid(gate) > self.gate_threshold
            done2 = done | stopped
            return (new_dec, frame, done2), (frame, gate, done2)

        carry0 = (self._init_carry(B, U, memory, rng),
                  jnp.zeros((B, self.n_mels)), jnp.zeros((B,), bool))
        _, (frames, gates, done) = nn.scan(
            lambda mdl, c, x: step(c, x),
            variable_broadcast="params", split_rngs={"params": False},
            in_axes=0, out_axes=1, length=max_steps,
        )(self, carry0, None)
        # mel length = first step where done flips on (cap at max_steps)
        mel_len = jnp.argmax(done, axis=1)
        mel_len = jnp.where(jnp.any(done, 1), mel_len + 1, max_steps)
        return jnp.transpose(frames, (0, 2, 1)), gates, mel_len


class Postnet(nn.Module):
    n_mels: int = 80
    d: int = 512
    kernel: int = 5
    n_convs: int = 5

    @nn.compact
    def __call__(self, mel, *, train: bool = False):
        x = jnp.transpose(mel, (0, 2, 1))
        for i in range(self.n_convs):
            last = i == self.n_convs - 1
            x = nn.Conv(self.n_mels if last else self.d, (self.kernel,),
                        padding="SAME", name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             name=f"bn{i}")(x)
            if not last:
                x = jnp.tanh(x)
        return mel + jnp.transpose(x, (0, 2, 1))
