"""RNNT prediction network + joint network (TPU-native).

Reference parity: RNNTDecoder (prediction net, `asr/modules/rnnt.py:552` —
embedding with zero SOS + LSTM stack) and RNNTJoint (`rnnt.py:1280` —
enc/pred projections, additive combine, relu, output projection; blank last).

TPU-first: the training-time prediction pass is an `nn.scan`-lifted LSTM over
U+1 steps; decode uses the same per-step submodule (shared params) driven by
`lax.scan` outside, so both paths jit to static-shape programs.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class _PredStep(nn.Module):
    """One prediction-net time step through all LSTM layers."""

    hidden: int
    layers: int

    @nn.compact
    def __call__(self, carry, x):
        # carry: tuple of per-layer (c, h)
        new_carry = []
        h = x
        for i in range(self.layers):
            cell = nn.OptimizedLSTMCell(self.hidden, name=f"lstm{i}")
            state, h = cell(carry[i], h)
            new_carry.append(state)
        return tuple(new_carry), h


class PredictionNetwork(nn.Module):
    """Embedding (+ zero SOS) → LSTM stack. Blank/SOS are NOT embedded;
    token id < 0 means SOS (zero embedding), matching the reference."""

    vocab_size: int  # without blank
    pred_hidden: int
    pred_rnn_layers: int = 1
    emb_dropout: float = 0.0

    def setup(self):
        self.embed = nn.Embed(self.vocab_size, self.pred_hidden)
        self.rnn = _PredStep(self.pred_hidden, self.pred_rnn_layers)
        self.drop = nn.Dropout(self.emb_dropout)

    def _embed_tokens(self, tokens: jnp.ndarray) -> jnp.ndarray:
        emb = self.embed(jnp.maximum(tokens, 0))
        return jnp.where((tokens >= 0)[..., None], emb, 0.0)

    def initial_state(self, batch: int):
        zeros = jnp.zeros((batch, self.pred_hidden), jnp.float32)
        return tuple((zeros, zeros) for _ in range(self.pred_rnn_layers))

    def __call__(
        self, targets: jnp.ndarray, *, train: bool = False
    ) -> jnp.ndarray:
        """targets [B, U] → prediction outputs [B, U+1, H] (row 0 = SOS)."""
        B, U = targets.shape
        sos = jnp.full((B, 1), -1, targets.dtype)
        tokens = jnp.concatenate([sos, targets], axis=1)  # [B, U+1]
        x = self._embed_tokens(tokens)
        x = self.drop(x, deterministic=not train)
        scan_rnn = nn.scan(
            lambda mdl, carry, xt: mdl.rnn(carry, xt),
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        carry = self.initial_state(B)
        _, out = scan_rnn(self, carry, x)
        return out  # [B, U+1, H]

    def step(self, token: jnp.ndarray, state) -> Tuple[jnp.ndarray, Any]:
        """One decode step: token [B] (−1 = SOS) + state → ([B, H], state)."""
        x = self._embed_tokens(token)
        new_state, out = self.rnn(state, x)
        return out, new_state


class RNNTJoint(nn.Module):
    """Joint network: relu(enc_proj + pred_proj) → vocab+1 logits (blank last).

    With `num_durations > 0` this is the TDT joint (reference rnnt.py TDT
    variant): a second head predicts the duration distribution."""

    num_classes: int  # without blank
    joint_hidden: int = 640
    activation: str = "relu"
    dropout: float = 0.0
    num_durations: int = 0  # >0 → TDT

    @nn.compact
    def __call__(
        self, enc: jnp.ndarray, pred: jnp.ndarray, *, train: bool = False
    ):
        """enc [..., H_e], pred [..., H_p] broadcastable → [..., V+1]
        (or (token_logits, dur_logits) for TDT).

        For training call with enc [B,T,1,H], pred [B,1,U+1,H]."""
        e = nn.Dense(self.joint_hidden, name="enc_proj")(enc)
        p = nn.Dense(self.joint_hidden, name="pred_proj")(pred)
        h = e + p
        h = {"relu": nn.relu, "tanh": jnp.tanh, "sigmoid": jax.nn.sigmoid}[self.activation](h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        tok = nn.Dense(self.num_classes + 1, name="out_proj")(h)
        if self.num_durations > 0:
            dur = nn.Dense(self.num_durations, name="dur_proj")(h)
            return tok, dur
        return tok


def rnnt_greedy_decode(
    joint_logits_fn,
    pred_step_fn,
    initial_state,
    enc: jnp.ndarray,  # [B, T, H_e]
    enc_len: jnp.ndarray,  # [B]
    blank: int,
    max_symbols: int = 10,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched greedy transducer decode as a jittable scan over frames.

    Reference parity: batched greedy / label-looping decoders
    (`rnnt_greedy_decoding.py:529,773`); here the loop is a `lax.scan` over T
    with a bounded `fori_loop` over per-frame symbol emissions — the whole
    decode is one compiled program (the reference needed CUDA graphs to get
    this, `cuda_graph_rnnt_greedy_decoding.py`).

    Returns (tokens [B, T*max_symbols] int32 padded with -1, counts [B]).
    """
    B, T, _ = enc.shape
    max_total = T * max_symbols
    buf0 = jnp.full((B, max_total), -1, jnp.int32)
    counts0 = jnp.zeros(B, jnp.int32)

    # initial prediction output from SOS
    pred_out0, state0 = pred_step_fn(jnp.full((B,), -1, jnp.int32), initial_state)

    def frame_step(carry, t):
        pred_out, state, counts, buf = carry
        enc_t = enc[:, t]  # [B, H_e]
        frame_active = t < enc_len  # [B]

        def sym_step(s, inner):
            pred_out, state, counts, buf, active = inner
            logits = joint_logits_fn(enc_t, pred_out)  # [B, V+1]
            k = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            emit = active & (k != blank)
            # write emitted symbols
            buf = buf.at[jnp.arange(B), counts].set(
                jnp.where(emit, k, buf[jnp.arange(B), counts])
            )
            counts = counts + emit.astype(jnp.int32)
            # advance prediction net where emitting
            new_out, new_state = pred_step_fn(jnp.where(emit, k, 0), state)
            pred_out = jnp.where(emit[:, None], new_out, pred_out)
            state = jax.tree.map(
                lambda n, o: jnp.where(emit[:, None], n, o), new_state, state
            )
            active = emit  # stop on first blank
            return pred_out, state, counts, buf, active

        pred_out, state, counts, buf, _ = jax.lax.fori_loop(
            0, max_symbols, sym_step, (pred_out, state, counts, buf, frame_active)
        )
        return (pred_out, state, counts, buf), None

    (pred_out, state, counts, buf), _ = jax.lax.scan(
        frame_step, (pred_out0, state0, counts0, buf0), jnp.arange(T)
    )
    return buf, counts
