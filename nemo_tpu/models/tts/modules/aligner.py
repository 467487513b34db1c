"""Alignment module for TTS: unsupervised text↔mel durations.

Reference parity: `nemo/collections/tts/modules/aligner.py` AlignmentEncoder
(+ `models/aligner.py`): distance-based soft attention between text and mel
encodings, trained with the monotonic forward-sum loss; hard durations
extracted with Viterbi (the reference's binarization step for FastPitch
training without external duration labels).

TPU-native: forward-sum and Viterbi are `lax.scan` DPs over mel frames in
log space (the alignment lattice is CTC-without-blank: each frame advances
the text position by 0 or 1).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


class AlignmentEncoder(nn.Module):
    """Produces log attention [B, T_mel, U_text] from mel + text encodings."""

    d_att: int = 128
    temperature: float = 0.0005

    @nn.compact
    def __call__(self, text_emb: jnp.ndarray, mel: jnp.ndarray,
                 text_mask: jnp.ndarray, mel_mask: jnp.ndarray) -> jnp.ndarray:
        """text_emb [B, U, D_t], mel [B, T, D_m] → log-probs [B, T, U]."""
        k = nn.Conv(self.d_att, (3,), padding="SAME", name="key_conv1")(text_emb)
        k = nn.relu(k)
        k = nn.Conv(self.d_att, (1,), name="key_conv2")(k)
        q = nn.Conv(self.d_att, (3,), padding="SAME", name="query_conv1")(mel)
        q = nn.relu(q)
        q = nn.Conv(self.d_att, (1,), name="query_conv2")(q)
        # negative squared distance attention (reference aligner.py)
        dist = (
            jnp.sum(q * q, -1, keepdims=True)
            - 2.0 * jnp.einsum("btd,bud->btu", q, k)
            + jnp.sum(k * k, -1)[:, None, :]
        )
        logits = -self.temperature * dist
        logits = jnp.where(text_mask[:, None, :], logits, NEG_INF)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return jnp.where(mel_mask[:, :, None], logp, NEG_INF)


@jax.jit
def forward_sum_loss(
    log_attn: jnp.ndarray,  # [B, T, U] log p(text u | frame t)
    text_len: jnp.ndarray,  # [B]
    mel_len: jnp.ndarray,  # [B]
) -> jnp.ndarray:
    """Monotonic alignment NLL: paths start at u=0, end at u=U-1, advance by
    0/1 per frame (reference: forward-sum / alignment CTC loss)."""
    B, T, U = log_attn.shape
    alpha0 = jnp.full((B, U), NEG_INF).at[:, 0].set(log_attn[:, 0, 0])

    def step(alpha, t):
        stay = alpha
        move = jnp.concatenate([jnp.full((B, 1), NEG_INF), alpha[:, :-1]], axis=1)
        new = jnp.logaddexp(stay, move) + log_attn[:, t]
        active = (t < mel_len)[:, None]
        return jnp.where(active, new, alpha), None

    alpha, _ = jax.lax.scan(step, alpha0, jnp.arange(1, T))
    ll = jnp.take_along_axis(alpha, (text_len - 1)[:, None], axis=1)[:, 0]
    return -ll / jnp.maximum(mel_len.astype(jnp.float32), 1.0)


@jax.jit
def viterbi_durations(
    log_attn: jnp.ndarray,  # [B, T, U]
    text_len: jnp.ndarray,
    mel_len: jnp.ndarray,
) -> jnp.ndarray:
    """Hard monotonic alignment → per-token durations [B, U] (sums to mel_len)."""
    B, T, U = log_attn.shape
    alpha0 = jnp.full((B, U), NEG_INF).at[:, 0].set(log_attn[:, 0, 0])

    def fwd(alpha, t):
        stay = alpha
        move = jnp.concatenate([jnp.full((B, 1), NEG_INF), alpha[:, :-1]], axis=1)
        choose_move = move > stay  # True → came from u-1
        new = jnp.maximum(stay, move) + log_attn[:, t]
        active = (t < mel_len)[:, None]
        return jnp.where(active, new, alpha), jnp.where(active, choose_move, False)

    alpha, moves = jax.lax.scan(fwd, alpha0, jnp.arange(1, T))  # moves [T-1, B, U]

    # backtrack from (mel_len-1, text_len-1)
    def back(carry, t_rev):
        u, dur = carry
        t = T - 2 - t_rev  # moves index for frame t+1
        within = (t + 1) < mel_len
        moved = jnp.take_along_axis(moves[t], u[:, None], axis=1)[:, 0] & within
        dur = dur.at[jnp.arange(B), u].add(within.astype(jnp.int32))
        u = jnp.where(moved, u - 1, u)
        return (u, dur), None

    u0 = text_len - 1
    dur0 = jnp.zeros((B, U), jnp.int32)
    (u, dur), _ = jax.lax.scan(back, (u0, dur0), jnp.arange(T - 1))
    dur = dur.at[jnp.arange(B), 0].add(1)  # frame 0 always at token 0
    return dur


@partial(jax.jit, static_argnames=("U", "T", "scaling"))
def beta_binomial_prior(
    text_len: jnp.ndarray,  # [B]
    mel_len: jnp.ndarray,  # [B]
    U: int,
    T: int,
    scaling: float = 1.0,
) -> jnp.ndarray:
    """Log beta-binomial alignment prior [B, T, U], fully on-device.

    Reference parity: `nemo/collections/tts/parts/utils/helpers.py`
    `beta_binomial_prior_distribution` (scipy.stats.betabinom loop over mel
    frames) — here one vectorized gammaln evaluation over the [T, U] lattice
    per batch element instead of a per-frame scipy host loop.

    For mel frame t (1-based) of M frames over N=text_len tokens:
      prior[t-1, k] = BetaBinomial(k; N-1, t*w, (M+1-t)*w).logpmf
    which concentrates mass along the diagonal k ≈ N * t / M.
    """
    gammaln = jax.scipy.special.gammaln

    def lbeta(a, b):
        return gammaln(a) + gammaln(b) - gammaln(a + b)

    t = jnp.arange(1, T + 1, dtype=jnp.float32)[None, :, None]  # [1, T, 1]
    k = jnp.arange(U, dtype=jnp.float32)[None, None, :]  # [1, 1, U]
    N = text_len.astype(jnp.float32)[:, None, None]  # [B, 1, 1]
    M = mel_len.astype(jnp.float32)[:, None, None]
    n = jnp.maximum(N - 1.0, 0.0)
    a = t * scaling
    b = jnp.maximum(M + 1.0 - t, 1.0) * scaling
    log_comb = gammaln(n + 1.0) - gammaln(k + 1.0) - gammaln(jnp.maximum(n - k, 0.0) + 1.0)
    logp = log_comb + lbeta(k + a, n - k + b) - lbeta(a, b)
    valid = (k <= n) & (t - 1 < M) & (k < N)
    return jnp.where(valid, logp, NEG_INF)


def binarization_loss(
    log_attn: jnp.ndarray,  # [B, T, U] soft log attention
    durations: jnp.ndarray,  # [B, U] hard Viterbi durations
    mel_len: jnp.ndarray,  # [B]
) -> jnp.ndarray:
    """KL bin loss: -mean log p_soft(hard path) (reference `BinLoss`,
    `nemo/collections/tts/losses/aligner_loss.py`). Encourages the soft
    attention to peak on the binarized alignment."""
    B, T, U = log_attn.shape
    # frame t's hard token = searchsorted(cumsum(dur), t)
    ends = jnp.cumsum(durations, axis=-1)  # [B, U]
    frames = jnp.arange(T)[None, :]  # [1, T]
    hard_u = jnp.sum(frames[:, :, None] >= ends[:, None, :], axis=-1)  # [B, T]
    hard_u = jnp.clip(hard_u, 0, U - 1)
    picked = jnp.take_along_axis(log_attn, hard_u[:, :, None], axis=2)[..., 0]
    mask = frames < mel_len[:, None]
    picked = jnp.clip(picked, -40.0, 0.0)  # reference clamps p >= ~1e-12
    return -jnp.sum(jnp.where(mask, picked, 0.0)) / jnp.maximum(jnp.sum(mask), 1)
