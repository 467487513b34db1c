"""Multi-blank transducer (multiblank RNNT) loss + greedy decode.

Reference parity: MultiblankRNNTLossNumba (`asr/losses/rnnt.py` resolver →
`parts/numba/rnnt_loss/rnnt_numpy.py` / multiblank GPU kernels in
`gpu_rnnt_kernel.py`) and the multiblank greedy decoding in
`rnnt_greedy_decoding.py` (big_blank_durations). Big blanks are extra
output classes that consume several encoder frames at once — decoding then
skips frames wholesale (the paper's inference speedup), and the loss
marginalizes over all blank durations.

Layout: logits [B, T, U+1, V+1+NB]; index V is the standard blank
(duration 1), index V+1+i is the big blank with duration
big_blank_durations[i] (>1).

TPU-native DP: lax.scan over frames t with a rolling alpha history of
depth max(durations) (the same structure as ops/tdt.py); the within-row
label recurrence over u is the log-semiring linear recurrence solved with
an associative scan.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _log_recurrence(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """x_u = logaddexp(b_u, x_{u-1} + a_u) over the last axis."""

    def combine(l, r):
        al, bl = l
        ar, br = r
        return al + ar, jnp.logaddexp(bl + ar, br)

    _, x = jax.lax.associative_scan(combine, (a, b), axis=-1)
    return x


@partial(jax.jit, static_argnames=("big_blank_durations",))
def multiblank_rnnt_loss(
    logits: jnp.ndarray,  # [B, T, U+1, V+1+NB]
    targets: jnp.ndarray,  # [B, U] int32
    f_len: jnp.ndarray,  # [B] encoder frames
    t_len: jnp.ndarray,  # [B] target lengths
    big_blank_durations: Tuple[int, ...] = (2, 4),
) -> jnp.ndarray:
    """−log p(targets | logits), exact marginalization over blank durations."""
    B, T, U1, VNB = logits.shape
    NB = len(big_blank_durations)
    V = VNB - 1 - NB  # real vocab size (index V = standard blank)
    durs = (1,) + tuple(big_blank_durations)
    D = max(durs)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    # label emission log-probs: lp_label[b, t, u] = logp[b, t, u, y_u]
    tgt = jnp.minimum(targets, V - 1)
    lp_label = jnp.take_along_axis(
        logp[:, :, :-1, :], tgt[:, None, :, None], axis=-1
    )[..., 0]  # [B, T, U]
    u_valid = jnp.arange(U1 - 1)[None, None, :] < t_len[:, None, None]
    lp_label = jnp.where(u_valid, lp_label, NEG_INF)

    # blank log-probs per duration: index V for d=1, V+1+i for big blanks
    lp_blank = [logp[..., V]] + [logp[..., V + 1 + i] for i in range(NB)]

    # hist[d-1] = alpha row at frame t-d (rolling)
    hist0 = jnp.full((D, B, U1), NEG_INF)

    def step(hist, t):
        # blank arrivals into row t from rows t-d
        contribs = []
        for i, d in enumerate(durs):
            prev = hist[d - 1]  # alpha at t-d
            lp = jnp.where(
                (t - d) >= 0,
                lp_blank[i][:, jnp.maximum(t - d, 0), :],
                NEG_INF,
            )
            contribs.append(prev + lp)
        from_blank = jax.nn.logsumexp(jnp.stack(contribs), axis=0)  # [B, U1]
        from_blank = jnp.where(t == 0,
                               jnp.full((B, U1), NEG_INF).at[:, 0].set(0.0),
                               from_blank)
        # within-row label recurrence: alpha[t,u] = logaddexp(from_blank[u],
        #   alpha[t,u-1] + label(t, u-1))
        lab_t = lp_label[:, t, :]
        a = jnp.concatenate([jnp.full((B, 1), NEG_INF), lab_t], axis=1)  # [B,U1]
        alpha_t = _log_recurrence(a, from_blank)
        hist = jnp.concatenate([alpha_t[None], hist[:-1]], axis=0)
        return hist, alpha_t

    _, alphas = jax.lax.scan(step, hist0, jnp.arange(T))  # [T, B, U1]

    # finish: last emission is any blank landing exactly at f_len
    finals = []
    for i, d in enumerate(durs):
        t_last = f_len - d  # row where the final blank is emitted
        ok = t_last >= 0
        t_c = jnp.maximum(t_last, 0)
        alpha_f = alphas[t_c, jnp.arange(B)]  # [B, U1]
        alpha_fu = jnp.take_along_axis(alpha_f, t_len[:, None], axis=1)[:, 0]
        lp_f = lp_blank[i][jnp.arange(B), t_c]
        lp_fu = jnp.take_along_axis(lp_f, t_len[:, None], axis=1)[:, 0]
        finals.append(jnp.where(ok, alpha_fu + lp_fu, NEG_INF))
    ll = jax.nn.logsumexp(jnp.stack(finals), axis=0)
    return -ll


def multiblank_greedy_decode(
    joint_fn,  # (enc_t [B,H], pred [B,Hp]) -> logits [B, V+1+NB]
    pred_step_fn,
    initial_state,
    enc: jnp.ndarray,  # [B, T, H]
    enc_len: jnp.ndarray,
    blank: int,  # index of the standard blank (= V)
    big_blank_durations: Tuple[int, ...] = (2, 4),
    max_symbols: int = 10,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Frame-skipping greedy: argmax over [tokens | blanks]; big blanks jump
    their duration (reference rnnt_greedy_decoding.py multiblank path)."""
    B, T, _ = enc.shape
    durs = jnp.asarray((1,) + tuple(big_blank_durations))
    max_steps = T * (max_symbols + 1)
    buf0 = jnp.full((B, T * max_symbols), -1, jnp.int32)
    pred_out0, state0 = pred_step_fn(jnp.full((B,), -1, jnp.int32), initial_state)

    def cond(c):
        t, *_ , it = c
        return jnp.any(t < enc_len) & (it < max_steps)

    def body(c):
        t, counts, sym, buf, pred_out, state, it = c
        t_c = jnp.minimum(t, T - 1)
        enc_t = jnp.take_along_axis(
            enc, t_c[:, None, None].repeat(enc.shape[2], 2), axis=1)[:, 0]
        logits = joint_fn(enc_t, pred_out)
        k = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        force_blank = sym >= max_symbols
        k = jnp.where(force_blank, blank, k)
        active = t < enc_len
        is_tok = k < blank
        emit = active & is_tok
        pos = jnp.minimum(counts, buf.shape[1] - 1)
        buf = buf.at[jnp.arange(B), pos].set(
            jnp.where(emit, k, buf[jnp.arange(B), pos]))
        counts = counts + emit.astype(jnp.int32)
        sym = jnp.where(emit, sym + 1, sym)
        new_out, new_state = pred_step_fn(jnp.where(emit, k, 0), state)
        pred_out = jnp.where(emit[:, None], new_out, pred_out)
        state = jax.tree.map(
            lambda n, o: jnp.where(emit[:, None], n, o), new_state, state)
        # blanks advance by their duration (standard=1)
        blank_idx = jnp.clip(k - blank, 0, durs.shape[0] - 1)
        adv = jnp.where(active & ~is_tok, durs[blank_idx], 0)
        t = t + adv
        sym = jnp.where(active & ~is_tok, 0, sym)
        return (t, counts, sym, buf, pred_out, state, it + 1)

    t0 = jnp.zeros(B, jnp.int32)
    z = jnp.zeros(B, jnp.int32)
    out = jax.lax.while_loop(
        cond, body, (t0, z, z, buf0, pred_out0, state0, 0))
    return out[3], out[1]
