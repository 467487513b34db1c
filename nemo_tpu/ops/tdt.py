"""TDT (Token-and-Duration Transducer) loss + greedy decode.

Reference parity: TDTLossNumba (`asr/losses/rnnt.py:54-158` resolver →
numba-CUDA TDT kernels in `gpu_rnnt_kernel.py`) and TDT label-looping
decoding (`tdt_label_looping.py:183`). TDT extends RNNT with a duration
head: every emission (token or blank) also predicts how many encoder frames
to skip — decoding then visits only a fraction of frames.

TPU-native DP: scan over t with a rolling alpha history of depth
max(durations); the duration-0 token self-transition within a row is the
same log-semiring linear recurrence as RNNT (associative scan over u).
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


@partial(jax.jit, static_argnames=("durations",))
def tdt_loss(
    token_logits: jnp.ndarray,  # [B, T, U+1, V+1] (blank last)
    dur_logits: jnp.ndarray,  # [B, T, U+1, D]
    targets: jnp.ndarray,  # [B, U]
    f_len: jnp.ndarray,  # [B]
    t_len: jnp.ndarray,  # [B]
    durations: Tuple[int, ...] = (0, 1, 2, 3, 4),
) -> jnp.ndarray:
    """Negative log-likelihood [B]. durations[0] must be 0 and the rest
    ascending (the reference convention)."""
    B, T, U1, V1 = token_logits.shape
    D = len(durations)
    assert durations[0] == 0
    lp_tok_all = jax.nn.log_softmax(token_logits.astype(jnp.float32), axis=-1)
    lp_dur = jax.nn.log_softmax(dur_logits.astype(jnp.float32), axis=-1)
    blank = V1 - 1

    lp_blank = lp_tok_all[..., blank]  # [B, T, U1]
    tgt = jnp.concatenate([targets, jnp.zeros((B, 1), targets.dtype)], axis=1)
    lp_label = jnp.take_along_axis(
        lp_tok_all, tgt[:, None, :, None].repeat(T, 1), axis=3
    )[..., 0]  # [B, T, U1]

    u_idx = jnp.arange(U1)[None, :]
    valid_u = u_idx < (t_len + 1)[:, None]

    d_max = durations[-1]
    durs = jnp.asarray(durations)

    # rolling history: hist[i] = alpha[t-1-i], i in [0, d_max)
    hist0 = jnp.full((d_max, B, U1), NEG_INF)

    def row(t, hist):
        """alpha[t] from history (blank/token with d>=1) + d=0 recurrence."""
        # contributions with duration d >= 1 (source time t-d)
        def contrib(d_i):
            d = durs[d_i]
            src_t = t - d
            ok = (d >= 1) & (src_t >= 0)
            a_src = hist[jnp.maximum(d - 1, 0)]  # alpha[t-d]
            src_t_c = jnp.maximum(src_t, 0)
            bl = a_src + lp_blank[:, src_t_c] + lp_dur[:, src_t_c, :, d_i]
            # token: from u-1 row
            tk = a_src + lp_label[:, src_t_c] + lp_dur[:, src_t_c, :, d_i]
            tk = jnp.concatenate([jnp.full((B, 1), NEG_INF), tk[:, :-1]], axis=1)
            out = jnp.logaddexp(bl, tk)
            return jnp.where(ok, out, NEG_INF)

        parts = [contrib(i) for i in range(D)]
        base = parts[0]
        for p in parts[1:]:
            base = jnp.logaddexp(base, p)
        # d=0 token self-row recurrence: alpha[t,u] ⊇ alpha[t,u-1]+tok+dur0
        a0 = lp_label[:, t] + lp_dur[:, t, :, 0]
        a0 = jnp.concatenate([jnp.full((B, 1), NEG_INF), a0[:, :-1]], axis=1)
        alpha_t = _log_recurrence(a0, base)
        return jnp.where(valid_u, alpha_t, NEG_INF)

    # t = 0 row: only reachable via d=0 token chains from alpha[0,0]=0
    a0 = lp_label[:, 0] + lp_dur[:, 0, :, 0]
    a0 = jnp.concatenate([jnp.full((B, 1), NEG_INF), a0[:, :-1]], axis=1)
    b0 = jnp.full((B, U1), NEG_INF).at[:, 0].set(0.0)
    alpha0 = jnp.where(valid_u, _log_recurrence(a0, b0), NEG_INF)

    def step(carry, t):
        hist, ll = carry
        alpha_t = row(t, hist)
        # freeze past f_len
        active = (t < f_len)[:, None]
        prev = hist[0]
        alpha_t = jnp.where(active, alpha_t, prev)
        hist = jnp.concatenate([alpha_t[None], hist[:-1]], axis=0)
        return (hist, ll), None

    hist = jnp.concatenate([alpha0[None], hist0[:-1]], axis=0)
    (hist, _), _ = jax.lax.scan(step, (hist, jnp.zeros(B)), jnp.arange(1, T))
    alpha_last = hist[0]  # alpha at t = f_len-1 (frozen)

    # final: from (f_len-1, U) emit blank with any duration d>=1
    last_u = t_len[:, None]
    a_fin = jnp.take_along_axis(alpha_last, last_u, axis=1)[:, 0]
    ft = (f_len - 1)[:, None, None]
    bl = jnp.take_along_axis(lp_blank, ft.repeat(U1, 2), axis=1)[:, 0]
    bl_fin = jnp.take_along_axis(bl, t_len[:, None], axis=1)[:, 0]
    du = jnp.take_along_axis(lp_dur, ft[..., None].repeat(U1, 2).repeat(D, 3), axis=1)[:, 0]
    du_fin = jnp.take_along_axis(
        du, t_len[:, None, None].repeat(D, 2), axis=1
    )[:, 0]  # [B, D]
    exit_dur = jax.nn.logsumexp(
        jnp.where(durs[None, :] >= 1, du_fin, NEG_INF), axis=-1
    )
    return -(a_fin + bl_fin + exit_dur)


def tdt_greedy_decode(
    joint_fn,  # (enc_t [B,H], pred [B,Hp]) -> (token_logits [B,V+1], dur_logits [B,D])
    pred_step_fn,
    initial_state,
    enc: jnp.ndarray,  # [B, T, H]
    enc_len: jnp.ndarray,
    blank: int,
    durations: Tuple[int, ...] = (0, 1, 2, 3, 4),
    max_steps_factor: int = 2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Frame-skipping greedy decode: each emission jumps `durations[argmax]`
    frames (blank forces ≥1). Visits ≤ max_steps = factor·T loop steps but
    typically far fewer frames — the TDT speedup."""
    B, T, _ = enc.shape
    durs = jnp.asarray(durations)
    max_steps = T * max_steps_factor
    buf0 = jnp.full((B, max_steps), -1, jnp.int32)

    pred_out0, state0 = pred_step_fn(jnp.full((B,), -1, jnp.int32), initial_state)

    def cond(c):
        t, *_ = c
        return jnp.any(t < enc_len) & (c[-1] < max_steps)

    def body(c):
        t, counts, buf, pred_out, state, it = c
        t_c = jnp.minimum(t, T - 1)
        enc_t = jnp.take_along_axis(enc, t_c[:, None, None].repeat(enc.shape[2], 2), axis=1)[:, 0]
        tok_logits, dur_logits = joint_fn(enc_t, pred_out)
        k = jnp.argmax(tok_logits, axis=-1).astype(jnp.int32)
        d = durs[jnp.argmax(dur_logits, axis=-1)]
        active = t < enc_len
        emit = active & (k != blank)
        buf = buf.at[jnp.arange(B), counts].set(jnp.where(emit, k, buf[jnp.arange(B), counts]))
        counts = counts + emit.astype(jnp.int32)
        new_out, new_state = pred_step_fn(jnp.where(emit, k, 0), state)
        pred_out = jnp.where(emit[:, None], new_out, pred_out)
        state = jax.tree.map(lambda n, o: jnp.where(emit[:, None], n, o), new_state, state)
        # blank must advance at least 1 frame
        d = jnp.where(k == blank, jnp.maximum(d, 1), d)
        t = jnp.where(active, t + d, t)
        return (t, counts, buf, pred_out, state, it + 1)

    t0 = jnp.zeros(B, jnp.int32)
    counts0 = jnp.zeros(B, jnp.int32)
    out = jax.lax.while_loop(cond, body, (t0, counts0, buf0, pred_out0, state0, 0))
    return out[2], out[1]
