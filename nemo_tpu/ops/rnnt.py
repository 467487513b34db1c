"""RNN-Transducer (RNNT) loss + greedy decode primitives, TPU-native.

Reference parity: the numba-CUDA warp kernels
(`asr/parts/numba/rnnt_loss/utils/cuda_utils/gpu_rnnt_kernel.py`, 1,439 LoC:
alpha/beta wavefront kernels) and `losses/rnnt.py` resolver. SURVEY.md §2.9
maps these to "Pallas TPU kernel or lax.scan dynamic-program with custom_vjp".

TPU-first design here:
- The alpha recursion runs as a `lax.scan` over T; the within-row dependency
  over U (alpha[t,u] = logaddexp(alpha[t-1,u]+blank, alpha[t,u-1]+label)) is
  a log-semiring linear recurrence solved with `lax.associative_scan` — so
  each scan step is O(log U) depth of fully-vectorized VPU work instead of a
  sequential U-loop. Gradients come from autodiff through the scan (exact).
- The joint tensor [B,T,U,V] is the memory hot spot (the reference chunks it,
  rnnt.py:1280 memory-chunked joint); `rnnt_loss_from_logits` accepts a
  `fused_log_softmax`-style pre-gathered (blank, label) pair to allow chunked
  producers.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _log_recurrence(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve x_u = logaddexp(b_u, x_{u-1} + a_u) for u = 0..U-1 (x_{-1}=-inf)
    via associative scan over the log semiring.

    Elements are (A, B) with composition (A1,B1)∘(A2,B2) =
    (A1+A2, logaddexp(B1+A2, B2)); x_u = B of the prefix product.
    a, b: [..., U] along the last axis.
    """

    def combine(l, r):
        al, bl = l
        ar, br = r
        return al + ar, jnp.logaddexp(bl + ar, br)

    _, x = jax.lax.associative_scan(combine, (a, b), axis=-1)
    return x


@partial(jax.jit, static_argnames=())
def rnnt_alpha(
    lp_blank: jnp.ndarray,  # [B, T, U1] log P(blank | t, u)
    lp_label: jnp.ndarray,  # [B, T, U1] log P(y_{u+1} | t, u) (last col unused)
    f_len: jnp.ndarray,  # [B] valid frames
    g_len: jnp.ndarray,  # [B] valid label positions (U1 = U+1 rows; g_len = U+1)
) -> jnp.ndarray:
    """Forward variables, returning per-sample log-likelihood [B]."""
    B, T, U1 = lp_blank.shape

    u_idx = jnp.arange(U1)[None, :]
    valid_u = u_idx < g_len[:, None]  # [B, U1]

    # label advance within a row: alpha[t,u] <- alpha[t,u-1] + lp_label[t,u-1]
    # shift label lp right by one in u
    def row_update(alpha_prev_row, lp_b_t, lp_l_t, t):
        # contribution from below (time step): alpha[t-1, u] + blank[t-1, u]
        from_time = alpha_prev_row + lp_b_t  # uses lp_blank at t-1 (passed in)
        # in-row recurrence over u with label lp at u-1
        a = jnp.concatenate([jnp.full((B, 1), NEG_INF), lp_l_t[:, :-1]], axis=1)
        x = _log_recurrence(a, from_time)
        return x

    alpha0_b = jnp.full((B, U1), NEG_INF).at[:, 0].set(0.0)
    # t=0 row: alpha[0,u] = sum_{k<u} label[0,k]
    a0 = jnp.concatenate(
        [jnp.full((B, 1), NEG_INF), lp_label[:, 0, :-1]], axis=1
    )
    alpha_row = _log_recurrence(a0, alpha0_b)
    alpha_row = jnp.where(valid_u, alpha_row, NEG_INF)

    def step(carry, t):
        alpha_prev, ll = carry
        row = row_update(alpha_prev, lp_blank[:, t - 1], lp_label[:, t], t)
        row = jnp.where(valid_u, row, NEG_INF)
        active = (t < f_len)[:, None]
        row = jnp.where(active, row, alpha_prev)
        # accumulate final ll when t == f_len - 1 handled after scan
        return (row, ll), row

    (alpha_last, _), _ = jax.lax.scan(
        step, (alpha_row, jnp.zeros(B)), jnp.arange(1, T)
    )

    # ll = alpha[T_b-1, U_b-1(=g_len-1)] + blank at that cell
    last_u = (g_len - 1)[:, None]
    a_fin = jnp.take_along_axis(alpha_last, last_u, axis=1)[:, 0]
    # need blank lp at (f_len-1, g_len-1)
    bt = jnp.take_along_axis(
        lp_blank, (f_len - 1)[:, None, None].repeat(U1, 2), axis=1
    )[:, 0, :]
    b_fin = jnp.take_along_axis(bt, last_u, axis=1)[:, 0]
    return a_fin + b_fin


def rnnt_loss_from_log_probs(
    lp_blank: jnp.ndarray, lp_label: jnp.ndarray, f_len, g_len
) -> jnp.ndarray:
    """Negative log-likelihood [B] from pre-gathered blank/label log-probs."""
    return -rnnt_alpha(lp_blank, lp_label, f_len, g_len)


@partial(jax.jit, static_argnames=("blank_last",))
def rnnt_loss(
    logits: jnp.ndarray,  # [B, T, U+1, V+1] joint logits
    targets: jnp.ndarray,  # [B, U] label ids
    f_len: jnp.ndarray,  # [B] encoder lengths
    t_len: jnp.ndarray,  # [B] target lengths
    blank_last: bool = True,
) -> jnp.ndarray:
    """Full (unchunked) RNNT NLL [B]. Blank is the last logit index
    (reference convention)."""
    B, T, U1, V1 = logits.shape
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    blank = V1 - 1 if blank_last else 0
    lp_blank = lp[..., blank]  # [B, T, U1]
    # label lp at (t, u) = lp[t, u, y_{u+1}]
    tgt = jnp.concatenate([targets, jnp.zeros((B, 1), targets.dtype)], axis=1)  # pad
    lp_label = jnp.take_along_axis(
        lp, tgt[:, None, :, None].repeat(T, 1), axis=3
    )[..., 0]
    return rnnt_loss_from_log_probs(lp_blank, lp_label, f_len, t_len + 1)


def rnnt_loss_mean(logits, targets, f_len, t_len, reduction="mean_batch"):
    nll = rnnt_loss(logits, targets, f_len, t_len)
    if reduction == "mean_batch":
        return jnp.mean(nll)
    if reduction == "sum":
        return jnp.sum(nll)
    return nll
