"""W-Transducer loss: RNNT for utterances with missing leading/trailing text.

Reference parity: `nemo/collections/asr/parts/k2/w_transducer.py`
(GraphWTransducerLoss — "Powerful and Extensible WFST Framework for
RNN-Transducer Losses", k2 grid lattice with epsilon skip arcs). The
trained model decodes exactly like a normal RNNT model; the loss just
adds two families of epsilon arcs to the lattice:

- start-skip: one arc (0,0) → (t,0) for every t ≥ 1, weight ``eps_weight``
  — the audio before the transcript starts may be ignored at a flat cost
  instead of being explained by blanks;
- end-skip: one arc (t,U) → end for every t ≤ T−2, weight ``eps_weight``
  — likewise for audio after the transcript ends. With
  ``last_blank_mode="force_final"`` the skip lands on (T−1,U) and the
  final blank is still consumed; with ``"allow_ignore"`` it goes straight
  to the terminal state.

TPU-native design: no FSA machinery — the two arc families are two
`logaddexp` injections into the same `lax.scan` + associative-scan alpha
recursion as `ops/rnnt.py` (column u=0 gets the start-skip source, the
u=U column is accumulated per frame for the end-skip). Gradients via
autodiff, exact.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from nemo_tpu.ops.rnnt import NEG_INF, _log_recurrence


@partial(jax.jit, static_argnames=("last_blank_mode",))
def wtransducer_alpha(
    lp_blank: jnp.ndarray,  # [B, T, U1] log P(blank | t, u)
    lp_label: jnp.ndarray,  # [B, T, U1] log P(y_{u+1} | t, u)
    f_len: jnp.ndarray,  # [B] valid frames
    g_len: jnp.ndarray,  # [B] valid label rows (= U+1)
    eps_weight: float = 0.0,
    last_blank_mode: str = "force_final",
) -> jnp.ndarray:
    """Per-sample log-likelihood [B] of the W-transducer lattice."""
    if last_blank_mode not in ("force_final", "allow_ignore"):
        raise ValueError(f"unknown last_blank_mode: {last_blank_mode}")
    B, T, U1 = lp_blank.shape
    u_idx = jnp.arange(U1)[None, :]
    valid_u = u_idx < g_len[:, None]
    last_u = (g_len - 1)[:, None]  # [B,1]
    eps = jnp.float32(eps_weight)

    # t = 0 row: label-only prefix
    a0 = jnp.concatenate([jnp.full((B, 1), NEG_INF), lp_label[:, 0, :-1]], 1)
    row = _log_recurrence(a0, jnp.full((B, U1), NEG_INF).at[:, 0].set(0.0))
    row = jnp.where(valid_u, row, NEG_INF)

    def col_u(r):  # alpha[t, U_b]
        return jnp.take_along_axis(r, last_u, axis=1)[:, 0]

    # end-skip source at t=0 (valid when 0 <= f_len - 2)
    end_acc = jnp.where(f_len >= 2, col_u(row) + eps, NEG_INF)

    def step(carry, t):
        alpha_prev, end_acc = carry
        from_time = alpha_prev + lp_blank[:, t - 1]
        # start-skip arc (0,0) → (t,0): flat eps cost replaces the blanks
        from_time = from_time.at[:, 0].set(
            jnp.logaddexp(from_time[:, 0], eps))
        a = jnp.concatenate(
            [jnp.full((B, 1), NEG_INF), lp_label[:, t, :-1]], 1)
        new_row = jnp.where(valid_u, _log_recurrence(a, from_time), NEG_INF)
        active = (t < f_len)[:, None]
        new_row = jnp.where(active, new_row, alpha_prev)
        # end-skip source (t, U) for t <= T_b - 2
        contrib = jnp.where(t <= f_len - 2, col_u(new_row) + eps, NEG_INF)
        return (new_row, jnp.logaddexp(end_acc, contrib)), None

    (alpha_last, end_acc), _ = jax.lax.scan(
        step, (row, end_acc), jnp.arange(1, T))

    a_fin = col_u(alpha_last)  # alpha[T_b-1, U_b]
    bt = jnp.take_along_axis(
        lp_blank, (f_len - 1)[:, None, None].repeat(U1, 2), axis=1)[:, 0, :]
    b_fin = jnp.take_along_axis(bt, last_u, axis=1)[:, 0]
    if last_blank_mode == "force_final":
        # skips land on (T-1, U); the final blank is still consumed
        return jnp.logaddexp(a_fin, end_acc) + b_fin
    # allow_ignore: skips bypass the final blank entirely
    return jnp.logaddexp(a_fin + b_fin, end_acc)


@partial(jax.jit, static_argnames=("blank_last", "last_blank_mode"))
def wtransducer_loss(
    logits: jnp.ndarray,  # [B, T, U+1, V+1] joint logits
    targets: jnp.ndarray,  # [B, U]
    f_len: jnp.ndarray,
    t_len: jnp.ndarray,
    eps_weight: float = 0.0,
    last_blank_mode: str = "force_final",
    blank_last: bool = True,
) -> jnp.ndarray:
    """W-Transducer NLL [B] (blank = last logit index by convention)."""
    B, T, U1, V1 = logits.shape
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    blank = V1 - 1 if blank_last else 0
    lp_blank = lp[..., blank]
    tgt = jnp.concatenate([targets, jnp.zeros((B, 1), targets.dtype)], 1)
    lp_label = jnp.take_along_axis(
        lp, tgt[:, None, :, None].repeat(T, 1), axis=3)[..., 0]
    return -wtransducer_alpha(
        lp_blank, lp_label, f_len, t_len + 1,
        eps_weight=eps_weight, last_blank_mode=last_blank_mode)
