"""CTC loss and greedy decoding, TPU-native.

Reference parity: `nemo/collections/asr/losses/ctc.py` (wraps torch CTCLoss)
and greedy decoding (`asr/parts/submodules/ctc_greedy_decoding.py`).

TPU-first design: the forward (alpha) recursion is a `lax.scan` over time in
log space with static shapes — variable input/target lengths are handled by
masking, and gradients come from autodiff through the scan (exactly the
beta-free formulation; XLA fuses the inner elementwise work).
Blank is the LAST index (reference convention for ConvASRDecoder).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _extend_targets(targets: jnp.ndarray, blank: int) -> jnp.ndarray:
    """[B, U] → [B, 2U+1] interleaved with blanks: b y1 b y2 ... b."""
    B, U = targets.shape
    ext = jnp.full((B, 2 * U + 1), blank, targets.dtype)
    return ext.at[:, 1::2].set(targets)


@partial(jax.jit, static_argnames=("blank_last",))
def ctc_loss(
    log_probs: jnp.ndarray,  # [B, T, V] log-softmax outputs
    input_lengths: jnp.ndarray,  # [B]
    targets: jnp.ndarray,  # [B, U] (padded with anything)
    target_lengths: jnp.ndarray,  # [B]
    blank_last: bool = True,
) -> jnp.ndarray:
    """Per-sample negative log likelihood [B]."""
    B, T, V = log_probs.shape
    U = targets.shape[1]
    blank = V - 1 if blank_last else 0
    S = 2 * U + 1

    ext = _extend_targets(targets.astype(jnp.int32), blank)  # [B, S]
    s_idx = jnp.arange(S)[None, :]
    # transition-allowed mask for the s-2 skip: label position, not blank,
    # and different from the label two back
    skip_ok = (ext != blank) & (s_idx >= 2)
    skip_ok = skip_ok & (ext != jnp.pad(ext, ((0, 0), (2, 0)))[:, :S])

    # emission log-probs gathered per extended symbol: [B, T, S]
    lp_ext = jnp.take_along_axis(
        log_probs.astype(jnp.float32), ext[:, None, :].repeat(T, axis=1), axis=2
    )

    alpha0 = jnp.full((B, S), NEG_INF)
    alpha0 = alpha0.at[:, 0].set(lp_ext[:, 0, 0])
    alpha0 = alpha0.at[:, 1].set(jnp.where(target_lengths > 0, lp_ext[:, 0, 1], NEG_INF))

    def step(alpha, t):
        a_prev1 = jnp.pad(alpha, ((0, 0), (1, 0)), constant_values=NEG_INF)[:, :S]
        a_prev2 = jnp.pad(alpha, ((0, 0), (2, 0)), constant_values=NEG_INF)[:, :S]
        a_prev2 = jnp.where(skip_ok, a_prev2, NEG_INF)
        merged = jnp.logaddexp(jnp.logaddexp(alpha, a_prev1), a_prev2)
        new_alpha = merged + lp_ext[:, t, :]
        # freeze recursion for t >= input_length (padding frames)
        active = (t < input_lengths)[:, None]
        new_alpha = jnp.where(active, new_alpha, alpha)
        return new_alpha, None

    alpha, _ = jax.lax.scan(step, alpha0, jnp.arange(1, T))

    # final states: s = 2*target_len (trailing blank) and 2*target_len - 1
    end = 2 * target_lengths
    a_end = jnp.take_along_axis(alpha, end[:, None], axis=1)[:, 0]
    a_end1 = jnp.take_along_axis(
        alpha, jnp.maximum(end - 1, 0)[:, None], axis=1
    )[:, 0]
    a_end1 = jnp.where(target_lengths > 0, a_end1, NEG_INF)
    ll = jnp.logaddexp(a_end, a_end1)
    return -ll


def ctc_loss_mean(
    log_probs, input_lengths, targets, target_lengths, blank_last=True, reduction="mean_batch"
):
    """Reduced loss matching reference reduction modes (losses/ctc.py)."""
    nll = ctc_loss(log_probs, input_lengths, targets, target_lengths, blank_last=blank_last)
    if reduction == "mean_batch":
        return jnp.mean(nll)
    if reduction == "mean":  # normalize by target lengths then average
        return jnp.mean(nll / jnp.maximum(target_lengths, 1))
    if reduction == "sum":
        return jnp.sum(nll)
    return nll


@jax.jit
def ctc_greedy_predictions(log_probs: jnp.ndarray) -> jnp.ndarray:
    """[B, T, V] → [B, T] argmax token ids (device-side)."""
    return jnp.argmax(log_probs, axis=-1)


def ctc_collapse(
    predictions, lengths, blank: int
) -> list:
    """Host-side collapse: dedup repeats then drop blanks → list of id lists.

    (String assembly is host work; the device produces only argmax ids.)
    Device-array inputs are fetched in ONE batched device_get (two
    np.asarray calls serialize into two relay round-trips), and the
    collapse itself is vectorized numpy, not a per-frame Python loop.
    """
    import numpy as np

    if hasattr(predictions, "devices") or hasattr(lengths, "devices"):
        import jax

        predictions, lengths = jax.device_get((predictions, lengths))
    predictions = np.asarray(predictions)
    lengths = np.asarray(lengths)
    out = []
    for b in range(predictions.shape[0]):
        seq = predictions[b, : int(lengths[b])]
        keep = np.empty(len(seq), bool)
        if len(seq):
            keep[0] = True
            np.not_equal(seq[1:], seq[:-1], out=keep[1:])
            keep &= seq != blank
        out.append(seq[keep].astype(int).tolist())
    return out
