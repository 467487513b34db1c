"""LLM losses.

Reference parity: MaskedTokenLossReduction
(`nemo/lightning/megatron_parallel.py:1671` — masked CE averaged over
valid tokens across DP/CP). On TPU the cross-entropy runs on
vocab-sharded logits; XLA's GSPMD handles the sharded log-softmax
reduction (the vocab-parallel CE of the reference).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def masked_token_loss(
    logits: jnp.ndarray,  # [B, S, V] fp32
    labels: jnp.ndarray,  # [B, S] int32
    loss_mask: Optional[jnp.ndarray] = None,  # [B, S] {0,1}
    z_loss: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (mean loss over valid tokens, num valid tokens)."""
    logits = logits.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    nll = lse - gold
    if z_loss:
        nll = nll + z_loss * jnp.square(lse)
    if loss_mask is None:
        loss_mask = jnp.ones_like(nll)
    loss_mask = loss_mask.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(loss_mask), 1.0)
    return jnp.sum(nll * loss_mask) / n, n


def fused_linear_cross_entropy(
    hidden: jnp.ndarray,  # [B, S, D] (compute dtype)
    head_w_vd: jnp.ndarray,  # [V, D] LM head (tied embedding or kernel.T)
    labels: jnp.ndarray,  # [B, S]
    loss_mask: Optional[jnp.ndarray] = None,
    z_loss: float = 0.0,
    logit_softcapping: Optional[float] = None,
    chunk: int = 512,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked CE computed from hidden states WITHOUT materializing the full
    [B, S, V] logits: a rematerialized scan over sequence chunks keeps only
    one [B, chunk, V] logits tile alive in either pass. The large-vocab
    memory fix the reference gets from vocab-parallel fused CE
    (Megatron vocab-parallel cross entropy; automodel/loss/linear_ce.py).

    Returns (mean loss over valid tokens, num valid tokens)."""
    B, S, D = hidden.shape
    c = min(chunk, S)
    while S % c:
        c -= 1
    n_chunks = S // c
    if loss_mask is None:
        loss_mask = jnp.ones((B, S), jnp.float32)
    hs = hidden.reshape(B, n_chunks, c, D).transpose(1, 0, 2, 3)
    ls = labels.reshape(B, n_chunks, c).transpose(1, 0, 2)
    ms = loss_mask.astype(jnp.float32).reshape(B, n_chunks, c).transpose(1, 0, 2)

    @jax.checkpoint
    def body(carry, xs):
        loss_sum, n_sum = carry
        h, lab, m = xs
        logits = jnp.einsum(
            "bcd,vd->bcv", h, head_w_vd.astype(h.dtype),
            preferred_element_type=jnp.float32,
        )
        if logit_softcapping:
            logits = logit_softcapping * jnp.tanh(logits / logit_softcapping)
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        gold = jnp.take_along_axis(logits, lab[..., None], axis=-1)[..., 0]
        nll = lse - gold
        if z_loss:
            nll = nll + z_loss * jnp.square(lse)
        return (loss_sum + jnp.sum(nll * m), n_sum + jnp.sum(m)), None

    (loss_sum, n_sum), _ = jax.lax.scan(
        body, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)), (hs, ls, ms)
    )
    n = jnp.maximum(n_sum, 1.0)
    return loss_sum / n, n
