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
