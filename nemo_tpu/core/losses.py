"""Common losses + Perplexity metric.

Reference parity: `nemo/collections/common/losses/` (SmoothedCrossEntropy
in smoothed_cross_entropy.py, CrossEntropyLoss/MSELoss wrappers in
cross_entropy.py/mse_loss.py, CosineSimilarityLoss in bce-style
similarity losses) and `common/metrics/perplexity.py` (running Perplexity
over masked token NLL).

All pure jnp functions usable inside any jitted step; the Perplexity
metric is a tiny running-state accumulator (host side, like the WER
metric in models/asr/metrics.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def smoothed_cross_entropy(logits, labels, pad_id=None,
                           label_smoothing: float = 0.0, mask=None):
    """Label-smoothed CE (common/losses/smoothed_cross_entropy.py):
    target distribution (1−ε) on the label + ε/(V−1) elsewhere; positions
    equal to pad_id (or mask==0) are excluded from the mean."""
    V = logits.shape[-1]
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
    nll = -jnp.take_along_axis(lp, labels[..., None], -1)[..., 0]
    if label_smoothing > 0:
        eps = label_smoothing
        smooth = -(lp.sum(-1) - jnp.take_along_axis(
            lp, labels[..., None], -1)[..., 0]) / max(V - 1, 1)
        nll = (1 - eps) * nll + eps * smooth
    if mask is None:
        mask = jnp.ones(labels.shape, jnp.float32)
    else:
        mask = mask.astype(jnp.float32)
    if pad_id is not None:
        mask = mask * (labels != pad_id)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def cosine_similarity_loss(a, b, mask=None, eps: float = 1e-8):
    """1 − cos(a, b) over the last dim, mean over (masked) positions
    (the SimilarityLoss family used by distillation/SSL heads)."""
    an = a * jax.lax.rsqrt(jnp.sum(jnp.square(a), -1, keepdims=True) + eps)
    bn = b * jax.lax.rsqrt(jnp.sum(jnp.square(b), -1, keepdims=True) + eps)
    sim = jnp.sum(an * bn, -1)
    loss = 1.0 - sim
    if mask is not None:
        m = mask.astype(jnp.float32)
        return jnp.sum(loss * m) / jnp.maximum(jnp.sum(m), 1.0)
    return jnp.mean(loss)


def masked_token_nll(logits, labels, mask=None):
    """Summed NLL + token count — the Perplexity accumulator's step
    quantities, computed on device."""
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
    nll = -jnp.take_along_axis(lp, labels[..., None], -1)[..., 0]
    if mask is None:
        mask = jnp.ones(labels.shape, jnp.float32)
    m = mask.astype(jnp.float32)
    return jnp.sum(nll * m), jnp.sum(m)


class Perplexity:
    """Running perplexity: exp(total NLL / total tokens)
    (common/metrics/perplexity.py semantics)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._nll = 0.0
        self._count = 0.0

    def update(self, logits=None, labels=None, mask=None, *,
               nll_sum=None, token_count=None):
        if nll_sum is None:
            nll_sum, token_count = masked_token_nll(logits, labels, mask)
        self._nll += float(nll_sum)
        self._count += float(token_count)

    def compute(self) -> float:
        if self._count == 0:
            return float("nan")
        return float(np.exp(self._nll / self._count))
