"""Lattice MAP/ML graph losses (VERDICT r2 missing #8, reference parts/k2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nemo_tpu.ops.ctc import ctc_loss
from nemo_tpu.ops.graph_loss import graph_ctc_loss, mmi_loss


def _data(B=3, T=20, V=6, U=5, seed=0):
    rng = np.random.RandomState(seed)
    logits = rng.randn(B, T, V + 1).astype(np.float32)
    lp = jax.nn.log_softmax(jnp.asarray(logits), -1)
    flen = jnp.asarray([T, T - 4, T - 7], jnp.int32)
    targets = rng.randint(0, V, (B, U)).astype(np.int32)
    targets[1, 2] = targets[1, 1]  # adjacent repeat (tests the skip rule)
    tlen = np.asarray([U, U - 1, U - 2], np.int32)
    return lp, flen, targets, tlen, V  # blank = V (last)


def test_graph_ctc_equals_standard_ctc():
    """The CTC-topology numerator graph must reproduce CTC loss exactly —
    the k2 'ML loss == CTC' identity (ml_loss.py)."""
    lp, flen, targets, tlen, blank = _data()
    want = np.asarray(ctc_loss(lp, flen, jnp.asarray(targets),
                               jnp.asarray(tlen)))  # blank_last=True
    got = np.asarray(graph_ctc_loss(lp, flen, targets, tlen, blank))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_graph_ctc_gradients_match_ctc():
    lp, flen, targets, tlen, blank = _data(seed=1)

    g1 = jax.grad(lambda x: jnp.sum(ctc_loss(
        jax.nn.log_softmax(x, -1), flen, jnp.asarray(targets),
        jnp.asarray(tlen))))(lp * 1.0)
    g2 = jax.grad(lambda x: jnp.sum(graph_ctc_loss(
        jax.nn.log_softmax(x, -1), flen, targets, tlen, blank)))(lp * 1.0)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                               rtol=1e-4, atol=1e-5)


def test_mmi_loss_properties():
    """MMI ≥ 0 (numerator ⊂ denominator), differentiable, and training on
    it sharpens the posterior toward the supervision."""
    lp, flen, targets, tlen, blank = _data(seed=2)
    loss = mmi_loss(lp, flen, targets, tlen, blank)
    assert (np.asarray(loss) >= -1e-4).all(), loss
    # optimize the frame logits directly: MMI should drop substantially
    x = jnp.zeros_like(lp)

    def f(x):
        return jnp.mean(mmi_loss(jax.nn.log_softmax(x, -1), flen,
                                 targets, tlen, blank))

    import optax
    tx = optax.adam(0.2)
    opt = tx.init(x)
    first = None
    for _ in range(30):
        loss, g = jax.value_and_grad(f)(x)
        up, opt = tx.update(g, opt)
        x = optax.apply_updates(x, up)
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.2, (first, float(loss))
    # after MMI training, greedy frames decode to (collapsed) supervision
    best = np.asarray(jnp.argmax(x[0], -1))
    collapsed = [t for i, t in enumerate(best)
                 if t != blank and (i == 0 or t != best[i - 1])]
    assert collapsed[: int(tlen[0])] == list(targets[0][: int(tlen[0])])
