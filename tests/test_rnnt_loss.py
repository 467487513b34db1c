"""RNNT loss vs a slow numpy reference DP (independent implementation)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nemo_tpu.ops.rnnt import rnnt_loss


def numpy_rnnt_nll(log_probs, target, T, U, blank):
    """Graves RNNT forward DP. log_probs: [T, U+1, V], target: [U]."""
    NEG = -1e30
    alpha = np.full((T, U + 1), NEG)
    alpha[0, 0] = 0.0
    for t in range(T):
        for u in range(U + 1):
            if t == 0 and u == 0:
                continue
            cands = []
            if t > 0:
                cands.append(alpha[t - 1, u] + log_probs[t - 1, u, blank])
            if u > 0:
                cands.append(alpha[t, u - 1] + log_probs[t, u - 1, target[u - 1]])
            alpha[t, u] = np.logaddexp.reduce(cands) if cands else NEG
    return -(alpha[T - 1, U] + log_probs[T - 1, U, blank])


@pytest.mark.parametrize("seed", [0, 1])
def test_rnnt_loss_vs_numpy(seed):
    rng = np.random.RandomState(seed)
    B, T, U, V = 3, 12, 5, 8  # V includes blank (last)
    logits = rng.randn(B, T, U + 1, V).astype(np.float32)
    targets = rng.randint(0, V - 1, (B, U)).astype(np.int32)
    f_len = np.array([T, T - 3, T - 5], np.int32)
    t_len = np.array([U, U - 2, U - 4], np.int32)

    ours = np.asarray(
        rnnt_loss(jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(f_len), jnp.asarray(t_len))
    )

    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    for b in range(B):
        ref = numpy_rnnt_nll(lp[b], targets[b], int(f_len[b]), int(t_len[b]), V - 1)
        np.testing.assert_allclose(ours[b], ref, rtol=1e-4, atol=1e-4)


def test_rnnt_loss_grad_finite():
    rng = np.random.RandomState(0)
    B, T, U, V = 2, 8, 4, 6
    logits = jnp.asarray(rng.randn(B, T, U + 1, V).astype(np.float32))
    targets = jnp.asarray(rng.randint(0, V - 1, (B, U)), jnp.int32)
    f_len = jnp.array([T, T - 2], jnp.int32)
    t_len = jnp.array([U, U - 1], jnp.int32)

    def f(lg):
        return jnp.sum(rnnt_loss(lg, targets, f_len, t_len))

    g = jax.grad(f)(logits)
    assert np.isfinite(np.asarray(g)).all()
    # gradient of padded region (t >= f_len etc.) should be ~0 for sample 1
    assert np.abs(np.asarray(g)[1, -1]).max() < 1e-5
