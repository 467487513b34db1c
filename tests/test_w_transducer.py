"""W-Transducer loss vs a brute-force lattice DP and standard RNNT.

Reference: asr/parts/k2/w_transducer.py GraphWTransducerLoss.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nemo_tpu.ops.rnnt import rnnt_loss
from nemo_tpu.ops.w_transducer import wtransducer_loss


def _lse(vals):
    vals = [v for v in vals if v > -1e29]
    if not vals:
        return -np.inf
    m = max(vals)
    return m + np.log(sum(np.exp(v - m) for v in vals))


def ref_w_loss(lp, targets, T, U, eps, mode, blank):
    """Brute-force alpha over the W-transducer lattice (one sample)."""
    U1 = U + 1
    lp_b = lp[..., blank]
    lp_l = np.zeros((lp.shape[0], U1))
    for u in range(U):
        lp_l[:, u] = lp[:, u, targets[u]]
    al = np.full((T, U1), -np.inf)
    for t in range(T):
        for u in range(U1):
            c = []
            if t == 0 and u == 0:
                c.append(0.0)
            if t > 0:
                c.append(al[t - 1, u] + lp_b[t - 1, u])
            if u > 0:
                c.append(al[t, u - 1] + lp_l[t, u - 1])
            if u == 0 and t > 0:
                c.append(eps)  # start-skip arc (0,0) -> (t,0)
            al[t, u] = _lse(c)
    end = _lse([al[t, U] + eps for t in range(T - 1)])
    if mode == "force_final":
        return -(_lse([al[T - 1, U], end]) + lp_b[T - 1, U])
    return -_lse([al[T - 1, U] + lp_b[T - 1, U], end])


@pytest.mark.parametrize("mode", ["force_final", "allow_ignore"])
@pytest.mark.parametrize("eps", [0.0, -1.5])
def test_matches_bruteforce(mode, eps):
    rng = np.random.RandomState(0)
    B, T, U, V1 = 3, 6, 3, 5
    logits = rng.randn(B, T, U + 1, V1).astype(np.float32)
    targets = rng.randint(0, V1 - 1, (B, U)).astype(np.int32)
    f_len = np.array([T, T - 1, T - 2], np.int32)
    t_len = np.array([U, U - 1, U], np.int32)
    nll = wtransducer_loss(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(f_len),
        jnp.asarray(t_len), eps_weight=eps, last_blank_mode=mode)
    for b in range(B):
        lp = np.asarray(
            jax.nn.log_softmax(jnp.asarray(logits[b]), -1), np.float64)
        want = ref_w_loss(
            lp[: f_len[b]], targets[b], int(f_len[b]), int(t_len[b]),
            eps, mode, V1 - 1)
        np.testing.assert_allclose(float(nll[b]), want, rtol=1e-5)


def test_reduces_to_rnnt_when_eps_disabled():
    rng = np.random.RandomState(1)
    B, T, U, V1 = 2, 5, 3, 6
    logits = jnp.asarray(rng.randn(B, T, U + 1, V1).astype(np.float32))
    targets = jnp.asarray(rng.randint(0, V1 - 1, (B, U)).astype(np.int32))
    f_len = jnp.asarray(np.array([T, T - 1], np.int32))
    t_len = jnp.asarray(np.array([U, U], np.int32))
    base = rnnt_loss(logits, targets, f_len, t_len)
    # eps ~ -inf: the skip arcs never fire; both modes match plain RNNT
    w = wtransducer_loss(logits, targets, f_len, t_len, eps_weight=-1e9,
                         last_blank_mode="force_final")
    np.testing.assert_allclose(np.asarray(w), np.asarray(base), rtol=1e-5)
    # gradients agree too (the loss is used for training)
    gb = jax.grad(lambda l: rnnt_loss(l, targets, f_len, t_len).sum())(logits)
    gw = jax.grad(lambda l: wtransducer_loss(
        l, targets, f_len, t_len, eps_weight=-1e9).sum())(logits)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gb), atol=1e-4)


def test_skip_helps_untranscribed_prefix():
    """Audio with junk frames before the transcript: the W-loss explains
    them with one cheap skip, so it is lower than plain RNNT."""
    rng = np.random.RandomState(2)
    B, T, U, V1 = 1, 8, 2, 5
    logits = np.full((B, T, U + 1, V1), -3.0, np.float32)
    blank = V1 - 1
    # frames 0-3: junk (some non-target token is loud; blank is unlikely)
    logits[0, :4, :, 2] = 3.0
    # frames 4-7: clean evidence for targets then blanks
    logits[0, 4, :, 0] = 3.0
    logits[0, 5, :, 1] = 3.0
    logits[0, 6:, :, blank] = 3.0
    targets = np.array([[0, 1]], np.int32)
    f_len = np.array([T], np.int32)
    t_len = np.array([U], np.int32)
    args = (jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(f_len),
            jnp.asarray(t_len))
    plain = float(rnnt_loss(*args)[0])
    w = float(wtransducer_loss(*args, eps_weight=0.0)[0])
    assert w < plain - 1.0
