"""CTC loss parity vs torch.nn.CTCLoss + greedy decode tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nemo_tpu.ops.ctc import ctc_collapse, ctc_greedy_predictions, ctc_loss


def _rand_case(B=3, T=50, U=12, V=28, seed=0):
    rng = np.random.RandomState(seed)
    logits = rng.randn(B, T, V).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    input_lengths = np.array([T, T - 7, T - 15], np.int32)[:B]
    targets = rng.randint(0, V - 1, size=(B, U)).astype(np.int32)  # exclude blank
    target_lengths = np.array([U, U - 3, U - 8], np.int32)[:B]
    return log_probs, input_lengths, targets, target_lengths, V


def test_ctc_loss_matches_torch():
    import torch

    log_probs, in_len, tgt, tgt_len, V = _rand_case()
    ours = ctc_loss(
        log_probs, jnp.asarray(in_len), jnp.asarray(tgt), jnp.asarray(tgt_len)
    )
    # torch CTCLoss expects blank index; ours is blank-last (V-1)
    tl = torch.nn.CTCLoss(blank=V - 1, reduction="none")
    ref = tl(
        torch.tensor(np.asarray(log_probs)).permute(1, 0, 2),
        torch.tensor(tgt),
        torch.tensor(in_len),
        torch.tensor(tgt_len),
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-4)


def test_ctc_loss_grad_finite():
    log_probs, in_len, tgt, tgt_len, V = _rand_case()

    def f(lp):
        return jnp.sum(ctc_loss(lp, jnp.asarray(in_len), jnp.asarray(tgt), jnp.asarray(tgt_len)))

    g = jax.grad(f)(log_probs)
    assert np.isfinite(np.asarray(g)).all()


def test_greedy_collapse():
    # sequence: a a b blank b b -> "a b b"
    V = 4  # 3 symbols + blank(3)
    T = 6
    ids = np.array([0, 0, 1, 3, 1, 1])
    lp = np.full((1, T, V), -10.0, np.float32)
    for t, i in enumerate(ids):
        lp[0, t, i] = 0.0
    preds = ctc_greedy_predictions(jnp.asarray(lp))
    out = ctc_collapse(preds, np.array([T]), blank=3)
    assert out == [[0, 1, 1]]
