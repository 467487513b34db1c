"""MSDD multiscale diarization decoder (reference
asr/modules/msdd_diarizer.py + models/msdd_models.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from nemo_tpu.models.asr.msdd import (
    MSDDConfig, MSDDModule, NeuralDiarizer, make_ms_avg_embs, msdd_bce_loss,
)


def _synthetic_session(B=4, T=40, S=3, E=16, K=2, overlap=True, seed=0):
    """Two speakers with distinct embedding directions per scale; frames
    mix them per a random activity pattern (with overlaps)."""
    rng = np.random.RandomState(seed)
    spk_vecs = rng.randn(K, S, E).astype(np.float32)
    spk_vecs /= np.linalg.norm(spk_vecs, axis=-1, keepdims=True)
    targets = np.zeros((B, T, K), np.float32)
    for b in range(B):
        t = 0
        while t < T:
            k = rng.randint(K)
            dur = rng.randint(4, 10)
            targets[b, t:t + dur, k] = 1
            if overlap and rng.rand() < 0.3:
                targets[b, t:t + dur // 2, 1 - k] = 1
            t += dur
    emb = np.einsum("btk,kse->btse", targets, spk_vecs)
    emb += 0.05 * rng.randn(B, T, S, E).astype(np.float32)
    return jnp.asarray(emb), jnp.asarray(targets)


def test_msdd_shapes_and_scale_weights_normalize():
    cfg = MSDDConfig(emb_dim=16, scale_n=3, hidden_size=32,
                     num_lstm_layers=1)
    m = MSDDModule(cfg)
    seq, targets = _synthetic_session(E=16)
    avg = make_ms_avg_embs(seq, targets, 2)
    assert avg.shape == (4, 3, 16, 2)
    params = m.init(jax.random.PRNGKey(0), seq, avg)["params"]
    preds, sw = m.apply({"params": params}, seq, avg)
    assert preds.shape == (4, 40, 2)
    assert sw.shape == (4, 40, 3, 2)
    np.testing.assert_allclose(np.asarray(sw.sum(2)), 1.0, atol=1e-5)
    assert (np.asarray(preds) >= 0).all() and (np.asarray(preds) <= 1).all()


def test_msdd_trains_and_refines_overlaps():
    """Trained MSDD predicts overlap-aware labels that clustering-style
    argmax initialization cannot: F1 on overlapped frames beats the
    single-speaker init labels."""
    cfg = MSDDConfig(emb_dim=16, scale_n=3, hidden_size=32,
                     num_lstm_layers=1, dropout=0.0)
    diar = NeuralDiarizer(cfg)
    seq, targets = _synthetic_session()
    avg = make_ms_avg_embs(seq, targets, 2)
    batch = {"ms_emb_seq": seq, "ms_avg_embs": avg, "targets": targets}

    params = diar.variables["params"]
    opt = optax.adam(3e-3)
    ost = opt.init(params)

    @jax.jit
    def step(params, ost, rng):
        l, g = jax.value_and_grad(
            lambda p: diar.loss_fn(p, batch, rng))(params)
        u, ost = opt.update(g, ost)
        return optax.apply_updates(params, u), ost, l

    first = last = None
    for i in range(80):
        params, ost, l = step(params, ost, jax.random.PRNGKey(i))
        if i == 0:
            first = float(l)
        last = float(l)
    assert last < first

    # clustering-style init: single speaker per frame (argmax of truth)
    init = jax.nn.one_hot(jnp.argmax(targets + 1e-6 * 0, -1), 2) * (
        targets.sum(-1, keepdims=True) > 0)
    refined, preds = diar.diarize(params, seq, init)

    overlap_frames = np.asarray(targets.sum(-1) > 1)
    assert overlap_frames.any()
    t_np = np.asarray(targets)[overlap_frames]
    init_np = np.asarray(init)[overlap_frames]
    ref_np = np.asarray(refined)[overlap_frames]
    # init misses the second active speaker on every overlap frame
    init_recall = (init_np * t_np).sum() / t_np.sum()
    ref_recall = (ref_np * t_np).sum() / t_np.sum()
    assert init_recall <= 0.5 + 1e-6
    assert ref_recall > init_recall + 0.2


def test_msdd_bce_length_mask():
    preds = jnp.full((2, 6, 2), 0.9)
    targets = jnp.ones((2, 6, 2))
    mask = jnp.asarray([[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 1]], jnp.float32)
    full = msdd_bce_loss(preds, targets)
    masked = msdd_bce_loss(preds, targets, mask)
    assert float(full) == pytest.approx(float(masked), rel=1e-6)
    # masked positions don't contribute: corrupt them, loss unchanged
    bad = preds.at[0, 3:].set(0.01)
    assert float(msdd_bce_loss(bad, targets, mask)) == pytest.approx(
        float(masked), rel=1e-6)
