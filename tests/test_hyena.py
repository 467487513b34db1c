"""Hyena operator: FFT conv exactness vs direct conv, causality, LM trains."""

import numpy as np

import jax
import jax.numpy as jnp

from nemo_tpu.ops.hyena import HyenaLM, HyenaOperator, fft_causal_conv


def test_fft_causal_conv_matches_direct():
    rng = np.random.RandomState(0)
    B, T, D = 2, 16, 4
    u = rng.randn(B, T, D).astype(np.float32)
    h = rng.randn(T, D).astype(np.float32)
    got = np.asarray(fft_causal_conv(jnp.asarray(u), jnp.asarray(h)))
    ref = np.zeros_like(u)
    for t in range(T):
        for k in range(t + 1):
            ref[:, t] += u[:, t - k] * h[k]
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_hyena_operator_causal():
    rng = np.random.RandomState(1)
    B, T, D = 1, 24, 16
    op = HyenaOperator(D, order=2)
    u = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    v = op.init(jax.random.PRNGKey(0), u)
    y1 = np.asarray(op.apply(v, u))
    # perturb the future: outputs up to t=11 must not change
    u2 = u.at[:, 12:].set(jnp.asarray(rng.randn(B, T - 12, D), jnp.float32))
    y2 = np.asarray(op.apply(v, u2))
    np.testing.assert_allclose(y1[:, :12], y2[:, :12], atol=1e-4)
    assert np.abs(y1[:, 12:] - y2[:, 12:]).max() > 1e-3


def test_hyena_lm_trains():
    import optax

    rng = np.random.RandomState(0)
    V, T, B = 64, 32, 4
    lm = HyenaLM(V, d_model=32, n_layers=2)
    tokens = jnp.asarray(rng.randint(0, V, (B, T)), jnp.int32)
    v = lm.init(jax.random.PRNGKey(0), tokens)
    tx = optax.adam(1e-3)
    opt = tx.init(v)

    def loss_fn(vars_):
        logits = lm.apply(vars_, tokens)
        lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
        tgt = tokens[:, 1:]
        return -jnp.mean(jnp.take_along_axis(lp, tgt[..., None], -1))

    losses = []
    for _ in range(6):
        l, g = jax.value_and_grad(loss_fn)(v)
        up, opt = tx.update(g, opt)
        v = optax.apply_updates(v, up)
        losses.append(float(l))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_evo2_presets():
    """Evo2 size presets construct and a tiny-ified instance runs
    (reference: recipes/hyena_{1b,7b,40b}.py)."""
    import jax
    import jax.numpy as jnp

    from nemo_tpu.ops.hyena import evo2_1b, evo2_7b, evo2_40b

    # literal reference striped patterns (gpt/model/hyena.py
    # Hyena{1b,7b,40b}Config hybrid_override_pattern)
    m1 = evo2_1b()
    assert m1.d_model == 1920 and m1.n_layers == 25
    assert m1.pattern == "SDH*SDHSDH*SDHSDH*SDHSDH*"
    assert m1.n_heads == 15 and m1.d_ff == 5120 and m1.short_groups == 128
    assert evo2_7b().pattern.count("*") == 5 and evo2_7b().d_model == 4096
    m40 = evo2_40b()
    assert m40.n_layers == 50 == len(m40.pattern)
    assert m40.medium_groups == 512
    # tiny striped instance covering every block type runs end-to-end
    tiny = evo2_1b(d_model=32, n_layers=4, vocab_size=64, pattern="SDH*",
                   n_heads=2, d_ff=64, short_groups=8, medium_groups=8)
    toks = jnp.zeros((1, 16), jnp.int32)
    v = tiny.init(jax.random.PRNGKey(0), toks)
    out = tiny.apply(v, toks)
    assert out.shape == (1, 16, 64)
    import numpy as np

    assert np.isfinite(np.asarray(out)).all()
