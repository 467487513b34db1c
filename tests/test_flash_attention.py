"""Pallas flash attention vs XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from nemo_tpu.ops.flash_attention import _xla_reference, flash_attention


def _mk(B=2, H=4, G=2, T=256, dh=64, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(B, H, T, dh).astype(np.float32))
    k = jnp.asarray(rng.randn(B, G, T, dh).astype(np.float32))
    v = jnp.asarray(rng.randn(B, G, T, dh).astype(np.float32))
    return q, k, v


@pytest.mark.parametrize("causal,window", [(True, None), (False, None), (True, 64)])
def test_flash_vs_reference(causal, window):
    q, k, v = _mk()
    scale = 1.0 / np.sqrt(64)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, scale, causal, window, 128, 128, 0)
    ref = _xla_reference(q, k, v, scale, causal, window, 0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_gradients_match():
    q, k, v = _mk(B=1, H=2, G=2, T=128)
    scale = 1.0 / np.sqrt(64)

    def f_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale, True, None, 64, 64, 0) ** 2)

    def f_ref(q, k, v):
        return jnp.sum(_xla_reference(q, k, v, scale, True, None, 0) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize("causal,window,G", [(True, None, 4), (True, 64, 2), (False, None, 2)])
def test_flash_backward_pallas_kernels(causal, window, G):
    """dq/dk/dv Pallas kernels vs XLA autodiff (GQA, window, non-causal)."""
    q, k, v = _mk(B=2, H=4, G=G, T=256, dh=64, seed=3)
    scale = 1.0 / np.sqrt(64)
    g = jnp.asarray(np.random.RandomState(7).randn(*q.shape).astype(np.float32))

    def f_flash(q, k, v):
        return flash_attention(q, k, v, scale, causal, window, 128, 128, 0)

    def f_ref(q, k, v):
        return _xla_reference(q, k, v, scale, causal, window, 0)

    with pltpu.force_tpu_interpret_mode():
        _, vjp = jax.vjp(f_flash, q, k, v)
        got = vjp(g)
    _, vjp_ref = jax.vjp(f_ref, q, k, v)
    want = vjp_ref(g)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3)


def test_gpt_flash_backend_matches_xla():
    from nemo_tpu.models.llm.config import tiny_test
    from nemo_tpu.models.llm.gpt import GPTModel
    import dataclasses

    # interpret-mode pallas uses IO callbacks, incompatible with remat+scan
    cfg_x = tiny_test(seq_length=128, remat="none", scan_layers=False)
    cfg_f = dataclasses.replace(cfg_x, attention_backend="flash")
    mx, mf = GPTModel(cfg_x), GPTModel(cfg_f)
    tokens = jnp.asarray(np.random.RandomState(0).randint(0, 100, (2, 128)), jnp.int32)
    variables = mx.init(jax.random.PRNGKey(0), tokens)
    with pltpu.force_tpu_interpret_mode():
        lf = mf.apply(variables, tokens)
    lx = mx.apply(variables, tokens)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lx), atol=2e-3, rtol=1e-3)
