"""Fused subsampling Pallas kernel vs XLA conv pair (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from nemo_tpu.ops.subsampling_kernel import fused_subsampling_x4


@pytest.mark.parametrize("T,F", [(99, 80), (64, 40)])
def test_fused_subsampling_matches_xla(T, F):
    B, C = 2, 32
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, F).astype(np.float32))
    w1 = jnp.asarray(rng.randn(3, 3, 1, C).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)

    def ref(x):
        h = x[..., None]
        h = jax.lax.conv_general_dilated(h, w1, (2, 2), [(1, 1), (1, 1)],
                                         dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = jnp.maximum(h + b1, 0)
        h = jax.lax.conv_general_dilated(h, w2, (2, 2), [(1, 1), (1, 1)],
                                         dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = jnp.maximum(h + b2, 0)
        Bx, Tx, Fx, Cx = h.shape
        return h.reshape(Bx, Tx, Fx * Cx)

    r = ref(x)
    with pltpu.force_tpu_interpret_mode():
        o = fused_subsampling_x4(x, w1, b1, w2, b2, block_t=8)
    assert o.shape == r.shape
    np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=5e-3, rtol=1e-2)
