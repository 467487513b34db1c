"""Ring-flash context parallelism: position-kernel parity + GPT cp=2 step."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from nemo_tpu.ops.flash_attention import (
    _xla_reference,
    flash_attention_positions,
)
from nemo_tpu.ops.ring_attention import zigzag_chunk_ids


def _mk(B=1, H=4, G=2, T=256, dh=64, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(B, H, T, dh).astype(np.float32))
    k = jnp.asarray(rng.randn(B, G, T, dh).astype(np.float32))
    v = jnp.asarray(rng.randn(B, G, T, dh).astype(np.float32))
    return q, k, v


def test_positions_kernel_matches_reference():
    q, k, v = _mk()
    T = q.shape[2]
    scale = 1.0 / np.sqrt(64)
    pos = jnp.arange(T, dtype=jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        out, lse = flash_attention_positions(q, k, v, pos, pos, scale, True, None, 128, 128)
    ref = _xla_reference(q, k, v, scale, True, None, 0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_positions_kernel_zigzag_permutation():
    """Permuting rows + matching positions == permuted contiguous output."""
    q, k, v = _mk(T=256)
    T = q.shape[2]
    scale = 1.0 / np.sqrt(64)
    cp = 2
    ids = zigzag_chunk_ids(cp).reshape(-1)
    clen = T // (2 * cp)
    order = np.concatenate([np.arange(i * clen, (i + 1) * clen) for i in ids])
    pos = jnp.asarray(order, jnp.int32)
    qz, kz, vz = q[:, :, order], k[:, :, order], v[:, :, order]
    with pltpu.force_tpu_interpret_mode():
        out, _ = flash_attention_positions(qz, kz, vz, pos, pos, scale, True, None, 64, 64)
    ref = _xla_reference(q, k, v, scale, True, None, 0)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref)[:, :, order], atol=2e-5, rtol=1e-4
    )


def test_positions_kernel_gradients():
    q, k, v = _mk(B=1, H=2, G=1, T=128)
    T = q.shape[2]
    scale = 1.0 / np.sqrt(64)
    pos = jnp.arange(T, dtype=jnp.int32)

    def f_pos(q, k, v):
        o, lse = flash_attention_positions(q, k, v, pos, pos, scale, True, None, 64, 64)
        # consume BOTH outputs so the lse cotangent path is exercised
        return jnp.sum(o ** 2) + jnp.sum(jnp.tanh(lse))

    def f_ref(q, k, v):
        o = _xla_reference(q, k, v, scale, True, None, 0)
        s = jnp.einsum(
            "bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32
        ) * scale
        mask = jnp.arange(T)[None, :] <= jnp.arange(T)[:, None]
        s = jnp.where(mask[None, None], s, -1e30)
        lse = jax.nn.logsumexp(s, axis=-1)[..., None]
        return jnp.sum(o ** 2) + jnp.sum(jnp.tanh(lse))

    with pltpu.force_tpu_interpret_mode():
        g_pos = jax.grad(f_pos, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_pos, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3)


@pytest.mark.slow
def test_gpt_cp2_train_step_matches_cp1():
    from nemo_tpu.models.llm.config import tiny_test
    from nemo_tpu.models.llm.train import GPTTrainModule
    from nemo_tpu.parallel.mesh import MeshConfig

    # interpret-mode pallas is incompatible with remat+scan
    cfg = tiny_test(seq_length=512, remat="none", scan_layers=False,
                    num_layers=2, hidden_size=64, num_attention_heads=4,
                    num_query_groups=2)
    rng = np.random.RandomState(0)
    B = 4
    batch = {
        "tokens": jnp.asarray(rng.randint(0, cfg.vocab_size, (B, 512)), jnp.int32),
        "labels": jnp.asarray(rng.randint(0, cfg.vocab_size, (B, 512)), jnp.int32),
        "loss_mask": jnp.ones((B, 512), jnp.float32),
    }

    m1 = GPTTrainModule(cfg, mesh_cfg=MeshConfig(dp=2, fsdp=2, cp=1, tp=2))
    s1 = m1.init_state(seed=0)
    _, met1 = m1.train_step(s1, batch, jax.random.PRNGKey(0))
    loss1 = float(met1["loss"])

    m2 = GPTTrainModule(cfg, mesh_cfg=MeshConfig(dp=2, fsdp=1, cp=2, tp=2))
    assert m2.cfg.cp_size == 2  # auto-wired from the mesh
    s2 = m2.init_state(seed=0)
    _, met2 = m2.train_step(s2, batch, jax.random.PRNGKey(0))
    loss2 = float(met2["loss"])

    assert np.isfinite(loss1) and np.isfinite(loss2)
    np.testing.assert_allclose(loss1, loss2, rtol=2e-4)
