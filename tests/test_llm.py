"""LLM stack tests on an 8-device CPU mesh: forward, sharding, train step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from nemo_tpu.models.llm.config import tiny_test
from nemo_tpu.models.llm.gpt import GPTModel, init_kv_caches
from nemo_tpu.models.llm.train import GPTTrainModule
from nemo_tpu.parallel.mesh import MeshConfig


def test_forward_shapes_and_dtype():
    cfg = tiny_test()
    model = GPTModel(cfg)
    tokens = jnp.zeros((2, 16), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), tokens)
    logits = model.apply(variables, tokens)
    assert logits.shape == (2, 16, cfg.vocab_size)
    assert logits.dtype == jnp.float32


def test_causality():
    """Changing a future token must not affect past logits."""
    cfg = tiny_test()
    model = GPTModel(cfg)
    rng = np.random.RandomState(0)
    t1 = rng.randint(0, 100, (1, 16)).astype(np.int32)
    t2 = t1.copy()
    t2[0, 10:] = (t2[0, 10:] + 7) % 100
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(t1))
    l1 = model.apply(variables, jnp.asarray(t1))
    l2 = model.apply(variables, jnp.asarray(t2))
    np.testing.assert_allclose(np.asarray(l1)[:, :10], np.asarray(l2)[:, :10], atol=1e-5)
    assert np.abs(np.asarray(l1)[:, 10:] - np.asarray(l2)[:, 10:]).max() > 1e-4


@pytest.mark.parametrize("mesh_cfg", [
    MeshConfig(dp=2, fsdp=2, tp=2),
    MeshConfig(dp=1, fsdp=4, tp=2),
    MeshConfig(dp=8, fsdp=1, tp=1),
])
def test_train_step_sharded(mesh_cfg):
    cfg = tiny_test(seq_length=32)
    mod = GPTTrainModule(cfg, mesh_cfg=mesh_cfg)
    state = mod.init_state()

    # params actually sharded over tp for qkv when tp>1
    if mesh_cfg.tp > 1:
        q_sh = state.params["layers"]["attention"]["q_proj"]["kernel"].sharding
        assert "tp" in str(q_sh.spec)

    rng = np.random.RandomState(0)
    B = 8
    batch = {
        "tokens": jnp.asarray(rng.randint(0, 100, (B, 32)), jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 100, (B, 32)), jnp.int32),
        "loss_mask": jnp.ones((B, 32), jnp.float32),
    }
    state, m1 = mod.train_step(state, batch, jax.random.PRNGKey(0))
    state, m2 = mod.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m1["loss"]))
    assert float(m2["loss"]) < float(m1["loss"])  # same batch → loss drops
    assert int(state.step) == 2


def test_train_step_microbatched():
    cfg = tiny_test(seq_length=32)
    mod = GPTTrainModule(cfg, mesh_cfg=MeshConfig(dp=4, fsdp=2, tp=1))
    state = mod.init_state()
    rng = np.random.RandomState(0)
    A, B = 2, 8
    batch = {
        "tokens": jnp.asarray(rng.randint(0, 100, (A, B, 32)), jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 100, (A, B, 32)), jnp.int32),
        "loss_mask": jnp.ones((A, B, 32), jnp.float32),
    }
    state, m = mod.train_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))


def test_kv_cache_decode_matches_full_forward():
    cfg = tiny_test(scan_layers=True)
    model = GPTModel(cfg)
    rng = np.random.RandomState(0)
    S = 12
    tokens = jnp.asarray(rng.randint(0, 100, (1, S)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), tokens)
    full = model.apply(variables, tokens)

    caches = init_kv_caches(cfg, 1, S, dtype=jnp.float32)
    outs = []
    for t in range(S):
        logits, caches = model.apply(
            variables,
            tokens[:, t : t + 1],
            jnp.array([[t]]),
            kv_caches=caches,
            decode_index=t,
        )
        outs.append(logits[:, 0])
    step = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(step), np.asarray(full), atol=2e-4, rtol=1e-3)


def test_moe_forward():
    cfg = tiny_test(num_moe_experts=4, moe_router_topk=2)
    model = GPTModel(cfg)
    tokens = jnp.zeros((2, 8), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), tokens)
    logits = model.apply(variables, tokens)
    assert logits.shape == (2, 8, cfg.vocab_size)


@pytest.mark.slow
def test_fused_ce_matches_plain_loss():
    """fused_linear_cross_entropy == masked_token_loss through the model."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nemo_tpu.models.llm.config import tiny_test
    from nemo_tpu.models.llm.loss import (
        fused_linear_cross_entropy,
        masked_token_loss,
    )
    from nemo_tpu.models.llm.gpt import GPTModel

    for tied in (False, True):
        cfg = tiny_test(seq_length=64, scan_layers=False, remat="none",
                        share_embeddings_and_output_weights=tied)
        m = GPTModel(cfg)
        rng = np.random.RandomState(0)
        tokens = jnp.asarray(rng.randint(0, cfg.vocab_size, (2, 64)), jnp.int32)
        labels = jnp.asarray(rng.randint(0, cfg.vocab_size, (2, 64)), jnp.int32)
        mask = jnp.asarray(rng.rand(2, 64) > 0.2, jnp.float32)
        import flax.linen as nn

        variables = m.init(jax.random.PRNGKey(0), tokens)
        params = nn.meta.unbox(variables["params"])

        def plain(params):
            logits = m.apply({"params": params}, tokens)
            return masked_token_loss(logits, labels, mask)[0]

        def fused(params):
            h = m.apply({"params": params}, tokens, output_hidden=True)
            w = params["embedding"] if tied else params["lm_head"]["kernel"].T
            return fused_linear_cross_entropy(h, w, labels, mask, chunk=16)[0]

        lp, gp = jax.value_and_grad(plain)(params)
        lf, gf = jax.value_and_grad(fused)(params)
        np.testing.assert_allclose(float(lp), float(lf), rtol=1e-6)
        for (kp, vp), (kf, vf) in zip(
            jax.tree_util.tree_leaves_with_path(gp),
            jax.tree_util.tree_leaves_with_path(gf),
        ):
            np.testing.assert_allclose(
                np.asarray(vp), np.asarray(vf), atol=1e-5, rtol=1e-4,
                err_msg=jax.tree_util.keystr(kp),
            )


def test_mtp_head_trains_and_is_optional():
    """deepseek-V3 MTP (reference gpt/model/base.py mtp_block_spec): the
    extra block predicts t+2; its coeff-weighted CE joins the objective
    and the params exist only when mtp_num_layers > 0."""
    from flax import traverse_util

    from nemo_tpu.models.llm.config import tiny_test
    from nemo_tpu.models.llm.train import GPTTrainModule
    from nemo_tpu.parallel.mesh import MeshConfig

    rng = np.random.RandomState(0)
    batch = {
        "tokens": jnp.asarray(rng.randint(0, 100, (8, 32)), jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 100, (8, 32)), jnp.int32),
        "loss_mask": jnp.ones((8, 32), jnp.float32),
    }
    cfg = tiny_test(seq_length=32, mtp_num_layers=1, mtp_loss_coeff=0.3)
    mod = GPTTrainModule(cfg, mesh_cfg=MeshConfig(dp=8))
    state = mod.init_state(seed=0)
    flat = traverse_util.flatten_dict(state.params)
    assert any("mtp_layer0" in "/".join(p) for p in flat)
    assert any("mtp_proj" in "/".join(p) for p in flat)
    state, m1 = mod.train_step(state, batch, jax.random.PRNGKey(0))
    state, m2 = mod.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m1["loss"]))
    assert float(m2["loss"]) < float(m1["loss"])

    # with coeff=0 the objective equals the plain model's loss
    cfg0 = tiny_test(seq_length=32, mtp_num_layers=1, mtp_loss_coeff=0.0)
    mod0 = GPTTrainModule(cfg0, mesh_cfg=MeshConfig(dp=8))
    st0 = mod0.init_state(seed=0)
    _, mm = mod0.train_step(st0, batch, jax.random.PRNGKey(0))
    ref = GPTTrainModule(tiny_test(seq_length=32), mesh_cfg=MeshConfig(dp=8))
    rst = ref.init_state(seed=0)
    _, rm = ref.train_step(rst, batch, jax.random.PRNGKey(0))
    assert float(mm["loss"]) == pytest.approx(float(rm["loss"]), rel=1e-5)


def test_sharded_generation_matches_unsharded():
    """TP/FSDP-sharded serving (GenerationEngine(mesh_cfg=...)): greedy
    tokens equal the single-device engine on the 8-virtual-device mesh —
    GSPMD inserts the per-token collectives (reference: llm.generate under
    MegatronStrategy TP, SURVEY §3.4)."""
    import flax.linen as nn

    from nemo_tpu.models.llm.config import tiny_test
    from nemo_tpu.models.llm.generate import GenerationEngine, SamplingParams
    from nemo_tpu.parallel.mesh import MeshConfig

    cfg = tiny_test(seq_length=64)
    model = GPTModel(cfg)
    params = nn.meta.unbox(model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))["params"])
    rng = np.random.RandomState(0)
    prompts = [list(rng.randint(1, 100, n)) for n in (5, 3)]
    p = SamplingParams(greedy=True, max_new_tokens=6, eos_id=-1)
    ref = GenerationEngine(cfg, params, cache_dtype=jnp.float32).generate_tokens(prompts, p)
    tp = GenerationEngine(cfg, params, cache_dtype=jnp.float32,
                          mesh_cfg=MeshConfig(tp=2, fsdp=2)).generate_tokens(prompts, p)
    assert tp == ref
