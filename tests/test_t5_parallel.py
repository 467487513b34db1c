"""Encoder-specific TP and encoder-PP for T5 (reference
megatron_strategy.py:251-252 encoder_tensor/pipeline_model_parallel_size)
on the 8-virtual-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nemo_tpu.models.llm.t5 import t5_220m
from nemo_tpu.models.llm.t5_parallel import T5PipelinedModule, T5TrainModule
from nemo_tpu.parallel.mesh import MeshConfig


def _cfg(**kw):
    d = dict(num_layers=2, hidden_size=64, ffn_hidden_size=128,
             num_attention_heads=4, kv_channels=16, vocab_size=128,
             seq_length=16, dropout=0.0)
    d.update(kw)
    return t5_220m(**d)


def _batch(B=8, S=16, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "enc_tokens": jnp.asarray(rng.randint(0, 128, (B, S)), jnp.int32),
        "dec_tokens": jnp.asarray(rng.randint(0, 128, (B, S)), jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 128, (B, S)), jnp.int32),
        "loss_mask": jnp.ones((B, S), jnp.float32),
    }


def test_t5_tp_trains_and_shards():
    mod = T5TrainModule(_cfg(), mesh_cfg=MeshConfig(dp=4, tp=2))
    state = mod.init_state(seed=0)
    # decoder attention kernels sharded over tp
    sh = state.params["dec_layers"]["T5Block_0"]["self_attn"]["q"]["kernel"].sharding
    assert "tp" in str(sh.spec)
    batch = _batch()
    state, m1 = mod.train_step(state, batch, jax.random.PRNGKey(0))
    state, m2 = mod.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m1["loss"]))
    assert float(m2["loss"]) < float(m1["loss"])


def test_t5_encoder_tp_1_replicates_encoder_and_matches():
    """encoder_tp=1 (reference etp=1): encoder weights replicated while the
    decoder shards over tp — and the step is numerically identical (the
    sharding is a layout choice, not a math change)."""
    batch = _batch()
    losses = {}
    for etp in (None, 1):
        mod = T5TrainModule(_cfg(), mesh_cfg=MeshConfig(dp=4, tp=2),
                            encoder_tp=etp)
        state = mod.init_state(seed=0)
        if etp == 1:
            enc_sh = state.params["enc_layers"]["T5Block_0"]["self_attn"]["q"]["kernel"].sharding
            dec_sh = state.params["dec_layers"]["T5Block_0"]["self_attn"]["q"]["kernel"].sharding
            assert "tp" not in str(enc_sh.spec)
            assert "tp" in str(dec_sh.spec)
        _, m = mod.train_step(state, batch, jax.random.PRNGKey(0))
        losses[etp] = float(m["loss"])
    assert losses[1] == pytest.approx(losses[None], rel=1e-5)


def test_t5_encoder_pp_matches_unpipelined():
    """Encoder-PP: encoder and decoder stacks each pipeline over the pp
    axis; the step must match the unpipelined GSPMD module exactly."""
    cfg = _cfg()
    n_micro, B_mb = 2, 4
    rng = np.random.RandomState(0)
    S = 16
    mb = {
        "enc_tokens": jnp.asarray(rng.randint(0, 128, (n_micro, B_mb, S)), jnp.int32),
        "dec_tokens": jnp.asarray(rng.randint(0, 128, (n_micro, B_mb, S)), jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 128, (n_micro, B_mb, S)), jnp.int32),
        "loss_mask": jnp.ones((n_micro, B_mb, S), jnp.float32),
    }
    pmod = T5PipelinedModule(cfg, mesh_cfg=MeshConfig(pp=2, dp=4))
    pstate = pmod.init_state(seed=0)
    _, pm = pmod.train_step(pstate, mb)

    flat = {k: v.reshape((-1,) + v.shape[2:]) for k, v in mb.items()}
    ref = T5TrainModule(cfg, mesh_cfg=MeshConfig(dp=8))
    rstate = ref.init_state(seed=0)
    _, rm = ref.train_step(rstate, flat, jax.random.PRNGKey(0))
    assert float(pm["loss"]) == pytest.approx(float(rm["loss"]), rel=2e-4)
    assert float(pm["grad_norm"]) == pytest.approx(
        float(rm["grad_norm"]), rel=2e-3)
    # layer stacks are sharded over pp
    sh = pstate.params["enc_layers"]["T5Block_0"]["mlp"]["wi0"]["kernel"].sharding
    assert "pp" in str(sh.spec)
