"""Pipeline parallelism tests on the 8-virtual-device CPU mesh
(reference: megatron_parallel.py pipeline schedules)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nemo_tpu.models.llm.config import tiny_test
from nemo_tpu.models.llm.train import GPTTrainModule
from nemo_tpu.parallel.mesh import MeshConfig
from nemo_tpu.parallel.pipeline import PipelinedGPTModule


def _batch(n_micro=2, B=4, S=32, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "tokens": jnp.asarray(rng.randint(0, 100, (n_micro, B, S)), jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 100, (n_micro, B, S)), jnp.int32),
        "loss_mask": jnp.ones((n_micro, B, S), jnp.float32),
    }


def _flat(batch):
    return {k: v.reshape((-1,) + v.shape[2:]) for k, v in batch.items()}


@pytest.mark.parametrize("mesh_cfg", [
    MeshConfig(pp=2, dp=4),
    MeshConfig(pp=4, dp=2),
    MeshConfig(pp=2, dp=2, fsdp=2),
])
def test_pipeline_loss_matches_unpipelined(mesh_cfg):
    """pp train step must produce the SAME first-step loss as the plain
    module (identical math, different schedule)."""
    cfg = tiny_test(seq_length=32, num_layers=4, remat="none")
    pmod = PipelinedGPTModule(cfg, mesh_cfg=mesh_cfg)
    pstate = pmod.init_state(seed=0)
    batch = _batch()
    pstate, pm = pmod.train_step(pstate, batch, jax.random.PRNGKey(0))

    ref = GPTTrainModule(cfg, mesh_cfg=MeshConfig(dp=8))
    rstate = ref.init_state(seed=0)
    rstate, rm = ref.train_step(rstate, _flat(batch), jax.random.PRNGKey(0))
    assert float(pm["loss"]) == pytest.approx(float(rm["loss"]), rel=2e-4)
    # gradients flowed through every stage: grad_norm matches too
    assert float(pm["grad_norm"]) == pytest.approx(float(rm["grad_norm"]), rel=2e-3)


def test_pipeline_params_sharded_over_pp():
    cfg = tiny_test(seq_length=32, num_layers=4)
    pmod = PipelinedGPTModule(cfg, mesh_cfg=MeshConfig(pp=2, dp=4))
    state = pmod.init_state()
    sh = state.params["layers"]["mlp"]["fc1"]["kernel"].sharding
    assert "pp" in str(sh.spec)


def test_pipeline_trains():
    cfg = tiny_test(seq_length=32, num_layers=4)
    pmod = PipelinedGPTModule(cfg, mesh_cfg=MeshConfig(pp=2, dp=4))
    state = pmod.init_state()
    batch = _batch()
    state, m1 = pmod.train_step(state, batch, jax.random.PRNGKey(0))
    state, m2 = pmod.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m1["loss"]))
    assert float(m2["loss"]) < float(m1["loss"])
    assert int(state.step) == 2


def test_1f1b_embedding_vocab_sharded_over_pp():
    """weak r2 #3: no stage may hold the full vocab projection — the
    embedding/LM-head rows are sharded over the pp axis."""
    cfg = tiny_test(seq_length=32, num_layers=4)
    pmod = PipelinedGPTModule(cfg, mesh_cfg=MeshConfig(pp=2, dp=4))
    state = pmod.init_state()
    assert "pp" in str(state.params["embedding"].sharding.spec)


def test_1f1b_dropout_trains_and_is_deterministic():
    """1F1B threads dropout rngs per (microbatch, stage, layer) and replays
    them in the backward recompute (GPipe could not run dropout at all)."""
    cfg = tiny_test(seq_length=32, num_layers=4,
                    hidden_dropout=0.1, attention_dropout=0.1)
    pmod = PipelinedGPTModule(cfg, mesh_cfg=MeshConfig(pp=2, dp=4))
    state = pmod.init_state()
    batch = _batch()
    s1, m1 = pmod.train_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m1["loss"]))
    # same rng → identical step (masks replayed exactly)
    state_b = pmod.init_state()
    _, m1b = pmod.train_step(state_b, batch, jax.random.PRNGKey(0))
    assert float(m1["loss"]) == float(m1b["loss"])
    # different rng → different dropout masks → different loss
    state_c = pmod.init_state()
    _, m1c = pmod.train_step(state_c, batch, jax.random.PRNGKey(7))
    assert float(m1["loss"]) != float(m1c["loss"])
    # and it trains
    _, m2 = pmod.train_step(s1, batch, jax.random.PRNGKey(1))
    assert float(m2["loss"]) < float(m1["loss"])


def test_gpipe_schedule_matches_1f1b():
    cfg = tiny_test(seq_length=32, num_layers=4, remat="none")
    batch = _batch()
    losses = {}
    for sched in ("1f1b", "gpipe"):
        mod = PipelinedGPTModule(cfg, mesh_cfg=MeshConfig(pp=2, dp=4),
                                 schedule=sched)
        st = mod.init_state(seed=0)
        _, m = mod.train_step(st, batch, jax.random.PRNGKey(0))
        losses[sched] = float(m["loss"])
    assert losses["1f1b"] == pytest.approx(losses["gpipe"], rel=2e-4)


def test_interleaved_vpp_matches_unpipelined():
    """VPP (interleaved virtual pipeline, reference megatron_strategy.py:244
    virtual_pipeline_model_parallel_size): pp=2 × vpp=2 step must produce
    the same loss AND grad norm as the plain module."""
    cfg = tiny_test(seq_length=32, num_layers=4, remat="none")
    pmod = PipelinedGPTModule(cfg, mesh_cfg=MeshConfig(pp=2, dp=4),
                              schedule="interleaved", vpp=2)
    pstate = pmod.init_state(seed=0)
    batch = _batch(n_micro=4)
    pstate, pm = pmod.train_step(pstate, batch, jax.random.PRNGKey(0))

    ref = GPTTrainModule(cfg, mesh_cfg=MeshConfig(dp=8))
    rstate = ref.init_state(seed=0)
    rstate, rm = ref.train_step(rstate, _flat(batch), jax.random.PRNGKey(0))
    assert float(pm["loss"]) == pytest.approx(float(rm["loss"]), rel=2e-4)
    assert float(pm["grad_norm"]) == pytest.approx(
        float(rm["grad_norm"]), rel=2e-3)
    # layers are stored device-major: grads permute back to execution order
    perm = pmod.interleaved_storage_perm()
    assert sorted(perm.tolist()) == list(range(4)) and perm.tolist() != list(range(4))


def test_interleaved_vpp1_matches_1f1b():
    """vpp=1 interleaved degenerates to plain 1F1B (same math, one extra
    pipeline tick)."""
    cfg = tiny_test(seq_length=32, num_layers=4, remat="none")
    batch = _batch(n_micro=4)
    losses = {}
    for sched, vpp in (("1f1b", 1), ("interleaved", 1)):
        mod = PipelinedGPTModule(cfg, mesh_cfg=MeshConfig(pp=2, dp=4),
                                 schedule=sched, vpp=vpp)
        st = mod.init_state(seed=0)
        _, m = mod.train_step(st, batch, jax.random.PRNGKey(0))
        losses[sched] = float(m["loss"])
    assert losses["interleaved"] == pytest.approx(losses["1f1b"], rel=2e-4)


def test_interleaved_dropout_and_pp4():
    """Interleaved threads dropout rngs per (microbatch, virtual stage,
    layer); deterministic given the rng, and works at pp=4 × vpp=2."""
    cfg = tiny_test(seq_length=32, num_layers=8,
                    hidden_dropout=0.1, attention_dropout=0.1)
    pmod = PipelinedGPTModule(cfg, mesh_cfg=MeshConfig(pp=4, dp=2),
                              schedule="interleaved", vpp=2)
    state = pmod.init_state()
    batch = _batch(n_micro=4)
    s1, m1 = pmod.train_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m1["loss"]))
    state_b = pmod.init_state()
    _, m1b = pmod.train_step(state_b, batch, jax.random.PRNGKey(0))
    assert float(m1["loss"]) == float(m1b["loss"])
    _, m2 = pmod.train_step(s1, batch, jax.random.PRNGKey(1))
    assert float(m2["loss"]) < float(m1["loss"])


def test_1f1b_moe_aux_loss_matches_unpipelined():
    """MoE aux load-balancing loss must survive the pipeline schedule
    (collected per stage slab, psum'd, grads seeded through the vjp)."""
    cfg = tiny_test(seq_length=32, num_layers=4, num_moe_experts=4,
                    moe_router_topk=2, moe_aux_loss_coeff=0.02,
                    remat="none")
    batch = _batch(B=8)  # microbatch size divisible by the dp=8 reference
    pmod = PipelinedGPTModule(cfg, mesh_cfg=MeshConfig(pp=2, dp=4))
    pstate = pmod.init_state(seed=0)
    _, pm = pmod.train_step(pstate, batch, jax.random.PRNGKey(0))

    ref = GPTTrainModule(cfg, mesh_cfg=MeshConfig(dp=8))
    rstate = ref.init_state(seed=0)
    # feed the same [A, B, S] microbatched form (identical per-mb routing
    # statistics / capacity groups as the pipeline's per-mb forwards)
    _, rm = ref.train_step(rstate, batch, jax.random.PRNGKey(0))
    assert float(pm["loss"]) == pytest.approx(float(rm["loss"]), rel=2e-4)
    assert float(pm["grad_norm"]) == pytest.approx(
        float(rm["grad_norm"]), rel=5e-3)
