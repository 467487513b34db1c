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
