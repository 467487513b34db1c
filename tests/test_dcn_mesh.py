"""Multi-slice (DCN) mesh: slice-major layout, combined dp axis, and a
train step over a hybrid dcn_dp×(dp,fsdp,tp) mesh matching the single-slice
result (reference: cross-node NCCL DP, SURVEY §5.8 → multi-slice mesh)."""

import numpy as np

import jax
import jax.numpy as jnp

from nemo_tpu.models.llm.config import tiny_test
from nemo_tpu.models.llm.train import GPTTrainModule
from nemo_tpu.parallel.mesh import MeshConfig, make_mesh


def test_dcn_mesh_layout():
    """dcn_dp=2 over 8 devices: dp axis = 2 (combined), slice boundary on
    the OUTER dp stride — each dp row holds one slice's devices."""
    cfg = MeshConfig(dp=1, fsdp=2, tp=2, dcn_dp=2)
    mesh = make_mesh(cfg)
    assert dict(mesh.shape) == {"pp": 1, "dp": 2, "fsdp": 2, "cp": 1,
                                "ep": 1, "tp": 1 * 2}
    devs = np.asarray(mesh.devices)  # [pp, dp, fsdp, cp, ep, tp]
    ids = np.vectorize(lambda d: d.id)(devs)
    # slice 0 = devices 0..3 (contiguous-block fallback) fills dp row 0
    assert set(ids[0, 0].ravel()) == {0, 1, 2, 3}
    assert set(ids[0, 1].ravel()) == {4, 5, 6, 7}


def test_dcn_pp_axis():
    cfg = MeshConfig(dp=2, fsdp=1, tp=2, dcn_pp=2)
    mesh = make_mesh(cfg)
    assert mesh.shape["pp"] == 2 and mesh.shape["dp"] == 2
    ids = np.vectorize(lambda d: d.id)(np.asarray(mesh.devices))
    assert set(ids[0].ravel()) == {0, 1, 2, 3}  # stage 0 = slice 0


def test_dcn_resolved_infers_dp():
    cfg = MeshConfig(fsdp=2, dcn_dp=2).resolved(8)
    assert cfg.dp == 2  # 8 / (fsdp2 · dcn2)


def test_train_step_dcn_matches_single_slice():
    """Loss on a dcn_dp=2 hybrid mesh == pure dp=8 mesh (same global
    batch): the DCN axis is numerically transparent."""
    cfg = tiny_test(seq_length=32)
    rng = np.random.RandomState(0)
    B = 8
    batch = {
        "tokens": jnp.asarray(rng.randint(0, 100, (B, 32)), jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 100, (B, 32)), jnp.int32),
        "loss_mask": jnp.ones((B, 32), jnp.float32),
    }

    def run(mesh_cfg):
        mod = GPTTrainModule(cfg, mesh_cfg=mesh_cfg)
        state = mod.init_state()
        _, m = mod.train_step(state, batch, jax.random.PRNGKey(0))
        return float(m["loss"])

    ref = run(MeshConfig(dp=8))
    hybrid = run(MeshConfig(dp=2, fsdp=2, dcn_dp=2))
    np.testing.assert_allclose(hybrid, ref, rtol=2e-5)
