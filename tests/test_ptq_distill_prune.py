"""ptq / distill / prune task-API tests (reference api.py:305,390,476)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nemo_tpu import llm
from nemo_tpu.models.llm.config import tiny_test
from nemo_tpu.models.llm.gpt import GPTModel
from nemo_tpu.parallel.mesh import MeshConfig


def _tiny_params(cfg, seed=0):
    model = GPTModel(cfg)
    tokens = jnp.zeros((1, 16), jnp.int32)
    import flax.linen as nn
    return nn.meta.unbox(model.init(jax.random.PRNGKey(seed), tokens)["params"])


def test_prune_width_exact_on_zero_neurons():
    """Zero half the FFN neurons → width pruning to half is lossless."""
    cfg = tiny_test()
    params = _tiny_params(cfg)
    F = cfg.ffn_hidden_size
    w1 = np.asarray(params["layers"]["mlp"]["fc1"]["kernel"]).copy()  # [L,D,2F]
    w2 = np.asarray(params["layers"]["mlp"]["fc2"]["kernel"]).copy()  # [L,F,D]
    kill = np.arange(F // 2, F)  # zero the tail half in-and-out
    w1[..., kill] = 0.0          # gate part
    w1[..., F + kill] = 0.0      # up part
    w2[:, kill, :] = 0.0
    params["layers"]["mlp"]["fc1"]["kernel"] = jnp.asarray(w1)
    params["layers"]["mlp"]["fc2"]["kernel"] = jnp.asarray(w2)

    tokens = jnp.asarray(np.random.RandomState(0).randint(0, 100, (2, 16)), jnp.int32)
    ref = GPTModel(cfg).apply({"params": params}, tokens)

    new_cfg, new_params = llm.prune(cfg, params, target_ffn_hidden_size=F // 2)
    assert new_cfg.ffn_hidden_size == F // 2
    assert new_params["layers"]["mlp"]["fc1"]["kernel"].shape[-1] == F  # 2 * F/2
    out = GPTModel(new_cfg).apply({"params": new_params}, tokens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_prune_depth_runs_and_shrinks():
    cfg = tiny_test(num_layers=4)
    params = _tiny_params(cfg)
    tokens = jnp.asarray(np.random.RandomState(0).randint(0, 100, (1, 16)), jnp.int32)
    new_cfg, new_params = llm.prune(cfg, params, target_num_layers=2,
                                    probe_tokens=tokens)
    assert new_cfg.num_layers == 2
    assert new_params["layers"]["mlp"]["fc1"]["kernel"].shape[0] == 2
    out = GPTModel(new_cfg).apply({"params": new_params}, tokens)
    assert out.shape == (1, 16, cfg.vocab_size)
    assert np.isfinite(np.asarray(out)).all()


def test_ptq_api_round_trip():
    cfg = tiny_test(hidden_size=128, ffn_hidden_size=512)
    params = _tiny_params(cfg)
    _, qparams = llm.ptq(cfg, params, min_size=4096)
    from nemo_tpu.ops.quant import dequantize_params
    back = dequantize_params(qparams, dtype=jnp.float32)
    tokens = jnp.zeros((1, 16), jnp.int32)
    ref = GPTModel(cfg).apply({"params": params}, tokens)
    out = GPTModel(cfg).apply({"params": back}, tokens)
    rel = float(jnp.linalg.norm(out - ref) / (jnp.linalg.norm(ref) + 1e-9))
    assert rel < 0.05


def test_distill_loss_decreases():
    cfg_t = tiny_test(seq_length=32)
    cfg_s = tiny_test(seq_length=32, num_layers=1, fused_ce=False)
    params_t = _tiny_params(cfg_t)

    class Data:
        global_batch_size = 8
        micro_batch_size = None

        def train_batches(self, start_step=0):
            rng = np.random.RandomState(0)
            while True:
                tok = rng.randint(0, 100, (8, 32)).astype(np.int32)
                yield {"tokens": jnp.asarray(tok), "labels": jnp.asarray(tok),
                       "loss_mask": jnp.ones((8, 32), jnp.float32)}

        def val_batches(self):
            return iter([])

    module, state, metrics = llm.distill(
        cfg_t, params_t, cfg_s, Data(),
        mesh=MeshConfig(dp=8), max_steps=3, temperature=2.0, alpha=0.7)
    hist = metrics["history"] if isinstance(metrics, dict) and "history" in metrics else metrics
    assert int(state.step) == 3
