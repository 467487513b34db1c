"""Quantized GEMM tests: fp8/int8 numerics, QuantDense drop-in, fp8 training,
weight-only PTQ round trip (reference: mixed_precision.py fp8, llm/api.py ptq)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nemo_tpu.models.llm.config import tiny_test
from nemo_tpu.models.llm.train import GPTTrainModule
from nemo_tpu.ops.quant import (
    QuantDense,
    dequantize_params,
    ptq_convert_params,
    quant_matmul,
    quantize,
    quantize_params_int8,
)
from nemo_tpu.parallel.mesh import MeshConfig


@pytest.mark.parametrize("mode,fwd_tol,grad_tol", [
    ("fp8", 0.08, 0.12),
    ("fp8_e4m3", 0.08, 0.10),
    ("int8", 0.03, 0.04),
])
def test_quant_matmul_numerics(mode, fwd_tol, grad_tol):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 32, 64), jnp.float32)
    w = jnp.asarray(rng.randn(64, 48), jnp.float32)
    exact = x @ w
    y = quant_matmul(x, w, mode, jnp.float32)
    assert float(jnp.linalg.norm(y - exact) / jnp.linalg.norm(exact)) < fwd_tol

    g = jax.grad(lambda x, w: jnp.sum(jnp.square(quant_matmul(x, w, mode, jnp.float32))))(x, w)
    gex = jax.grad(lambda x, w: jnp.sum(jnp.square(x @ w)))(x, w)
    assert float(jnp.linalg.norm(g - gex) / jnp.linalg.norm(gex)) < grad_tol


def test_quantize_round_trip():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(128) * 3.0, jnp.float32)
    for dt in (jnp.float8_e4m3fn, jnp.float8_e5m2, jnp.int8):
        q, s = quantize(x, dt)
        back = q.astype(jnp.float32) * s
        rel = float(jnp.linalg.norm(back - x) / jnp.linalg.norm(x))
        assert rel < 0.07, (dt, rel)


def test_quant_dense_general_shapes():
    """QuantDense mirrors the DenseGeneral surfaces gpt.py uses."""
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((2, 8, 16), jnp.bfloat16)
    # features tuple (q_proj-style)
    m = QuantDense(features=(4, 8), mode="int8", dtype=jnp.bfloat16)
    v = m.init(rng, x)
    y = m.apply(v, x)
    assert y.shape == (2, 8, 4, 8)
    # axis=(-2,-1) contraction (o_proj-style), with bias
    m2 = QuantDense(features=16, axis=(-2, -1), use_bias=True, mode="fp8", dtype=jnp.bfloat16)
    v2 = m2.init(rng, y)
    y2 = m2.apply(v2, y)
    assert y2.shape == (2, 8, 16)
    assert v2["params"]["kernel"].shape == (4, 8, 16)


@pytest.mark.parametrize("mode", ["fp8", "int8"])
def test_fp8_train_step_loss_decreases(mode):
    cfg = tiny_test(seq_length=32, quantization=mode)
    mod = GPTTrainModule(cfg, mesh_cfg=MeshConfig(dp=2, fsdp=2, tp=2))
    state = mod.init_state()
    rng = np.random.RandomState(0)
    batch = {
        "tokens": jnp.asarray(rng.randint(0, 100, (8, 32)), jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 100, (8, 32)), jnp.int32),
        "loss_mask": jnp.ones((8, 32), jnp.float32),
    }
    state, m1 = mod.train_step(state, batch, jax.random.PRNGKey(0))
    state, m2 = mod.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m1["loss"]))
    assert float(m2["loss"]) < float(m1["loss"])


def test_int8_ptq_dense_matches_dense_general():
    """Weight-resident int8 QuantDense ≈ the bf16 DenseGeneral it replaces."""
    import flax.linen as nn

    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 64), jnp.float32)
    ref = nn.DenseGeneral(features=(4, 16), dtype=jnp.float32)
    v = ref.init(rng, x)
    y_ref = ref.apply(v, x)

    m = QuantDense(features=(4, 16), mode="int8_ptq", dtype=jnp.float32)
    v_q = m.init(rng, x)
    assert v_q["params"]["qkernel"].dtype == jnp.int8
    assert v_q["params"]["scale"].shape == (1, 4, 16)
    # convert the trained kernel into the ptq tree
    abstract = jax.eval_shape(lambda: v_q["params"])
    params_q = ptq_convert_params(v["params"], abstract)
    y_q = m.apply({"params": params_q}, x)
    rel = float(jnp.linalg.norm(y_q - y_ref) / jnp.linalg.norm(y_ref))
    assert rel < 0.03, rel


def test_int8_ptq_gpt_serving_parity():
    """ptq(algorithm='int8_serve') → engines run int8-resident decode with
    logits close to bf16 (scan-stacked per-layer scales exercised)."""
    from nemo_tpu.llm.api import ptq
    from nemo_tpu.models.llm.generate import GenerationEngine, SamplingParams
    from nemo_tpu.models.llm.gpt import GPTModel

    cfg = tiny_test(seq_length=32)
    model = GPTModel(cfg)
    tokens = jnp.asarray(np.random.RandomState(0).randint(1, 100, (2, 16)))
    params = nn_unbox(model.init(jax.random.PRNGKey(0), tokens)["params"])
    logits_ref = model.apply({"params": params}, tokens)

    cfg_q, params_q = ptq(cfg, params, algorithm="int8_serve")
    assert cfg_q.quantization == "int8_ptq"
    flat = jax.tree_util.tree_leaves_with_path(params_q)
    assert any("qkernel" in jax.tree_util.keystr(p) for p, _ in flat)
    logits_q = GPTModel(cfg_q).apply({"params": params_q}, tokens)
    rel = float(jnp.linalg.norm(
        (logits_q - logits_ref).astype(jnp.float32))
        / jnp.linalg.norm(logits_ref.astype(jnp.float32)))
    assert rel < 0.15, rel

    out = GenerationEngine(cfg_q, params_q).generate_tokens(
        [[5, 6, 7], [9]], SamplingParams(max_new_tokens=4))
    assert len(out) == 2 and all(len(o) == 4 for o in out)


def test_int8_ptq_moe_experts():
    """int8_serve covers MoE expert weights (w1_q/w2_q per-expert scales);
    quantized top-k dispatch output tracks the bf16 model."""
    from nemo_tpu.llm.api import ptq
    from nemo_tpu.models.llm.gpt import GPTModel

    cfg = tiny_test(seq_length=32, num_moe_experts=4, moe_router_topk=2,
                    moe_ffn_hidden_size=64)
    model = GPTModel(cfg)
    tokens = jnp.asarray(np.random.RandomState(0).randint(1, 100, (2, 16)))
    params = nn_unbox(model.init(jax.random.PRNGKey(0), tokens)["params"])
    logits_ref = model.apply({"params": params}, tokens)

    cfg_q, params_q = ptq(cfg, params, algorithm="int8_serve")
    flat = jax.tree_util.tree_leaves_with_path(params_q)
    assert any("w1_q" in jax.tree_util.keystr(p) for p, _ in flat)
    logits_q = GPTModel(cfg_q).apply({"params": params_q}, tokens)
    rel = float(jnp.linalg.norm(
        (logits_q - logits_ref).astype(jnp.float32))
        / jnp.linalg.norm(logits_ref.astype(jnp.float32)))
    assert rel < 0.15, rel


def nn_unbox(tree):
    import flax.linen as nn

    return nn.meta.unbox(tree)


def test_ptq_weight_only_round_trip():
    rng = np.random.RandomState(0)
    params = {
        "big": jnp.asarray(rng.randn(512, 256), jnp.float32),
        "small": jnp.asarray(rng.randn(8, 8), jnp.float32),
        "vec": jnp.asarray(rng.randn(64), jnp.float32),
    }
    q = quantize_params_int8(params, min_size=1024)
    assert isinstance(q["big"], dict) and q["big"]["q"].dtype == jnp.int8
    assert isinstance(q["small"], jnp.ndarray)  # below threshold: untouched
    back = dequantize_params(q, dtype=jnp.float32)
    rel = float(jnp.linalg.norm(back["big"] - params["big"]) / jnp.linalg.norm(params["big"]))
    assert rel < 0.01
    np.testing.assert_array_equal(np.asarray(back["small"]), np.asarray(params["small"]))
