"""QAT (quantization-aware training): fake-quant finetune whose weights
drop straight into int8 serving.

Reference: modelopt QAT surfaced through nemo ptq/finetune
(nemo/collections/llm/modelopt/quantization/quantizer.py).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nemo_tpu import llm
from nemo_tpu.data.gpt_dataset import MockDataModule
from nemo_tpu.models.llm.config import tiny_test
from nemo_tpu.parallel.mesh import MeshConfig


@pytest.fixture(scope="module")
def base():
    cfg = tiny_test(seq_length=32)
    from nemo_tpu.models.llm.gpt import GPTModel
    import flax.linen as nn

    model = GPTModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32), jnp.int32))
    return cfg, nn.meta.unbox(variables["params"])


def test_qat_trains_and_keeps_layout(base):
    cfg, params = base
    data = MockDataModule(seq_length=32, global_batch_size=8,
                          vocab_size=cfg.vocab_size)
    qcfg, module, state, metrics = llm.qat(
        cfg, params, data, algorithm="int8", mesh=MeshConfig(dp=8),
        max_steps=12)
    assert qcfg.quantization == "int8"
    assert np.isfinite(float(metrics["loss"]))
    # STE gradients actually moved the weights
    moved = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params, params)
    assert max(jax.tree.leaves(moved)) > 0
    # layout unchanged: same leaves as the bf16 tree
    assert (jax.tree.structure(state.params) == jax.tree.structure(params))


def test_qat_params_serve_int8(base):
    cfg, params = base
    data = MockDataModule(seq_length=32, global_batch_size=8,
                          vocab_size=cfg.vocab_size)
    qcfg, module, state, _ = llm.qat(
        cfg, params, data, algorithm="int8", mesh=MeshConfig(dp=8),
        max_steps=3)
    # drops straight into int8-resident serving
    scfg, sparams = llm.ptq(cfg, state.params, algorithm="int8_serve")
    from nemo_tpu.models.llm.gpt import GPTModel

    tokens = jnp.asarray(
        np.random.RandomState(0).randint(0, cfg.vocab_size, (2, 16)), jnp.int32)
    srv = GPTModel(scfg).apply({"params": sparams}, tokens)
    # serving arithmetic (per-channel W8A8) tracks the QAT fake-quant
    # forward (per-tensor): same argmax on most positions
    fq = GPTModel(qcfg).apply({"params": state.params}, tokens)
    assert np.isfinite(np.asarray(srv)).all()
    agree = np.mean(
        np.argmax(np.asarray(srv), -1) == np.argmax(np.asarray(fq), -1))
    assert agree > 0.9


def test_qat_rejects_unknown_algorithm(base):
    cfg, params = base
    with pytest.raises(ValueError, match="qat algorithm"):
        llm.qat(cfg, params, None, algorithm="int4")
