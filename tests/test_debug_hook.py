"""Tensor debug hooks (reference: nemo/utils/debug_hook.py) on a real model."""

import numpy as np

import jax
import jax.numpy as jnp

from nemo_tpu.models.llm.config import tiny_test
from nemo_tpu.models.llm.gpt import GPTModel
from nemo_tpu.utils.debug_hook import (
    activation_summary,
    capture_activations,
    find_anomalies,
    grad_summary,
    save_debug_dump,
    tensor_stats,
)


def _model():
    cfg = tiny_test(seq_length=16)
    model = GPTModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16), jnp.int32))
    import flax.linen as nn

    return cfg, model, {"params": nn.meta.unbox(variables["params"])}


def test_capture_and_summary(tmp_path):
    cfg, model, variables = _model()
    tokens = jnp.asarray(
        np.random.RandomState(0).randint(0, cfg.vocab_size, (2, 16)), jnp.int32)
    out, acts = capture_activations(model, variables, tokens)
    assert out.shape == (2, 16, cfg.vocab_size)
    assert len(acts) > 0  # submodule outputs captured
    stats = activation_summary(acts)
    assert all(np.isfinite(s["l2"]) for s in stats.values())
    assert find_anomalies(stats, abs_max_threshold=1e9) == []
    # filtered capture narrows to matching paths
    _, att = capture_activations(
        model, variables, tokens, filter_fn=lambda p: "attention" in p)
    assert att and all("attention" in k for k in att)
    save_debug_dump(str(tmp_path / "dump.npz"), acts)
    loaded = np.load(str(tmp_path / "dump.npz"))
    assert len(loaded.files) == len(
        [k for k, v in acts.items() if hasattr(v, "shape")])


def test_grad_summary_and_anomaly_detection():
    cfg, model, variables = _model()
    tokens = jnp.asarray(
        np.random.RandomState(1).randint(0, cfg.vocab_size, (2, 16)), jnp.int32)

    def loss_fn(params, tokens):
        logits = model.apply({"params": params}, tokens)
        return jnp.mean(logits.astype(jnp.float32) ** 2)

    stats = grad_summary(loss_fn, variables["params"], tokens)
    assert stats and all(np.isfinite(s["l2"]) for s in stats.values())

    # planted NaN is reported by name
    s = tensor_stats(jnp.array([1.0, np.nan]))
    assert s["nan_frac"] == 0.5
    bad = find_anomalies({"x": s})
    assert bad and bad[0].startswith("x:")
