"""llm API tests: pretrain, finetune w/ LoRA, validate, import/export, config checks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nemo_tpu import llm
from nemo_tpu.data.gpt_dataset import MockDataModule
from nemo_tpu.models.llm.config import tiny_test
from nemo_tpu.parallel.mesh import MeshConfig


def test_validate_config_raises():
    cfg = tiny_test()
    with pytest.raises(ValueError, match="GBS"):
        llm.validate_config(cfg, MeshConfig(dp=8), global_batch_size=9, micro_batch_size=2)
    with pytest.raises(ValueError, match="heads"):
        llm.validate_config(
            tiny_test(num_attention_heads=3, num_query_groups=3),
            MeshConfig(dp=4, tp=2), 8, 1)


def test_pretrain_api(tmp_path):
    cfg = tiny_test(seq_length=32)
    data = MockDataModule(seq_length=32, global_batch_size=8, vocab_size=cfg.vocab_size)
    module, state, metrics = llm.pretrain(
        cfg, data, mesh=MeshConfig(dp=8), max_steps=2, log_dir=str(tmp_path)
    )
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 2


def test_lora_finetune():
    cfg = tiny_test(seq_length=32)
    from nemo_tpu.models.llm.gpt import GPTModel
    import flax.linen as nn

    model = GPTModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32), jnp.int32))
    base = nn.meta.unbox(variables["params"])

    lora = llm.LoRA(dim=4, alpha=8)
    mod = lora.build_module(cfg, base, MeshConfig(dp=8))
    # adapters are small
    total = sum(x.size for x in jax.tree.leaves(base))
    assert mod.num_adapter_weights < total * 0.2

    state = mod.init_state()
    # zero-init B → merged == base at step 0
    merged0 = mod.merged_params(state)
    np.testing.assert_allclose(
        np.asarray(merged0["layers"]["attention"]["q_proj"]["kernel"]),
        np.asarray(base["layers"]["attention"]["q_proj"]["kernel"]), atol=1e-7)

    rng = np.random.RandomState(0)
    batch = {
        "tokens": jnp.asarray(rng.randint(0, 100, (4, 32)), jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 100, (4, 32)), jnp.int32),
        "loss_mask": jnp.ones((4, 32), jnp.float32),
    }
    losses = []
    for i in range(5):
        state, m = mod.train_step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    # base params untouched
    np.testing.assert_array_equal(
        np.asarray(mod.base_params["layers"]["mlp"]["fc2"]["kernel"]),
        np.asarray(base["layers"]["mlp"]["fc2"]["kernel"]))


def test_validate_and_hf_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(vocab_size=64, hidden_size=32, intermediate_size=48,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2, max_position_embeddings=64)
    hf = LlamaForCausalLM(hf_cfg).eval()
    import tempfile, os
    d = str(tmp_path / "hf")
    hf.save_pretrained(d)
    cfg, params = llm.import_ckpt(f"hf://{d}")
    assert cfg.num_layers == 2
    out = llm.export_ckpt(cfg, params, "hf", str(tmp_path / "export"))
    sd = torch.load(os.path.join(out, "pytorch_model.bin"), weights_only=True)
    orig = hf.state_dict()
    for k in sd:
        np.testing.assert_allclose(sd[k].numpy(), orig[k].float().numpy(), atol=1e-6)


def test_canonical_lora_per_target_ranks_and_hf_export():
    from nemo_tpu.llm.peft import CanonicalLoRA

    cfg = tiny_test(seq_length=32)
    from nemo_tpu.models.llm.gpt import GPTModel
    import flax.linen as nn

    model = GPTModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32), jnp.int32))
    base = nn.meta.unbox(variables["params"])

    lora = CanonicalLoRA(dim=4, alpha=8, dim_overrides={"q_proj": 8})
    mod = lora.build_module(cfg, base, MeshConfig(dp=8))
    state = mod.init_state()
    # rank override applied to q_proj only
    for key, ad in state["adapters"].items():
        r = ad["lora_a"].shape[-1]
        assert r == (8 if "q_proj" in key else 4), (key, r)
    # zero-init B → merged == base
    merged0 = mod.merged_params(state)
    np.testing.assert_allclose(
        np.asarray(merged0["layers"]["attention"]["q_proj"]["kernel"]),
        np.asarray(base["layers"]["attention"]["q_proj"]["kernel"]), atol=1e-7)
    # one step trains
    rng = np.random.RandomState(0)
    batch = {
        "tokens": jnp.asarray(rng.randint(0, 100, (2, 32)), jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 100, (2, 32)), jnp.int32),
        "loss_mask": jnp.ones((2, 32), jnp.float32),
    }
    state, m = mod.train_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    # HF PEFT export: per-layer unstacked names + torch [r, d_in] layout
    sd = mod.export_hf_peft(state["adapters"])
    qa = [k for k in sd if "q_proj.lora_A" in k]
    assert len(qa) == cfg.num_layers
    assert sd[qa[0]].shape[0] == 8  # rank rows (torch lora_A layout)


def test_dora_identity_at_init_and_column_magnitudes():
    """ADVICE r2: DoRA magnitude is per OUTPUT channel (norm over the
    contraction axis) and trainable. At init (B=0, m=‖W‖_col) the merged
    weights must equal the base weights exactly."""
    import nemo_tpu.llm as llm
    from nemo_tpu.models.llm.config import tiny_test
    from nemo_tpu.parallel.mesh import MeshConfig

    cfg = tiny_test(num_layers=2, seq_length=16)
    from nemo_tpu.models.llm.train import GPTTrainModule
    base_mod = GPTTrainModule(cfg, mesh_cfg=MeshConfig(dp=8))
    base = base_mod.init_state(seed=0).params
    lora = llm.LoRA(dim=4, alpha=8, dora=True)
    mod = lora.build_module(cfg, base, MeshConfig(dp=8))
    adapters = mod.init_adapters(seed=0)
    for key, ad in adapters.items():
        assert "dora_m" in ad, key
        # magnitude has one entry per flattened output channel
        assert ad["dora_m"].shape[-2] == 1
        assert ad["dora_m"].shape[-1] == ad["lora_b"].shape[-1]
    merged = mod.merge(base, adapters)
    for path in mod.targets:
        node_m, node_b = merged, base
        for k in path:
            node_m, node_b = node_m[k], node_b[k]
        np.testing.assert_allclose(
            np.asarray(node_m, np.float32), np.asarray(node_b, np.float32),
            atol=2e-6, err_msg="/".join(path))


def test_deploy_and_evaluate_tasks():
    """llm.deploy serves a preset end-to-end; llm.evaluate runs the MC
    protocol (reference api.py:588 deploy, :806 evaluate)."""
    import http.client
    import json as _json

    import nemo_tpu.llm as llm
    from nemo_tpu.llm.api import deploy, evaluate

    srv, httpd = deploy("tiny_test", port=18321, blocking=False,
                        max_slots=2, max_len=64)
    try:
        conn = http.client.HTTPConnection("127.0.0.1", 18321, timeout=120)
        conn.request("POST", "/v1/completions",
                     _json.dumps({"prompt": "ab", "max_tokens": 2}),
                     {"Content-Type": "application/json"})
        r = conn.getresponse()
        out = _json.loads(r.read())
        assert r.status == 200 and out["choices"][0]["text"] is not None
    finally:
        srv.shutdown()

    # evaluate: tiny random model — protocol runs and returns accuracies
    from nemo_tpu.models.llm.config import tiny_test
    import flax.linen as nn
    import jax, jax.numpy as jnp
    from nemo_tpu.models.llm.gpt import GPTModel
    from nemo_tpu.data.text_tokenizers import ByteLevelTokenizer

    cfg = tiny_test(vocab_size=512)
    variables = GPTModel(cfg).init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, 8), jnp.int32))
    params = nn.meta.unbox(variables["params"])
    tasks = [
        {"context": "q1", "choices": ["aa", "bb"], "answer": 0},
        {"context": "q2", "choices": ["cc", "dd"], "answer": 1},
    ]
    res = evaluate(cfg, params, ByteLevelTokenizer(), tasks, batch_size=2)
    assert 0.0 <= res["accuracy"] <= 1.0 and "accuracy_norm" in res
