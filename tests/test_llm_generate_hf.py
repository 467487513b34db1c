"""Generation-engine tests + HF llama import logits parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nemo_tpu.models.llm.config import tiny_test
from nemo_tpu.models.llm.generate import GenerationEngine, SamplingParams
from nemo_tpu.models.llm.gpt import GPTModel


@pytest.fixture(scope="module")
def tiny_model():
    cfg = tiny_test()
    model = GPTModel(cfg)
    tokens = jnp.zeros((1, 8), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), tokens)
    return cfg, model, variables["params"]


def test_greedy_generate_matches_full_forward(tiny_model):
    """Greedy decode via KV cache == argmax chain via repeated full forward."""
    cfg, model, params = tiny_model
    prompt = [5, 17, 3]
    engine = GenerationEngine(cfg, params, cache_dtype=jnp.float32)
    out = engine.generate_tokens([prompt], SamplingParams(greedy=True, max_new_tokens=6))[0]

    seq = list(prompt)
    for _ in range(6):
        logits = model.apply({"params": params}, jnp.asarray([seq], jnp.int32))
        nxt = int(jnp.argmax(logits[0, -1]))
        seq.append(nxt)
    assert out == seq[len(prompt):]


def test_generate_batch_varied_lengths(tiny_model):
    cfg, model, params = tiny_model
    engine = GenerationEngine(cfg, params, cache_dtype=jnp.float32)
    prompts = [[1, 2, 3, 4, 5], [7], [9, 8]]
    outs = engine.generate_tokens(prompts, SamplingParams(greedy=True, max_new_tokens=4))
    assert len(outs) == 3 and all(len(o) == 4 for o in outs)
    # each sample must match its own single-sample generation (padding-invariance)
    for p, o in zip(prompts, outs):
        solo = engine.generate_tokens([p], SamplingParams(greedy=True, max_new_tokens=4))[0]
        assert o == solo


def test_sampling_params(tiny_model):
    cfg, model, params = tiny_model
    engine = GenerationEngine(cfg, params, cache_dtype=jnp.float32)
    sp = SamplingParams(greedy=False, temperature=1.0, top_k=10, max_new_tokens=8)
    a = engine.generate_tokens([[3, 4]], sp, seed=0)[0]
    b = engine.generate_tokens([[3, 4]], sp, seed=1)[0]
    assert len(a) == 8
    # different seeds should (almost surely) differ for a random model
    assert a != b


def test_hf_llama_import_logits_parity():
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    from nemo_tpu.interop.hf_llama import import_hf_llama, export_hf_llama_state

    hf_cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
        attention_bias=False, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = LlamaForCausalLM(hf_cfg).eval()

    cfg, params = import_hf_llama(hf)
    model = GPTModel(cfg)

    rng = np.random.RandomState(0)
    tokens = rng.randint(0, 128, (2, 10)).astype(np.int32)
    with torch.no_grad():
        ref = hf(torch.tensor(tokens.astype(np.int64))).logits.numpy()
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(tokens)))
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)

    # round-trip export → identical state dict values
    sd2 = export_hf_llama_state(params, cfg)
    orig = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    for k, v in sd2.items():
        np.testing.assert_allclose(v, orig[k], atol=1e-6, err_msg=k)
