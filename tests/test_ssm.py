"""Mamba2/SSD + hybrid model tests (reference: gpt/model/ssm.py, HF mamba2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nemo_tpu.models.llm.config import GPTConfig
from nemo_tpu.models.llm.ssm import SSMConfig, SSMModel, ssd_chunked


def _ssd_reference(x, dt, A, B, C, D):
    """Per-token recurrence in numpy (ground truth)."""
    b, T, h, p = x.shape
    n = B.shape[-1]
    hstate = np.zeros((b, h, p, n), np.float64)
    ys = []
    for t in range(T):
        dA = np.exp(dt[:, t] * A)  # [b,h]
        hstate = hstate * dA[..., None, None] + (
            dt[:, t][..., None, None] * x[:, t][..., None] * B[:, t][:, :, None, :])
        y = np.einsum("bhpn,bhn->bhp", hstate, C[:, t]) + D[None, :, None] * x[:, t]
        ys.append(y)
    return np.stack(ys, 1)


@pytest.mark.parametrize("chunk", [4, 8, 16])
def test_ssd_chunked_matches_recurrence(chunk):
    rng = np.random.RandomState(0)
    b, T, h, p, n = 2, 16, 3, 4, 5
    x = rng.randn(b, T, h, p).astype(np.float32)
    dt = np.abs(rng.randn(b, T, h)).astype(np.float32) * 0.5
    A = -np.abs(rng.randn(h)).astype(np.float32)
    B = rng.randn(b, T, h, n).astype(np.float32)
    C = rng.randn(b, T, h, n).astype(np.float32)
    D = rng.randn(h).astype(np.float32)
    ref = _ssd_reference(x, dt, A, B, C, D)
    y, final = ssd_chunked(*map(jnp.asarray, (x, dt, A, B, C, D)), chunk)
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-4, rtol=1e-4)
    # final state matches recurrence final state
    hstate = np.zeros((b, h, p, n), np.float64)
    for t in range(T):
        dA = np.exp(dt[:, t] * A)
        hstate = hstate * dA[..., None, None] + (
            dt[:, t][..., None, None] * x[:, t][..., None] * B[:, t][:, :, None, :])
    np.testing.assert_allclose(np.asarray(final), hstate, atol=1e-4, rtol=1e-4)


def test_hf_mamba2_parity():
    import torch
    from transformers import Mamba2Config
    from transformers.models.mamba2.modeling_mamba2 import Mamba2ForCausalLM

    from nemo_tpu.interop.hf_models import import_hf_model

    torch.manual_seed(0)
    c = Mamba2Config(hidden_size=32, num_heads=8, head_dim=8, expand=2,
                     n_groups=2, state_size=16, num_hidden_layers=2,
                     vocab_size=100, conv_kernel=4, chunk_size=8)
    m = Mamba2ForCausalLM(c).eval()
    cfg, params = import_hf_model(m)
    tok = np.random.RandomState(0).randint(0, 99, (2, 12)).astype(np.int32)
    with torch.no_grad():
        ref = m(torch.tensor(tok, dtype=torch.long)).logits.float().numpy()
    ours = np.asarray(SSMModel(cfg).apply({"params": params}, jnp.asarray(tok)))
    np.testing.assert_allclose(ours, ref, atol=3e-3, rtol=1e-3)


def test_mamba_causality():
    cfg = SSMConfig(num_layers=2, hidden_size=32, vocab_size=100, num_heads=4,
                    head_dim=8, n_groups=2, state_size=8, chunk_size=8)
    model = SSMModel(cfg)
    rng = np.random.RandomState(0)
    t1 = rng.randint(0, 100, (1, 16)).astype(np.int32)
    t2 = t1.copy()
    t2[0, 10:] = (t2[0, 10:] + 7) % 100
    v = model.init(jax.random.PRNGKey(0), jnp.asarray(t1))
    l1 = model.apply(v, jnp.asarray(t1))
    l2 = model.apply(v, jnp.asarray(t2))
    np.testing.assert_allclose(np.asarray(l1)[:, :10], np.asarray(l2)[:, :10],
                               atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_hybrid_pattern_trains():
    """nemotron-h-style hybrid (mamba + attention + MLP) one grad step."""
    import optax

    cfg = SSMConfig(
        num_layers=4, hidden_size=32, vocab_size=100, num_heads=4, head_dim=8,
        n_groups=2, state_size=8, chunk_size=8,
        hybrid_override_pattern="M*-M",
        attn=GPTConfig(hidden_size=32, num_attention_heads=4,
                       num_query_groups=2, ffn_hidden_size=64,
                       position_embedding_type="none", compute_dtype="float32"))
    model = SSMModel(cfg)
    rng = np.random.RandomState(0)
    tok = jnp.asarray(rng.randint(0, 100, (2, 16)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), tok)["params"]
    import flax.linen as nn
    params = nn.meta.unbox(params)
    opt = optax.adam(1e-3)
    ost = opt.init(params)

    def loss_fn(p):
        logits = model.apply({"params": p}, tok)
        lp = jax.nn.log_softmax(logits[:, :-1])
        return -jnp.mean(jnp.take_along_axis(lp, tok[:, 1:, None], -1))

    l0, grads = jax.value_and_grad(loss_fn)(params)
    upd, ost = opt.update(grads, ost)
    params = optax.apply_updates(params, upd)
    l1 = loss_fn(params)
    assert np.isfinite(float(l0)) and float(l1) < float(l0)


def test_ssm_presets():
    from nemo_tpu.models.llm.ssm import mamba2_2_7b, nemotron_h_8b

    assert mamba2_2_7b().num_layers == 64
    nh = nemotron_h_8b()
    assert len(nh.pattern()) == nh.num_layers


def test_recurrent_decode_matches_full():
    """O(1)/token stateful decode == full forward (pure mamba2): prefill
    hands off (conv_buf, h), single-step recurrence continues exactly."""
    from nemo_tpu.models.llm.ssm import init_ssm_states

    cfg = SSMConfig(num_layers=2, hidden_size=32, vocab_size=100, num_heads=4,
                    head_dim=8, n_groups=2, state_size=8, chunk_size=8)
    model = SSMModel(cfg)
    rng = np.random.RandomState(0)
    T = 12
    tok = jnp.asarray(rng.randint(0, 100, (1, T)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), tok)
    full = model.apply(variables, tok)  # [1,T,V]

    S0 = 5
    states = init_ssm_states(cfg, 1, T)
    logits, states = model.apply(
        variables, tok[:, :S0], jnp.arange(S0)[None], states=states,
        decode_index=0, kv_valid=(jnp.arange(T) < S0)[None])
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full[:, :S0]),
                               atol=2e-4, rtol=1e-3)
    for t in range(S0, T):
        logits, states = model.apply(
            variables, tok[:, t:t + 1], jnp.array([[t]]), states=states,
            decode_index=t, kv_valid=(jnp.arange(T) <= t)[None])
        np.testing.assert_allclose(np.asarray(logits[:, 0]),
                                   np.asarray(full[:, t]),
                                   atol=2e-4, rtol=1e-3)


def test_hybrid_recurrent_decode_and_engine():
    """Hybrid (mamba+attention+MLP) stateful decode == full forward, and
    SSMGenerationEngine handles left-padded batched prompts."""
    from nemo_tpu.models.llm.ssm import SSMGenerationEngine, init_ssm_states

    cfg = SSMConfig(
        num_layers=4, hidden_size=32, vocab_size=100, num_heads=4, head_dim=8,
        n_groups=2, state_size=8, chunk_size=8,
        hybrid_override_pattern="M*-M",
        attn=GPTConfig(hidden_size=32, num_attention_heads=4,
                       num_query_groups=2, ffn_hidden_size=64,
                       position_embedding_type="none", compute_dtype="float32"))
    model = SSMModel(cfg)
    rng = np.random.RandomState(1)
    T = 10
    tok = jnp.asarray(rng.randint(0, 100, (1, T)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), tok)
    full = model.apply(variables, tok)
    states = init_ssm_states(cfg, 1, T)
    logits, states = model.apply(
        variables, tok[:, :4], jnp.arange(4)[None], states=states,
        decode_index=0, kv_valid=(jnp.arange(T) < 4)[None])
    for t in range(4, T):
        logits, states = model.apply(
            variables, tok[:, t:t + 1], jnp.array([[t]]), states=states,
            decode_index=t, kv_valid=(jnp.arange(T) <= t)[None])
        np.testing.assert_allclose(np.asarray(logits[:, 0]),
                                   np.asarray(full[:, t]),
                                   atol=2e-4, rtol=1e-3)

    # engine: left-padded batch, greedy == per-prompt greedy
    import flax.linen as nn
    params = nn.meta.unbox(variables["params"])
    eng = SSMGenerationEngine(cfg, params)
    prompts = [list(rng.randint(1, 100, 5)), list(rng.randint(1, 100, 3))]
    out = eng.generate_tokens(prompts, max_new_tokens=4)
    solo = [SSMGenerationEngine(cfg, params).generate_tokens(
        [p], max_new_tokens=4)[0] for p in prompts]
    assert out == solo


def test_ssm_continuous_batching_matches_engine():
    """SSM continuous batching (per-slot recurrent states) produces the
    same greedy streams as the batch engine; slots stay isolated across
    staggered admission and free_slot reuse."""
    from nemo_tpu.models.llm.ssm import (
        SSMContinuousBatchingEngine, SSMGenerationEngine)

    cfg = SSMConfig(
        num_layers=4, hidden_size=32, vocab_size=100, num_heads=4, head_dim=8,
        n_groups=2, state_size=8, chunk_size=8,
        hybrid_override_pattern="M*-M",
        attn=GPTConfig(hidden_size=32, num_attention_heads=4,
                       num_query_groups=2, ffn_hidden_size=64,
                       position_embedding_type="none", compute_dtype="float32"))
    import flax.linen as nn
    model = SSMModel(cfg)
    rng = np.random.RandomState(3)
    tok0 = jnp.asarray(rng.randint(0, 100, (1, 8)), jnp.int32)
    params = nn.meta.unbox(model.init(jax.random.PRNGKey(0), tok0)["params"])

    prompts = [list(rng.randint(1, 100, 6)), list(rng.randint(1, 100, 3))]
    max_new = 5
    ref = SSMGenerationEngine(cfg, params).generate_tokens(
        prompts, max_new_tokens=max_new)

    eng = SSMContinuousBatchingEngine(cfg, params, max_slots=2, max_len=64,
                                      prefill_buckets=(8,))
    outs = []
    for i, p in enumerate(prompts):
        toks = [eng.prefill_slot(i, p)]
        outs.append(toks)
    feed = np.asarray([o[0] for o in outs], np.int32)
    active = np.ones(2, bool)
    for _ in range(max_new - 1):
        feed = eng.decode_step(feed, active)
        for i in range(2):
            outs[i].append(int(feed[i]))
    assert outs == ref

    # slot reuse after free_slot: same prompt → same stream
    eng.free_slot(0)
    t = eng.prefill_slot(0, prompts[0])
    assert t == ref[0][0]


def test_llm_server_serves_ssm():
    """LLMServer dispatches SSMConfig to the recurrent engine."""
    from nemo_tpu.models.llm.ssm import SSMContinuousBatchingEngine
    from nemo_tpu.serve.openai_server import LLMServer
    import flax.linen as nn

    class ByteTok:
        def text_to_ids(self, t):
            return [b % 90 for b in t.encode()] or [1]

        def ids_to_text(self, ids):
            return bytes(max(32, min(126, i + 32)) for i in ids).decode(errors="replace")

    cfg = SSMConfig(num_layers=2, hidden_size=32, vocab_size=100, num_heads=4,
                    head_dim=8, n_groups=2, state_size=8, chunk_size=8)
    model = SSMModel(cfg)
    params = nn.meta.unbox(model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))["params"])
    srv = LLMServer(cfg, params, ByteTok(), max_slots=2, max_len=64)
    assert isinstance(srv.engine, SSMContinuousBatchingEngine)
    from nemo_tpu.serve.openai_server import SamplingParams as SP
    srv._worker.start()
    try:
        out = srv.submit("hi there", SP(max_new_tokens=4))
        assert isinstance(out, str) and len(out) > 0
    finally:
        srv.shutdown()


def test_ssm_and_t5_preset_tables():
    """Size-family presets construct coherent configs (reference:
    ssm.py BaseMambaConfig*/NemotronHConfig*, t5.py T5Config3B/11B)."""
    from nemo_tpu.models.llm import ssm as S
    from nemo_tpu.models.llm.t5 import t5_3b, t5_11b, t5_220m

    for f in (S.mamba2_130m, S.mamba2_370m, S.mamba2_780m, S.mamba2_1_3b,
              S.mamba2_2_7b, S.mamba2_8b):
        cfg = f()
        assert cfg.pattern() == "M" * cfg.num_layers
        assert cfg.d_inner == 2 * cfg.hidden_size  # mamba2 expand=2
    # literal reference layouts (gpt/model/ssm.py NemotronHConfig4B/8B/47B/
    # 56B): layer counts, attention-block counts, per-size state dims
    ref_nh = {
        S.nemotron_h_4b: (52, 4, 128), S.nemotron_h_8b: (52, 4, 128),
        S.nemotron_h_47b: (98, 5, 256), S.nemotron_h_56b: (118, 10, 256),
    }
    for f, (n_layers, n_attn, state) in ref_nh.items():
        cfg = f()
        assert len(cfg.pattern()) == cfg.num_layers == n_layers
        assert cfg.pattern().count("*") == n_attn
        assert cfg.state_size == state
        assert set(cfg.pattern()) <= {"M", "*", "-"}
        assert cfg.attn is not None
        assert cfg.attn.hidden_size == cfg.hidden_size
    assert S.nemotron_h_4b().num_heads == 112          # mamba_num_heads
    assert S.nemotron_h_4b().attn.head_dim == 128      # kv_channels
    assert t5_3b().hidden_size == 2048
    assert t5_11b().ffn_hidden_size == 10240
    assert t5_220m().num_layers == 12
