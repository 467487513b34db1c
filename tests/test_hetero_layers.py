"""Heterogeneous layer stacks: window patterns (gemma3/gpt-oss), NoPE +
chunked attention + qk-l2 (llama4), attention sinks (gpt-oss), cyclic MoE
patterns, interleaved rotary (chatglm), yarn rope scaling.

Reference parity: gemma3.py interleaved_attn_pattern, gpt_oss.py
window_attn_skip_freq/sinks, llama.py Llama4Config nope_layer_interval /
moe_layer_freq / attention_chunk_size / qk_l2_norm."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nemo_tpu.models.llm.config import (
    GPTConfig, baichuan2_7b, chatglm3_6b, gemma3_1b, gemma3_4b, gemma3_12b,
    gemma3_27b, gpt_oss_20b, gpt_oss_120b, llama4_maverick, llama4_scout)
from nemo_tpu.models.llm.gpt import (
    GPTModel, apply_rope, causal_attention, hetero_period, init_kv_caches,
    layer_is_moe, layer_uses_rope, layer_window, rope_frequencies,
    yarn_mscale)


def _tiny(**kw):
    base = dict(num_layers=4, hidden_size=32, ffn_hidden_size=64,
                num_attention_heads=4, num_query_groups=2, vocab_size=64,
                seq_length=32, params_dtype="float32",
                compute_dtype="float32", remat="none")
    base.update(kw)
    return GPTConfig(**base)


def _logits(cfg, toks, seed=0):
    m = GPTModel(cfg)
    params = m.init(jax.random.PRNGKey(seed), toks)
    return m.apply(params, toks), params, m


# ---------------------------------------------------------------------------
# pattern helpers
# ---------------------------------------------------------------------------

def test_layer_pattern_helpers():
    cfg = _tiny(window_pattern=(128, None), nope_layer_interval=4,
                num_moe_experts=4, moe_layer_freq=(0, 1))
    assert hetero_period(cfg) == 4
    assert [layer_window(cfg, i) for i in range(4)] == [128, None, 128, None]
    assert [layer_uses_rope(cfg, i) for i in range(4)] == [
        True, True, True, False]
    assert [layer_is_moe(cfg, i) for i in range(4)] == [
        False, True, False, True]


def test_gemma3_pattern_period():
    cfg = gemma3_1b()
    assert hetero_period(cfg) == 6
    assert layer_window(cfg, 4) == 512 and layer_window(cfg, 5) is None
    # 26 % 6 != 0 → model falls back to the unrolled stack (still valid)


# ---------------------------------------------------------------------------
# grouped scan == unrolled stack (exact parity via param remapping)
# ---------------------------------------------------------------------------

def test_group_scan_matches_unrolled():
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, 64, (2, 8)))
    cfg = _tiny(window_pattern=(4, None))  # period 2, 4 layers → group scan
    out_s, params_s, _ = _logits(cfg, toks)

    # remap scanned params (layers/sub{j}, leading axis L/P) → unrolled
    cfg_u = dataclasses.replace(cfg, scan_layers=False)
    mu = GPTModel(cfg_u)
    params_u = mu.init(jax.random.PRNGKey(1), toks)
    P = 2
    flat_u = jax.tree_util.tree_map(lambda x: x, params_u)  # copy structure
    scanned = params_s["params"]["layers"]
    new_layers = {}
    for i in range(cfg.num_layers):
        g, j = divmod(i, P)
        sub = jax.tree.map(lambda x: x[g], scanned[f"sub{j}"])
        new_layers[f"layer{i}"] = sub
    pu = dict(params_u["params"])
    for k in new_layers:
        pu[k] = new_layers[k]
    pu["embedding"] = params_s["params"]["embedding"]
    pu["final_norm"] = params_s["params"]["final_norm"]
    pu["lm_head"] = params_s["params"]["lm_head"]
    out_u = mu.apply({"params": pu}, toks)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_u),
                               atol=1e-5)


def test_hetero_decode_matches_full_forward():
    """KV-cache decode through LayerGroup == full forward (cache plumbing
    reshapes [L,..] ↔ [L/P,P,..])."""
    rng = np.random.default_rng(1)
    cfg = _tiny(window_pattern=(4, None), attention_sinks=True)
    toks = jnp.asarray(rng.integers(0, 64, (2, 8)))
    m = GPTModel(cfg)
    params = m.init(jax.random.PRNGKey(0), toks)
    full = m.apply(params, toks)

    caches = init_kv_caches(cfg, 2, 8, jnp.float32)
    logits, caches = m.apply(params, toks[:, :7], kv_caches=caches,
                             decode_index=0)
    step, _ = m.apply(
        params, toks[:, 7:8],
        positions=jnp.full((2, 1), 7, jnp.int32),
        kv_caches=caches, decode_index=7)
    np.testing.assert_allclose(np.asarray(step[:, 0]),
                               np.asarray(full[:, 7]), atol=2e-4)


# ---------------------------------------------------------------------------
# attention mechanics
# ---------------------------------------------------------------------------

def test_chunked_attention_mask():
    rng = np.random.default_rng(2)
    B, S, H, D = 1, 8, 2, 4
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    out = causal_attention(q, k, v, scale=0.5, chunk=4)
    # manual: causal AND same-chunk softmax
    scores = np.einsum("bshd,bthd->bhst", q, k) * 0.5
    qp, kp = np.arange(S)[:, None], np.arange(S)[None, :]
    mask = (kp <= qp) & (kp // 4 == qp // 4)
    scores = np.where(mask[None, None], scores, -1e30)
    e = np.exp(scores - scores.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    ref = np.einsum("bhst,bthd->bshd", probs, v)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_attention_sinks_math():
    """Sink logit joins the softmax denominator but emits no value: with
    sink=s, row sums of probs = sum(e)/(sum(e)+e^s) < 1."""
    rng = np.random.default_rng(3)
    B, S, H, D = 1, 4, 2, 4
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    sink = jnp.asarray([[5.0], [-50.0]])  # head0 strong sink, head1 none
    out_sink = causal_attention(q, k, v, scale=1.0, sink=sink)
    out_plain = causal_attention(q, k, v, scale=1.0)
    # head1 (sink −50 ≈ no sink) matches plain attention
    np.testing.assert_allclose(np.asarray(out_sink[:, :, 1]),
                               np.asarray(out_plain[:, :, 1]), atol=1e-4)
    # head0's outputs shrink toward 0 (probability mass absorbed by sink)
    assert np.all(np.abs(np.asarray(out_sink[:, :, 0]))
                  < np.abs(np.asarray(out_plain[:, :, 0])) + 1e-6)


def test_interleaved_rope_norm_and_identity():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 6, 2, 8)), jnp.float32)
    inv = jnp.asarray(1.0 / 10000 ** (np.arange(0, 8, 2) / 8), jnp.float32)
    pos = jnp.arange(6)
    ri = apply_rope(x, pos, inv, interleaved=True)
    rh = apply_rope(x, pos, inv, interleaved=False)
    # rotation preserves norms; conventions differ for t>0 but agree at t=0
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(ri), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ri[0, 0]), np.asarray(x[0, 0]),
                               atol=1e-6)
    assert not np.allclose(np.asarray(ri[0, 3]), np.asarray(rh[0, 3]))


def test_yarn_frequencies():
    cfg = _tiny(rope_scaling="yarn", rope_scaling_factor=32.0,
                old_context_len=4096, rotary_base=150000.0, kv_channels=64)
    inv_y = rope_frequencies(cfg)
    inv_p = rope_frequencies(dataclasses.replace(cfg, rope_scaling=None))
    # highest-frequency dims extrapolate (unchanged); lowest interpolate /32
    np.testing.assert_allclose(inv_y[0], inv_p[0], rtol=1e-6)
    np.testing.assert_allclose(inv_y[-1], inv_p[-1] / 32.0, rtol=1e-6)
    assert np.all(inv_y <= inv_p + 1e-12)
    assert yarn_mscale(cfg) == pytest.approx(0.1 * np.log(32.0) + 1.0)


# ---------------------------------------------------------------------------
# family forwards (tiny shapes, real feature flags)
# ---------------------------------------------------------------------------

def test_tiny_gemma3_like_forward():
    cfg = _tiny(window_pattern=(4, 4, None), num_layers=6,
                rope_local_base=10000.0, rotary_base=1000000.0,
                qk_layernorm=True, rope_scaling="linear",
                rope_scaling_factor=8.0,
                share_embeddings_and_output_weights=True)
    toks = jnp.asarray(np.random.default_rng(5).integers(0, 64, (2, 8)))
    out, _, _ = _logits(cfg, toks)
    assert out.shape == (2, 8, 64) and np.all(np.isfinite(np.asarray(out)))


def test_tiny_gpt_oss_like_forward():
    cfg = _tiny(window_pattern=(4, None), attention_sinks=True,
                add_qkv_bias=True, add_bias_linear=True,
                activation="quick_gelu", activation_clamp=7.0,
                num_moe_experts=4, moe_router_topk=2,
                rope_scaling="yarn", rope_scaling_factor=32.0,
                old_context_len=16)
    toks = jnp.asarray(np.random.default_rng(6).integers(0, 64, (2, 8)))
    out, _, _ = _logits(cfg, toks)
    assert out.shape == (2, 8, 64) and np.all(np.isfinite(np.asarray(out)))


def test_tiny_llama4_like_forward_and_grads():
    cfg = _tiny(nope_layer_interval=4, attention_chunk_size=4,
                qk_l2_norm=True, rotary_interleaved=True,
                num_moe_experts=4, moe_router_topk=1,
                moe_layer_freq=(0, 1),
                moe_router_score_function="sigmoid",
                moe_shared_expert_intermediate_size=32)
    toks = jnp.asarray(np.random.default_rng(7).integers(0, 64, (2, 8)))
    m = GPTModel(cfg)
    params = m.init(jax.random.PRNGKey(0), toks)

    def loss(p):
        lg = m.apply(p, toks, train=True,
                     rngs={"dropout": jax.random.PRNGKey(1)})
        return jnp.mean(lg ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)


def test_new_presets_construct():
    for f in (gemma3_1b, gemma3_4b, gemma3_12b, gemma3_27b, llama4_scout,
              llama4_maverick, gpt_oss_20b, gpt_oss_120b, chatglm3_6b,
              baichuan2_7b):
        cfg = f()
        assert cfg.num_layers > 0 and cfg.head_dim > 0
    assert gpt_oss_20b().head_dim == 64
    assert llama4_maverick().moe_layer_freq == (0, 1)
    assert hetero_period(llama4_scout()) == 4
    assert chatglm3_6b().rotary_percent == 0.5


def test_unroll_params_matches_scan():
    """gpt.unroll_params: scan-stacked checkpoint → unrolled layout gives
    the same logits (the serving fast-path conversion, openai_server)."""
    from nemo_tpu.models.llm.gpt import unroll_params

    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, 64, (2, 8)))
    cfg = _tiny()  # homogeneous, scan_layers=True
    out_s, params_s, _ = _logits(cfg, toks)
    cfg_u = dataclasses.replace(cfg, scan_layers=False)
    pu = unroll_params(cfg, dict(params_s["params"]))
    out_u = GPTModel(cfg_u).apply({"params": pu}, toks)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_u),
                               atol=1e-5)
