"""Serving HBM planner tests (auto_configurator.serving_memory_plan)."""

def test_serving_memory_plan():
    """Quantization/latent-cache effects show up in the plan with the
    right ratios; max_slots_at_len is consistent with fits."""
    from nemo_tpu.llm.auto_configurator import serving_memory_plan
    from nemo_tpu.models.llm.config import llama32_1b, tiny_test

    cfg = llama32_1b()
    base = serving_memory_plan(cfg, max_slots=8, max_len=2048)
    q = serving_memory_plan(cfg, max_slots=8, max_len=2048,
                            quantize_weights=True, quantize_kv_cache=True)
    assert q["weights_gb"] < 0.55 * base["weights_gb"] + 0.01
    assert q["kv_cache_gb"] < 0.75 * base["kv_cache_gb"]
    assert q["total_gb"] < base["total_gb"]

    # MLA latent cache: per-token KV far below the full-head equivalent
    mla = tiny_test(kv_lora_rank=16, q_lora_rank=24, qk_head_dim=16,
                    qk_pos_emb_head_dim=8, v_head_dim=16)
    lat = serving_memory_plan(mla, max_slots=8, max_len=2048)
    full_equiv = 2 * mla.num_attention_heads * (16 + 8)
    assert lat["kv_cache_gb"] < full_equiv / (16 + 8) * 0.1 * base["kv_cache_gb"]

    # slots that "fit" actually fit
    n = base["max_slots_at_len"]
    if n > 0:
        at = serving_memory_plan(cfg, max_slots=n, max_len=2048)
        assert at["fits"]
        over = serving_memory_plan(cfg, max_slots=n * 4 + 64, max_len=2048)
        assert not over["fits"] or over["total_gb"] <= 15.75
