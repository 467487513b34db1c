"""HF importers beyond the llama family: phi3, starcoder2, nemotron,
deepseek-v3 (MLA + sigmoid-routed MoE).

Reference parity: the per-family importer connectors
(`nemo/collections/llm/gpt/model/phi3.py`, `starcoder2.py`, `nemotron.py`,
`deepseek.py` — each registers an HF importer via ConnectorMixin).

Each family maps to a GPTConfig + our canonical param tree; fused HF
projections (phi3 qkv_proj / gate_up_proj) are split, deepseek's
rope-interleaved columns are permuted to the half-split convention so a
single rope implementation serves every family.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import numpy as np

from nemo_tpu.interop.hf_llama import config_from_hf, params_from_hf_state
from nemo_tpu.models.llm.config import GPTConfig


def _split_phi3_fused(sd: Dict[str, np.ndarray], hf_cfg) -> Dict[str, np.ndarray]:
    """phi3 fuses qkv_proj ([H*dh + 2*G*dh, D]) and gate_up_proj; split to
    llama-style names so the generic converter applies."""
    out = dict(sd)
    H = hf_cfg.num_attention_heads
    G = hf_cfg.num_key_value_heads
    dh = hf_cfg.hidden_size // H
    F = hf_cfg.intermediate_size
    i = 0
    while f"model.layers.{i}.self_attn.qkv_proj.weight" in out:
        w = out.pop(f"model.layers.{i}.self_attn.qkv_proj.weight")
        out[f"model.layers.{i}.self_attn.q_proj.weight"] = w[: H * dh]
        out[f"model.layers.{i}.self_attn.k_proj.weight"] = w[H * dh : (H + G) * dh]
        out[f"model.layers.{i}.self_attn.v_proj.weight"] = w[(H + G) * dh :]
        gu = out.pop(f"model.layers.{i}.mlp.gate_up_proj.weight")
        out[f"model.layers.{i}.mlp.gate_proj.weight"] = gu[:F]
        out[f"model.layers.{i}.mlp.up_proj.weight"] = gu[F:]
        i += 1
    return out


def _deinterleave(w_cols: np.ndarray) -> np.ndarray:
    """Permute rope columns interleaved→half-split: half-split col j pairs
    (j, j+d/2) must carry what interleaved pairs (2j, 2j+1) carried."""
    d = w_cols.shape[-1]
    perm = np.concatenate([np.arange(0, d, 2), np.arange(1, d, 2)])
    return w_cols[..., perm]


def config_from_hf_deepseek(c) -> GPTConfig:
    return GPTConfig(
        num_layers=c.num_hidden_layers,
        hidden_size=c.hidden_size,
        ffn_hidden_size=c.intermediate_size,
        num_attention_heads=c.num_attention_heads,
        vocab_size=c.vocab_size,
        seq_length=c.max_position_embeddings,
        layernorm_epsilon=c.rms_norm_eps,
        rotary_base=c.rope_theta,
        kv_lora_rank=c.kv_lora_rank,
        q_lora_rank=c.q_lora_rank,
        qk_head_dim=c.qk_nope_head_dim,
        qk_pos_emb_head_dim=c.qk_rope_head_dim,
        v_head_dim=c.v_head_dim,
        num_moe_experts=c.n_routed_experts or 0,
        moe_router_topk=c.num_experts_per_tok,
        moe_ffn_hidden_size=c.moe_intermediate_size,
        moe_shared_expert_intermediate_size=(
            c.moe_intermediate_size * c.n_shared_experts if c.n_shared_experts else None),
        moe_first_k_dense=c.first_k_dense_replace,
        moe_router_score_function="sigmoid",
        moe_router_enable_expert_bias=True,
        moe_router_num_groups=c.n_group,
        moe_router_group_topk=c.topk_group,
        moe_router_topk_scaling_factor=c.routed_scaling_factor,
        moe_router_norm_topk_prob=c.norm_topk_prob,
        moe_dispatch="dense",  # exact combine for import-parity; flip to topk to train
        scan_layers=False,
        compute_dtype="float32",
        share_embeddings_and_output_weights=bool(c.tie_word_embeddings),
    )


def params_from_hf_deepseek(sd: Dict[str, np.ndarray], cfg: GPTConfig,
                            interleaved_rope: bool = True) -> Dict[str, Any]:
    L, D, H = cfg.num_layers, cfg.hidden_size, cfg.num_attention_heads
    dn, dr, dv = cfg.qk_head_dim, cfg.qk_pos_emb_head_dim, cfg.v_head_dim
    E = cfg.num_moe_experts

    def t(k):
        return np.ascontiguousarray(np.transpose(sd[k]))

    params: Dict[str, Any] = {
        "embedding": sd["model.embed_tokens.weight"],
        "final_norm": {"scale": sd["model.norm.weight"]},
    }
    if not cfg.share_embeddings_and_output_weights:
        params["lm_head"] = {"kernel": np.transpose(sd["lm_head.weight"])}

    for i in range(L):
        pre = f"model.layers.{i}"
        q_up = t(f"{pre}.self_attn.q_b_proj.weight").reshape(cfg.q_lora_rank, H, dn + dr)
        kv_down = t(f"{pre}.self_attn.kv_a_proj_with_mqa.weight")  # [D, kv_lora+dr]
        if interleaved_rope:
            q_up = np.concatenate([q_up[..., :dn], _deinterleave(q_up[..., dn:])], -1)
            kv_down = np.concatenate(
                [kv_down[:, : cfg.kv_lora_rank],
                 _deinterleave(kv_down[:, cfg.kv_lora_rank:])], -1)
        attn = {
            "q_down": {"kernel": t(f"{pre}.self_attn.q_a_proj.weight")},
            "q_down_norm": {"scale": sd[f"{pre}.self_attn.q_a_layernorm.weight"]},
            "q_up": {"kernel": q_up},
            "kv_down": {"kernel": kv_down},
            "kv_down_norm": {"scale": sd[f"{pre}.self_attn.kv_a_layernorm.weight"]},
            "kv_up": {"kernel": t(f"{pre}.self_attn.kv_b_proj.weight").reshape(
                cfg.kv_lora_rank, H, dn + dv)},
            "o_proj": {"kernel": t(f"{pre}.self_attn.o_proj.weight").reshape(H, dv, D)},
        }
        layer: Dict[str, Any] = {
            "input_norm": {"scale": sd[f"{pre}.input_layernorm.weight"]},
            "post_attn_norm": {"scale": sd[f"{pre}.post_attention_layernorm.weight"]},
            "attention": attn,
        }
        if E and i >= cfg.moe_first_k_dense:
            Fm = cfg.moe_ffn_hidden_size
            w1 = np.stack([
                np.concatenate([t(f"{pre}.mlp.experts.{e}.gate_proj.weight"),
                                t(f"{pre}.mlp.experts.{e}.up_proj.weight")], 1)
                for e in range(E)])  # [E, D, 2F]
            w2 = np.stack([t(f"{pre}.mlp.experts.{e}.down_proj.weight") for e in range(E)])
            moe: Dict[str, Any] = {
                "router": {"kernel": t(f"{pre}.mlp.gate.weight")},
                "w1": w1, "w2": w2,
            }
            if cfg.moe_router_enable_expert_bias:
                moe["expert_bias"] = sd[f"{pre}.mlp.gate.e_score_correction_bias"]
            if cfg.moe_shared_expert_intermediate_size:
                moe["shared_expert"] = {
                    "fc1": {"kernel": np.concatenate(
                        [t(f"{pre}.mlp.shared_experts.gate_proj.weight"),
                         t(f"{pre}.mlp.shared_experts.up_proj.weight")], 1)},
                    "fc2": {"kernel": t(f"{pre}.mlp.shared_experts.down_proj.weight")},
                }
            layer["moe"] = moe
        else:
            layer["mlp"] = {
                "fc1": {"kernel": np.concatenate(
                    [t(f"{pre}.mlp.gate_proj.weight"), t(f"{pre}.mlp.up_proj.weight")], 1)},
                "fc2": {"kernel": t(f"{pre}.mlp.down_proj.weight")},
            }
        params[f"layer{i}"] = layer
    return params


def config_from_hf_mamba2(c):
    from nemo_tpu.models.llm.ssm import SSMConfig

    return SSMConfig(
        num_layers=c.num_hidden_layers,
        hidden_size=c.hidden_size,
        vocab_size=c.vocab_size,
        num_heads=c.num_heads,
        head_dim=c.head_dim,
        n_groups=c.n_groups,
        state_size=c.state_size,
        conv_kernel=c.conv_kernel,
        chunk_size=c.chunk_size,
        layernorm_epsilon=c.layer_norm_epsilon,
        time_step_limit=tuple(c.time_step_limit),
        use_conv_bias=c.use_conv_bias,
        share_embeddings_and_output_weights=bool(c.tie_word_embeddings),
    )


def params_from_hf_mamba2(sd: Dict[str, np.ndarray], cfg) -> Dict[str, Any]:
    params: Dict[str, Any] = {
        "embedding": sd["backbone.embeddings.weight"],
        "norm_f": {"scale": sd["backbone.norm_f.weight"]},
    }
    if not cfg.share_embeddings_and_output_weights:
        params["lm_head"] = {"kernel": np.transpose(sd["lm_head.weight"])}
    for i in range(cfg.num_layers):
        pre = f"backbone.layers.{i}"
        params[f"norm{i}"] = {"scale": sd[f"{pre}.norm.weight"]}
        mixer = {
            "in_proj": {"kernel": np.transpose(sd[f"{pre}.mixer.in_proj.weight"])},
            "conv_kernel": np.transpose(sd[f"{pre}.mixer.conv1d.weight"][:, 0, :]),
            "dt_bias": sd[f"{pre}.mixer.dt_bias"],
            "A_log": sd[f"{pre}.mixer.A_log"],
            "D": sd[f"{pre}.mixer.D"],
            "norm_scale": sd[f"{pre}.mixer.norm.weight"],
            "out_proj": {"kernel": np.transpose(sd[f"{pre}.mixer.out_proj.weight"])},
        }
        if cfg.use_conv_bias:
            mixer["conv_bias"] = sd[f"{pre}.mixer.conv1d.bias"]
        params[f"mixer{i}"] = mixer
    return params


def _stack_trees(trees):
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs), *trees)


def _pack_layers(trees, cfg: GPTConfig) -> Dict[str, Any]:
    """Per-layer param trees → the layout GPTModel expects: plain scan
    (leading L), pattern-period group scan (layers/sub{j}, leading L/P),
    or unrolled (layer{i})."""
    from nemo_tpu.models.llm.gpt import hetero_period

    L, P = cfg.num_layers, hetero_period(cfg)
    use_scan = cfg.scan_layers and cfg.moe_first_k_dense == 0 and (
        P == 1 or L % P == 0)
    if not use_scan:
        return {f"layer{i}": trees[i] for i in range(L)}
    if P == 1:
        return {"layers": _stack_trees(trees)}
    return {"layers": {f"sub{j}": _stack_trees(trees[j::P])
                       for j in range(P)}}


def config_from_hf_gemma3(c) -> GPTConfig:
    """transformers Gemma3TextConfig → GPTConfig (dual rope bases, 5:1
    sliding/full layer_types, qk-norm, sandwich norms)."""
    pattern = tuple(
        c.sliding_window if t == "sliding_attention" else None
        for t in c.layer_types)
    # collapse to the minimal cycle when one exists
    for p in range(1, len(pattern)):
        if len(pattern) % p == 0 and pattern == pattern[:p] * (len(pattern) // p):
            pattern = pattern[:p]
            break
    rope_scaling = None
    factor = 8.0
    rs = getattr(c, "rope_scaling", None)
    if rs and rs.get("rope_type", rs.get("type")) == "linear":
        rope_scaling = "linear"
        factor = float(rs["factor"])
    return GPTConfig(
        num_layers=c.num_hidden_layers,
        hidden_size=c.hidden_size,
        ffn_hidden_size=c.intermediate_size,
        num_attention_heads=c.num_attention_heads,
        num_query_groups=c.num_key_value_heads,
        kv_channels=c.head_dim,
        vocab_size=c.vocab_size,
        seq_length=c.max_position_embeddings,
        layernorm_epsilon=c.rms_norm_eps,
        rotary_base=c.rope_theta,
        rope_local_base=c.rope_local_base_freq,
        rope_scaling=rope_scaling,
        rope_scaling_factor=factor,
        window_pattern=pattern,
        attention_multiplier=float(c.query_pre_attn_scalar) ** -0.5,
        qk_layernorm=True,
        sandwich_norms=True,
        layernorm_zero_centered_gamma=True,
        activation="gelu",
        share_embeddings_and_output_weights=True,
        embedding_multiplier=float(c.hidden_size) ** 0.5,
        compute_dtype="float32",
    )


def params_from_hf_gemma3(sd: Dict[str, np.ndarray], cfg: GPTConfig) -> Dict[str, Any]:
    D, H, G, dh = (cfg.hidden_size, cfg.num_attention_heads, cfg.n_kv_heads,
                   cfg.head_dim)

    def t(k):
        return np.ascontiguousarray(np.transpose(sd[k]))

    trees = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}"
        trees.append({
            "input_norm": {"scale": sd[f"{p}.input_layernorm.weight"]},
            "attn_out_norm": {
                "scale": sd[f"{p}.post_attention_layernorm.weight"]},
            "post_attn_norm": {
                "scale": sd[f"{p}.pre_feedforward_layernorm.weight"]},
            "mlp_out_norm": {
                "scale": sd[f"{p}.post_feedforward_layernorm.weight"]},
            "attention": {
                "q_proj": {"kernel": t(f"{p}.self_attn.q_proj.weight")
                           .reshape(D, H, dh)},
                "k_proj": {"kernel": t(f"{p}.self_attn.k_proj.weight")
                           .reshape(D, G, dh)},
                "v_proj": {"kernel": t(f"{p}.self_attn.v_proj.weight")
                           .reshape(D, G, dh)},
                "o_proj": {"kernel": t(f"{p}.self_attn.o_proj.weight")
                           .reshape(H, dh, D)},
                "q_norm": {"scale": sd[f"{p}.self_attn.q_norm.weight"]},
                "k_norm": {"scale": sd[f"{p}.self_attn.k_norm.weight"]},
            },
            "mlp": {
                "fc1": {"kernel": np.concatenate(
                    [t(f"{p}.mlp.gate_proj.weight"),
                     t(f"{p}.mlp.up_proj.weight")], axis=1)},
                "fc2": {"kernel": t(f"{p}.mlp.down_proj.weight")},
            },
        })
    params = _pack_layers(trees, cfg)
    params["embedding"] = sd["model.embed_tokens.weight"]
    params["final_norm"] = {"scale": sd["model.norm.weight"]}
    return params


def config_from_hf_gpt_oss(c) -> GPTConfig:
    """transformers GptOssConfig → GPTConfig (alternating SWA/full, sinks,
    yarn rope, clamped (up+1)·quick-gelu MoE with per-expert biases)."""
    pattern = tuple(
        c.sliding_window if t == "sliding_attention" else None
        for t in c.layer_types)
    for p in range(1, len(pattern)):
        if len(pattern) % p == 0 and pattern == pattern[:p] * (len(pattern) // p):
            pattern = pattern[:p]
            break
    rs = getattr(c, "rope_scaling", None) or {}
    return GPTConfig(
        num_layers=c.num_hidden_layers,
        hidden_size=c.hidden_size,
        ffn_hidden_size=c.intermediate_size,
        moe_ffn_hidden_size=c.intermediate_size,
        num_attention_heads=c.num_attention_heads,
        num_query_groups=c.num_key_value_heads,
        kv_channels=c.head_dim,
        vocab_size=c.vocab_size,
        seq_length=c.max_position_embeddings,
        layernorm_epsilon=c.rms_norm_eps,
        rotary_base=c.rope_theta,
        rope_scaling="yarn" if rs.get("rope_type") == "yarn" else None,
        rope_scaling_factor=float(rs.get("factor", 32.0)),
        old_context_len=int(rs.get(
            "original_max_position_embeddings", 4096)),
        window_pattern=pattern,
        attention_sinks=True,
        add_qkv_bias=True,
        add_bias_linear=True,
        activation="quick_gelu",
        activation_clamp=7.0,
        glu_linear_offset=1.0,
        num_moe_experts=c.num_local_experts,
        moe_router_topk=c.num_experts_per_tok,
        moe_dispatch="dense",  # exact parity; switch to "topk" for scale
        compute_dtype="float32",
    )


def params_from_hf_gpt_oss(sd: Dict[str, np.ndarray], cfg: GPTConfig) -> Dict[str, Any]:
    D, H, G, dh = (cfg.hidden_size, cfg.num_attention_heads, cfg.n_kv_heads,
                   cfg.head_dim)

    def t(k):
        return np.ascontiguousarray(np.transpose(sd[k]))

    trees = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}"
        # HF gate_up_proj [E, D, 2F] interleaves gate/up on even/odd cols
        gu = sd[f"{p}.mlp.experts.gate_up_proj"]
        w1 = np.concatenate([gu[..., 0::2], gu[..., 1::2]], axis=-1)
        gub = sd[f"{p}.mlp.experts.gate_up_proj_bias"]
        b1 = np.concatenate([gub[..., 0::2], gub[..., 1::2]], axis=-1)
        trees.append({
            "input_norm": {"scale": sd[f"{p}.input_layernorm.weight"]},
            "post_attn_norm": {
                "scale": sd[f"{p}.post_attention_layernorm.weight"]},
            "attention": {
                "q_proj": {"kernel": t(f"{p}.self_attn.q_proj.weight")
                           .reshape(D, H, dh),
                           "bias": sd[f"{p}.self_attn.q_proj.bias"]
                           .reshape(H, dh)},
                "k_proj": {"kernel": t(f"{p}.self_attn.k_proj.weight")
                           .reshape(D, G, dh),
                           "bias": sd[f"{p}.self_attn.k_proj.bias"]
                           .reshape(G, dh)},
                "v_proj": {"kernel": t(f"{p}.self_attn.v_proj.weight")
                           .reshape(D, G, dh),
                           "bias": sd[f"{p}.self_attn.v_proj.bias"]
                           .reshape(G, dh)},
                "o_proj": {"kernel": t(f"{p}.self_attn.o_proj.weight")
                           .reshape(H, dh, D),
                           "bias": sd[f"{p}.self_attn.o_proj.bias"]},
                "sink": sd[f"{p}.self_attn.sinks"],
            },
            "moe": {
                "router": {"kernel": t(f"{p}.mlp.router.weight"),
                           "bias": sd[f"{p}.mlp.router.bias"]},
                "w1": w1, "b1": b1,
                "w2": sd[f"{p}.mlp.experts.down_proj"],
                "b2": sd[f"{p}.mlp.experts.down_proj_bias"],
            },
        })
    params = _pack_layers(trees, cfg)
    params["embedding"] = sd["model.embed_tokens.weight"]
    params["final_norm"] = {"scale": sd["model.norm.weight"]}
    params["lm_head"] = {"kernel": np.transpose(sd["lm_head.weight"])}
    return params


def import_hf_model(path_or_model) -> Tuple[GPTConfig, Dict[str, Any]]:
    """Any supported HF causal LM → (GPTConfig, params). Dispatches on
    config.model_type; llama/mistral/qwen2/qwen3-style handled by hf_llama."""
    if isinstance(path_or_model, str):
        from transformers import AutoModelForCausalLM

        hf = AutoModelForCausalLM.from_pretrained(path_or_model)
    else:
        hf = path_or_model
    c = hf.config
    sd = {k: v.detach().to("cpu").float().numpy() for k, v in hf.state_dict().items()}
    mt = c.model_type

    if mt == "mamba2":
        cfg = config_from_hf_mamba2(c)
        return cfg, params_from_hf_mamba2(sd, cfg)
    if mt in ("gemma3_text", "gemma3"):
        tc = getattr(c, "text_config", c)
        if mt == "gemma3":  # multimodal wrapper: take the text tower
            sd = {k.removeprefix("language_model."): v for k, v in sd.items()
                  if k.startswith("language_model.") or k.startswith("model.")}
        cfg = config_from_hf_gemma3(tc)
        return cfg, params_from_hf_gemma3(sd, cfg)
    if mt == "gpt_oss":
        cfg = config_from_hf_gpt_oss(c)
        return cfg, params_from_hf_gpt_oss(sd, cfg)
    if mt == "deepseek_v3":
        cfg = config_from_hf_deepseek(c)
        return cfg, params_from_hf_deepseek(
            sd, cfg, interleaved_rope=getattr(c, "rope_interleave", True))
    if mt == "mixtral":
        cfg = config_from_hf_mixtral(c)
        moe = _moe_subtree(
            sd, cfg, "model.layers.{i}.block_sparse_moe.gate.weight",
            "model.layers.{i}.block_sparse_moe.experts.{e}.{w}.weight")
        return cfg, params_from_hf_state(sd, cfg, moe=moe)
    if mt == "qwen3_moe":
        cfg = config_from_hf_qwen3_moe(c)
        moe = _moe_subtree(
            sd, cfg, "model.layers.{i}.mlp.gate.weight",
            "model.layers.{i}.mlp.experts.{e}.{w}.weight",
            names=("gate_proj", "up_proj", "down_proj"))
        return cfg, params_from_hf_state(sd, cfg, moe=moe)
    if mt == "gemma2":
        cfg = config_from_hf_gemma2(c)
        return cfg, params_from_hf_state(sd, cfg)

    cfg = config_from_hf(c)
    if mt == "phi3":
        sd = _split_phi3_fused(sd, c)
    elif mt == "starcoder2":
        import dataclasses

        cfg = dataclasses.replace(
            cfg, normalization="LayerNorm", gated_linear_unit=False,
            activation="gelu", add_bias_linear=True,
            layernorm_epsilon=c.norm_epsilon,
        )
    elif mt == "nemotron":
        import dataclasses

        cfg = dataclasses.replace(
            cfg, normalization="LayerNorm", layernorm_zero_centered_gamma=True,
            gated_linear_unit=False, activation="squared_relu",
            rotary_percent=getattr(c, "partial_rotary_factor", 0.5),
            layernorm_epsilon=c.norm_eps,
        )
    return cfg, params_from_hf_state(sd, cfg)


# ---------------------------------------------------------------------------
# Mixtral / Qwen3-MoE (routed experts) and Gemma2
# ---------------------------------------------------------------------------


def _moe_subtree(sd, cfg, gate_key, expert_fmt, names=("w1", "w3", "w2")):
    """Routed-experts params with a leading layer axis:
    router [L, D, E], w1 [L, E, D, 2F] (gate|up), w2 [L, E, F, D]."""
    L, E = cfg.num_layers, cfg.num_moe_experts
    gate_n, up_n, down_n = names

    def t(k):
        return np.ascontiguousarray(np.transpose(sd[k]))

    def layer(i):
        w1 = np.stack([
            np.concatenate(
                [t(expert_fmt.format(i=i, e=e, w=gate_n)),
                 t(expert_fmt.format(i=i, e=e, w=up_n))], axis=1)
            for e in range(E)])                       # [E, D, 2F]
        w2 = np.stack([t(expert_fmt.format(i=i, e=e, w=down_n))
                       for e in range(E)])            # [E, F, D]
        return w1, w2

    per = [layer(i) for i in range(L)]
    return {
        "router": {"kernel": np.stack(
            [t(gate_key.format(i=i)) for i in range(L)])},
        "w1": np.stack([p[0] for p in per]),
        "w2": np.stack([p[1] for p in per]),
    }


def config_from_hf_mixtral(c) -> GPTConfig:
    from nemo_tpu.interop.hf_llama import config_from_hf

    # HF Mixtral routes softmax-all → top-k → renormalize, which equals
    # softmax over the top-k logits (our default routing branch)
    return dataclasses.replace(
        config_from_hf(c),
        num_moe_experts=c.num_local_experts,
        moe_router_topk=c.num_experts_per_tok,
        moe_dispatch="dense",  # exact combine for import-parity
        window_size=getattr(c, "sliding_window", None),
    )


def config_from_hf_qwen3_moe(c) -> GPTConfig:
    from nemo_tpu.interop.hf_llama import config_from_hf

    # HF: softmax-all → top-k → renormalize iff norm_topk_prob. Renormalized
    # == softmax over top-k logits (our default branch); unrenormalized ==
    # our pre_softmax branch.
    return dataclasses.replace(
        config_from_hf(c),
        num_moe_experts=c.num_experts,
        moe_router_topk=c.num_experts_per_tok,
        moe_ffn_hidden_size=c.moe_intermediate_size,
        moe_dispatch="dense",  # exact combine for import-parity
        moe_router_pre_softmax=not bool(getattr(c, "norm_topk_prob", False)),
    )


def config_from_hf_gemma2(c) -> GPTConfig:
    from nemo_tpu.interop.hf_llama import config_from_hf

    return dataclasses.replace(
        config_from_hf(c),
        kv_channels=c.head_dim,
        activation="gelu",
        sandwich_norms=True,
        layernorm_zero_centered_gamma=True,
        embedding_multiplier=float(c.hidden_size) ** 0.5,
        attention_multiplier=float(c.query_pre_attn_scalar) ** -0.5,
        logit_softcapping=c.final_logit_softcapping,
        attn_logit_softcapping=c.attn_logit_softcapping,
        # HF gemma2: even layer indices slide, odd are global
        window_pattern=(c.sliding_window, None),
    )
