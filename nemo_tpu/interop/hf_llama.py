"""HuggingFace ↔ nemo_tpu weight conversion for llama-family causal LMs.

Reference parity: the per-model HF importer/exporter connectors
(`nemo/collections/llm/gpt/model/llama.py` HFLlamaImporter/Exporter,
registered via ConnectorMixin `io/mixin.py:289` for `hf://` paths).

Covers llama/mistral/qwen2-style architectures (RMSNorm, SwiGLU, GQA,
rotate-half RoPE). Handles scan-layer stacking (params carry a leading
'layers' axis).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from nemo_tpu.models.llm.config import GPTConfig


def config_from_hf(hf_cfg) -> GPTConfig:
    """transformers LlamaConfig-like → GPTConfig."""
    rope_scaling = None
    factor = 8.0
    old_ctx = 8192
    rs = getattr(hf_cfg, "rope_scaling", None)
    if rs and rs.get("rope_type", rs.get("type")) == "llama3":
        rope_scaling = "llama3"
        factor = float(rs.get("factor", 8.0))
        old_ctx = int(rs.get("original_max_position_embeddings", 8192))
    return GPTConfig(
        num_layers=hf_cfg.num_hidden_layers,
        hidden_size=hf_cfg.hidden_size,
        ffn_hidden_size=hf_cfg.intermediate_size,
        num_attention_heads=hf_cfg.num_attention_heads,
        num_query_groups=getattr(hf_cfg, "num_key_value_heads", None),
        kv_channels=getattr(hf_cfg, "head_dim", None),
        vocab_size=hf_cfg.vocab_size,
        seq_length=hf_cfg.max_position_embeddings,
        layernorm_epsilon=getattr(hf_cfg, "rms_norm_eps", 1e-5),
        rotary_base=getattr(hf_cfg, "rope_theta", 10000.0),
        rope_scaling=rope_scaling,
        rope_scaling_factor=factor,
        old_context_len=old_ctx,
        add_qkv_bias=bool(getattr(hf_cfg, "attention_bias", False)),
        qk_layernorm=getattr(hf_cfg, "model_type", "") in ("qwen3", "qwen3_moe"),
        share_embeddings_and_output_weights=bool(getattr(hf_cfg, "tie_word_embeddings", False)),
        compute_dtype="float32",
    )


def params_from_hf_state(sd: Dict[str, np.ndarray], cfg: GPTConfig,
                         moe: Dict[str, Any] = None) -> Dict[str, Any]:
    """HF llama state dict (numpy) → our flax param tree (scan-layer layout).

    `moe`: pre-built routed-experts subtree (leading layer axis) — replaces
    the dense-MLP mapping for MoE families (mixtral/qwen-moe). Sandwich
    norms (gemma2: pre/post_feedforward_layernorm) are auto-detected."""
    L = cfg.num_layers
    D = cfg.hidden_size
    H = cfg.num_attention_heads
    G = cfg.n_kv_heads
    dh = cfg.head_dim
    F = cfg.ffn_hidden_size

    def t(k):
        return np.ascontiguousarray(np.transpose(sd[k]))

    def stack(fmt, conv):
        return np.stack([conv(fmt.format(i=i)) for i in range(L)])

    attention = {
        "q_proj": {"kernel": stack("model.layers.{i}.self_attn.q_proj.weight",
                                   lambda k: t(k).reshape(D, H, dh))},
        "k_proj": {"kernel": stack("model.layers.{i}.self_attn.k_proj.weight",
                                   lambda k: t(k).reshape(D, G, dh))},
        "v_proj": {"kernel": stack("model.layers.{i}.self_attn.v_proj.weight",
                                   lambda k: t(k).reshape(D, G, dh))},
        "o_proj": {"kernel": stack("model.layers.{i}.self_attn.o_proj.weight",
                                   lambda k: np.transpose(sd[k]).reshape(H, dh, D))},
    }
    if cfg.add_qkv_bias or cfg.add_bias_linear:
        attention["q_proj"]["bias"] = stack(
            "model.layers.{i}.self_attn.q_proj.bias", lambda k: sd[k].reshape(H, dh))
        attention["k_proj"]["bias"] = stack(
            "model.layers.{i}.self_attn.k_proj.bias", lambda k: sd[k].reshape(G, dh))
        attention["v_proj"]["bias"] = stack(
            "model.layers.{i}.self_attn.v_proj.bias", lambda k: sd[k].reshape(G, dh))

    if cfg.add_bias_linear:
        attention["o_proj"]["bias"] = stack(
            "model.layers.{i}.self_attn.o_proj.bias", lambda k: sd[k])
    if "model.layers.0.self_attn.q_norm.weight" in sd:  # qwen3-style qk-norm
        attention["q_norm"] = {"scale": stack(
            "model.layers.{i}.self_attn.q_norm.weight", lambda k: sd[k])}
        attention["k_norm"] = {"scale": stack(
            "model.layers.{i}.self_attn.k_norm.weight", lambda k: sd[k])}

    if moe is None:
        # MLP: gated (gate_proj+up_proj fused into fc1) or plain (up_proj/c_fc)
        up_key = ("model.layers.{i}.mlp.up_proj.weight"
                  if "model.layers.0.mlp.up_proj.weight" in sd
                  else "model.layers.{i}.mlp.c_fc.weight")
        down_key = ("model.layers.{i}.mlp.down_proj.weight"
                    if "model.layers.0.mlp.down_proj.weight" in sd
                    else "model.layers.{i}.mlp.c_proj.weight")

        def fc1(i):
            if cfg.gated_linear_unit:
                gate = np.transpose(sd[f"model.layers.{i}.mlp.gate_proj.weight"])  # [D, F]
                up = np.transpose(sd[up_key.format(i=i)])
                return np.concatenate([gate, up], axis=1)  # [D, 2F]
            return np.transpose(sd[up_key.format(i=i)])

        mlp = {
            "fc1": {"kernel": np.stack([fc1(i) for i in range(L)])},
            "fc2": {"kernel": stack(down_key, t)},
        }
        if cfg.add_bias_linear:
            mlp["fc1"]["bias"] = stack(up_key.replace(".weight", ".bias"), lambda k: sd[k])
            mlp["fc2"]["bias"] = stack(down_key.replace(".weight", ".bias"), lambda k: sd[k])

    def norm(prefix):
        out = {"scale": stack(prefix + ".weight", lambda k: sd[k])}
        if prefix.format(i=0) + ".bias" in sd:
            out["bias"] = stack(prefix + ".bias", lambda k: sd[k])
        return out

    if "model.layers.0.pre_feedforward_layernorm.weight" in sd:
        # gemma2/3 sandwich norms: post_attention_layernorm norms the attn
        # OUTPUT pre-residual; pre_feedforward is the true post-attn norm
        layers = {
            "input_norm": norm("model.layers.{i}.input_layernorm"),
            "attn_out_norm": norm("model.layers.{i}.post_attention_layernorm"),
            "post_attn_norm": norm("model.layers.{i}.pre_feedforward_layernorm"),
            "mlp_out_norm": norm("model.layers.{i}.post_feedforward_layernorm"),
            "attention": attention,
        }
    else:
        layers = {
            "input_norm": norm("model.layers.{i}.input_layernorm"),
            "post_attn_norm": norm("model.layers.{i}.post_attention_layernorm"),
            "attention": attention,
        }
    if moe is not None:
        layers["moe"] = moe
    else:
        layers["mlp"] = mlp
    final_norm = {"scale": sd["model.norm.weight"]}
    if "model.norm.bias" in sd:
        final_norm["bias"] = sd["model.norm.bias"]
    params = {
        "embedding": sd["model.embed_tokens.weight"],
        "layers": layers,
        "final_norm": final_norm,
    }
    if not cfg.share_embeddings_and_output_weights:
        lm = sd.get("lm_head.weight", sd["model.embed_tokens.weight"])
        params["lm_head"] = {"kernel": np.transpose(lm)}
    if not cfg.scan_layers:
        params = _unstack_layers(params, L)
    else:
        from nemo_tpu.models.llm.gpt import hetero_period

        P = hetero_period(cfg)
        if P > 1 and L % P == 0:
            # pattern-period group scan: GPTModel scans LayerGroup(sub0..P)
            # L/P times — split the stacked [L, ...] leaves by phase
            def phase(tree, j):
                if isinstance(tree, dict):
                    return {k: phase(v, j) for k, v in tree.items()}
                return tree[j::P]

            params["layers"] = {
                f"sub{j}": phase(params["layers"], j) for j in range(P)}
    return params


def _unstack_layers(params, L):
    out = {k: v for k, v in params.items() if k != "layers"}
    for i in range(L):
        out[f"layer{i}"] = _tree_index(params["layers"], i)
    return out


def _tree_index(tree, i):
    if isinstance(tree, dict):
        return {k: _tree_index(v, i) for k, v in tree.items()}
    return tree[i]


def import_hf_llama(path_or_model) -> Tuple[GPTConfig, Dict[str, Any]]:
    """HF checkpoint path / loaded model → (GPTConfig, flax params).

    Reference parity: llm.import_ckpt(model, "hf://...") (api.py:894)."""
    if isinstance(path_or_model, str):
        from transformers import AutoModelForCausalLM

        hf = AutoModelForCausalLM.from_pretrained(path_or_model)
    else:
        hf = path_or_model
    sd = {k: v.detach().to("cpu").float().numpy() for k, v in hf.state_dict().items()}
    cfg = config_from_hf(hf.config)
    return cfg, params_from_hf_state(sd, cfg)


def export_hf_llama_state(params: Dict[str, Any], cfg: GPTConfig) -> Dict[str, np.ndarray]:
    """Our params → HF llama state dict (numpy). Reference parity:
    llm.export_ckpt (api.py:986)."""
    L, D = cfg.num_layers, cfg.hidden_size
    H, G, dh, F = cfg.num_attention_heads, cfg.n_kv_heads, cfg.head_dim, cfg.ffn_hidden_size
    p = params
    if "layers" not in p:  # unrolled → stack
        stacked = {}
        first = p["layer0"]

        def restack(path):
            node = [p[f"layer{i}"] for i in range(L)]
            for key in path:
                node = [n[key] for n in node]
            return np.stack([np.asarray(n) for n in node])

        layers = None
        raise NotImplementedError("export expects scan-layer params")
    layers = p["layers"]
    sd: Dict[str, np.ndarray] = {
        "model.embed_tokens.weight": np.asarray(p["embedding"]),
        "model.norm.weight": np.asarray(p["final_norm"]["scale"]),
    }
    if "lm_head" in p:
        sd["lm_head.weight"] = np.transpose(np.asarray(p["lm_head"]["kernel"]))
    for i in range(L):
        pre = f"model.layers.{i}"
        sd[f"{pre}.input_layernorm.weight"] = np.asarray(layers["input_norm"]["scale"][i])
        sd[f"{pre}.post_attention_layernorm.weight"] = np.asarray(
            layers["post_attn_norm"]["scale"][i])
        att = layers["attention"]
        sd[f"{pre}.self_attn.q_proj.weight"] = np.transpose(
            np.asarray(att["q_proj"]["kernel"][i]).reshape(D, H * dh))
        sd[f"{pre}.self_attn.k_proj.weight"] = np.transpose(
            np.asarray(att["k_proj"]["kernel"][i]).reshape(D, G * dh))
        sd[f"{pre}.self_attn.v_proj.weight"] = np.transpose(
            np.asarray(att["v_proj"]["kernel"][i]).reshape(D, G * dh))
        sd[f"{pre}.self_attn.o_proj.weight"] = np.transpose(
            np.asarray(att["o_proj"]["kernel"][i]).reshape(H * dh, D))
        fc1 = np.asarray(layers["mlp"]["fc1"]["kernel"][i])  # [D, 2F]
        sd[f"{pre}.mlp.gate_proj.weight"] = np.transpose(fc1[:, :F])
        sd[f"{pre}.mlp.up_proj.weight"] = np.transpose(fc1[:, F:])
        sd[f"{pre}.mlp.down_proj.weight"] = np.transpose(
            np.asarray(layers["mlp"]["fc2"]["kernel"][i]))
    return sd
