"""HF → nemo_tpu VLM checkpoint importers.

Reference parity: `nemo/collections/vlm/neva/model/llava.py:92`
(HFLlavaImporter: LlavaForConditionalGeneration → NeVA — vision tower,
multimodal projector, language tower) and the CLIP connector family
registered through `nemo/lightning/io/mixin.py:330`.

Layout notes (torch → flax):
- CLIP ViT attention:  {q,k,v}_proj [out,in] → DenseGeneral kernel
  [in, H, dh]; out_proj → DenseGeneral axis=(-2,-1) kernel [H, dh, out].
- patch_embedding Conv2d [D, 3, P, P] (bias-free) → [P, P, 3, D].
- LLaVA consumes vision hidden states from layer `vision_feature_layer`
  (default -2) with no final LayerNorm → ViTConfig(drop_last_layers=1,
  final_layernorm=False); "default" feature-select drops the CLS row
  (NevaConfig.drop_cls_token).
- The language tower reuses the llama-family importer
  (interop/hf_llama.py params_from_hf_state).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import numpy as np

from nemo_tpu.interop.hf_llama import config_from_hf, params_from_hf_state
from nemo_tpu.models.vision.vit import ViTConfig
from nemo_tpu.utils.logging import logging


def _t(w):
    return np.ascontiguousarray(np.transpose(w))


def vit_config_from_hf_clip_vision(vc, *, feature_layer: int = 0) -> ViTConfig:
    """transformers CLIPVisionConfig → ViTConfig in HF-compat mode.

    feature_layer: 0 → full tower + post_layernorm; negative (LLaVA's
    vision_feature_layer, e.g. -2) → stop |feature_layer|-1 blocks early,
    no final LayerNorm."""
    drop = -feature_layer - 1 if feature_layer < 0 else 0
    return ViTConfig(
        image_size=vc.image_size,
        patch_size=vc.patch_size,
        hidden_size=vc.hidden_size,
        num_layers=vc.num_hidden_layers,
        num_heads=vc.num_attention_heads,
        ffn_hidden_size=vc.intermediate_size,
        layernorm_epsilon=getattr(vc, "layer_norm_eps", 1e-5),
        use_cls_token=True,
        pre_layernorm=True,
        hidden_act={"quick_gelu": "quick_gelu", "gelu": "gelu_exact",
                    "gelu_pytorch_tanh": "gelu"}.get(vc.hidden_act, "quick_gelu"),
        drop_last_layers=drop,
        final_layernorm=feature_layer == 0,
        patch_bias=False,
    )


def vit_params_from_hf_clip_vision(sd: Dict[str, np.ndarray], cfg: ViTConfig,
                                   prefix: str = "vision_model.") -> Dict[str, Any]:
    """CLIPVisionTransformer state dict → our ViT param tree."""
    H = cfg.num_heads
    dh = cfg.hidden_size // H
    D = cfg.hidden_size
    p = {}
    emb = prefix + "embeddings."
    if cfg.use_cls_token:
        p["cls_token"] = sd[emb + "class_embedding"].reshape(1, 1, D)
    p["patch_embed"] = {
        "kernel": np.transpose(sd[emb + "patch_embedding.weight"], (2, 3, 1, 0))}
    if cfg.patch_bias:  # SigLIP's patch conv carries a bias; CLIP's doesn't
        p["patch_embed"]["bias"] = sd[emb + "patch_embedding.bias"]
    p["pos_embedding"] = sd[emb + "position_embedding.weight"][None]
    if cfg.pre_layernorm:
        ln = sd.get(prefix + "pre_layrnorm.weight")  # HF's typo'd name
        p["ln_pre"] = {"scale": ln, "bias": sd[prefix + "pre_layrnorm.bias"]}
    for i in range(cfg.num_layers - cfg.drop_last_layers):
        t = f"{prefix}encoder.layers.{i}."
        blk = {
            "ln1": {"scale": sd[t + "layer_norm1.weight"],
                    "bias": sd[t + "layer_norm1.bias"]},
            "ln2": {"scale": sd[t + "layer_norm2.weight"],
                    "bias": sd[t + "layer_norm2.bias"]},
            "fc1": {"kernel": _t(sd[t + "mlp.fc1.weight"]),
                    "bias": sd[t + "mlp.fc1.bias"]},
            "fc2": {"kernel": _t(sd[t + "mlp.fc2.weight"]),
                    "bias": sd[t + "mlp.fc2.bias"]},
        }
        for name in ("q", "k", "v"):
            blk[name] = {
                "kernel": _t(sd[t + f"self_attn.{name}_proj.weight"]).reshape(D, H, dh),
                "bias": sd[t + f"self_attn.{name}_proj.bias"].reshape(H, dh),
            }
        blk["o"] = {
            "kernel": _t(sd[t + "self_attn.out_proj.weight"]).reshape(H, dh, D),
            "bias": sd[t + "self_attn.out_proj.bias"],
        }
        p[f"block{i}"] = blk
    if cfg.final_layernorm:
        p["ln_final"] = {"scale": sd[prefix + "post_layernorm.weight"],
                         "bias": sd[prefix + "post_layernorm.bias"]}
    return p


def _strip(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def _normalize_llava_sd(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Accept both pre- and post-4.52 transformers key layouts:
    old: language_model.model.*, vision_tower.*, multi_modal_projector.*
    new: model.language_model.*, model.vision_tower.*, model.multi_modal_projector.*
    → canonical {lm.model.*, lm.lm_head.*, vt.*, proj.*}."""
    out = {}
    for k, v in sd.items():
        if k.startswith("model.language_model."):
            out["lm.model." + k[len("model.language_model."):]] = v
        elif k.startswith("language_model.model."):
            out["lm.model." + k[len("language_model.model."):]] = v
        elif k.startswith("language_model.lm_head."):
            out["lm.lm_head." + k[len("language_model.lm_head."):]] = v
        elif k == "lm_head.weight":
            out["lm.lm_head.weight"] = v
        elif k.startswith("model.vision_tower."):
            out["vt." + k[len("model.vision_tower."):]] = v
        elif k.startswith("vision_tower."):
            out["vt." + k[len("vision_tower."):]] = v
        elif k.startswith("model.multi_modal_projector."):
            out["proj." + k[len("model.multi_modal_projector."):]] = v
        elif k.startswith("multi_modal_projector."):
            out["proj." + k[len("multi_modal_projector."):]] = v
    return out


def import_hf_llava(path_or_model) -> Tuple[Any, Dict[str, Any]]:
    """LlavaForConditionalGeneration → (NevaConfig, params) (reference
    HFLlavaImporter, vlm/neva/model/llava.py:92). Placeholder-splice mode:
    image features land at image_token_id positions, like the HF model."""
    from nemo_tpu.models.vlm.neva import NevaConfig

    if isinstance(path_or_model, str):
        from transformers import LlavaForConditionalGeneration

        hf = LlavaForConditionalGeneration.from_pretrained(path_or_model)
    else:
        hf = path_or_model
    c = hf.config
    sd = _normalize_llava_sd(
        {k: v.detach().cpu().float().numpy() for k, v in hf.state_dict().items()})

    vcfg = vit_config_from_hf_clip_vision(
        c.vision_config, feature_layer=getattr(c, "vision_feature_layer", -2))
    lcfg = config_from_hf(c.text_config)
    if getattr(c, "vision_feature_select_strategy", "default") != "default":
        logging.warning("vision_feature_select_strategy=full: keeping CLS")
    ncfg = NevaConfig(
        llm=lcfg, vision=vcfg,
        projector_type=getattr(c, "projector_hidden_act", "gelu") and "mlp2x_gelu",
        drop_cls_token=getattr(c, "vision_feature_select_strategy",
                               "default") == "default",
        image_token_id=int(getattr(c, "image_token_index",
                                   getattr(c, "image_token_id", -1))),
    )
    lm_sd = _strip(sd, "lm.")
    params = {
        "vision": vit_params_from_hf_clip_vision(
            _strip(sd, "vt."), vcfg),
        "llm": params_from_hf_state(lm_sd, lcfg),
        "proj1": {"kernel": _t(sd["proj.linear_1.weight"]),
                  "bias": sd["proj.linear_1.bias"]},
        "proj2": {"kernel": _t(sd["proj.linear_2.weight"]),
                  "bias": sd["proj.linear_2.bias"]},
    }
    logging.info("Imported HF LLaVA checkpoint into NevaModel")
    return ncfg, params


def vit_config_from_hf_siglip(vc) -> ViTConfig:
    """transformers SiglipVisionConfig → ViTConfig (no CLS token, biased
    patch conv, tanh-gelu, full tower + post_layernorm — the gemma3 vision
    tower runs with vision_use_head=False)."""
    return ViTConfig(
        image_size=vc.image_size,
        patch_size=vc.patch_size,
        hidden_size=vc.hidden_size,
        num_layers=vc.num_hidden_layers,
        num_heads=vc.num_attention_heads,
        ffn_hidden_size=vc.intermediate_size,
        layernorm_epsilon=getattr(vc, "layer_norm_eps", 1e-6),
        use_cls_token=False,
        pre_layernorm=False,
        hidden_act={"gelu_pytorch_tanh": "gelu", "gelu": "gelu_exact",
                    "quick_gelu": "quick_gelu"}.get(vc.hidden_act, "gelu"),
        final_layernorm=True,
        patch_bias=True,
    )


def import_hf_gemma3vl(path_or_model) -> Tuple[Any, Dict[str, Any]]:
    """Gemma3ForConditionalGeneration → (Gemma3VLConfig, params): SigLIP
    tower + avg-pool/RMSNorm/linear projector + gemma3 text tower (the
    text mapping reuses interop/hf_models.py params_from_hf_gemma3)."""
    import math

    from nemo_tpu.interop.hf_models import (
        config_from_hf_gemma3, params_from_hf_gemma3)
    from nemo_tpu.models.vlm.gemma3vl import Gemma3VLConfig

    if isinstance(path_or_model, str):
        from transformers import Gemma3ForConditionalGeneration

        hf = Gemma3ForConditionalGeneration.from_pretrained(path_or_model)
    else:
        hf = path_or_model
    c = hf.config
    sd = {k: v.detach().cpu().float().numpy()
          for k, v in hf.state_dict().items()}

    vcfg = vit_config_from_hf_siglip(c.vision_config)
    lcfg = config_from_hf_gemma3(c.text_config)
    side = vcfg.image_size // vcfg.patch_size
    tokens_per_side = int(math.sqrt(int(c.mm_tokens_per_image)))
    cfg = Gemma3VLConfig(
        llm=lcfg, vision=vcfg,
        image_token_id=int(getattr(c, "image_token_id",
                                   getattr(c, "image_token_index", -1))),
        pool=side // tokens_per_side,
        rms_eps=getattr(c.vision_config, "layer_norm_eps", 1e-6),
    )

    # language tower: model.language_model.* → the text-only key layout
    lm_sd = {}
    for k, v in sd.items():
        if k.startswith("model.language_model."):
            lm_sd["model." + k[len("model.language_model."):]] = v
        elif k.startswith("language_model.model."):
            lm_sd["model." + k[len("language_model.model."):]] = v
    params = {
        "vision": vit_params_from_hf_clip_vision(
            sd, vcfg, prefix=next(
                p for p in ("model.vision_tower.vision_model.",
                            "vision_tower.vision_model.")
                if p + "post_layernorm.weight" in sd)),
        "llm": params_from_hf_gemma3(lm_sd, lcfg),
        # mm_input_projection_weight is applied as x @ W — kernel verbatim
        "mm_input_projection": {"kernel": sd[next(
            k for k in ("model.multi_modal_projector.mm_input_projection_weight",
                        "multi_modal_projector.mm_input_projection_weight")
            if k in sd)]},
        "mm_soft_emb_norm": sd[next(
            k for k in ("model.multi_modal_projector.mm_soft_emb_norm.weight",
                        "multi_modal_projector.mm_soft_emb_norm.weight")
            if k in sd)],
    }
    logging.info("Imported HF Gemma3 VLM checkpoint into Gemma3VLModel")
    return cfg, params


def import_hf_clip(path_or_model) -> Tuple[Any, Dict[str, Any]]:
    """transformers CLIPModel → (CLIPConfig, params): vision tower + causal
    text tower (LayerNorm/quick-gelu/learned-absolute GPT) + projections +
    logit_scale."""
    from nemo_tpu.models.llm.config import GPTConfig
    from nemo_tpu.models.vlm.clip import CLIPConfig

    if isinstance(path_or_model, str):
        from transformers import CLIPModel as HFCLIPModel

        hf = HFCLIPModel.from_pretrained(path_or_model)
    else:
        hf = path_or_model
    c = hf.config
    sd = {k: v.detach().cpu().float().numpy() for k, v in hf.state_dict().items()}

    vcfg = vit_config_from_hf_clip_vision(c.vision_config)
    tc = c.text_config
    tcfg = GPTConfig(
        num_layers=tc.num_hidden_layers,
        hidden_size=tc.hidden_size,
        ffn_hidden_size=tc.intermediate_size,
        num_attention_heads=tc.num_attention_heads,
        vocab_size=tc.vocab_size,
        seq_length=tc.max_position_embeddings,
        normalization="LayerNorm",
        gated_linear_unit=False,
        activation={"quick_gelu": "quick_gelu", "gelu": "gelu"}.get(
            tc.hidden_act, "quick_gelu"),
        add_bias_linear=True,
        add_qkv_bias=True,
        position_embedding_type="learned_absolute",
        layernorm_epsilon=getattr(tc, "layer_norm_eps", 1e-5),
        compute_dtype="float32",
        scan_layers=True,
    )
    cfg = CLIPConfig(vision=vcfg, text=tcfg,
                     proj_dim=c.projection_dim,
                     logit_scale_init=float(sd["logit_scale"]))

    # text tower → our GPT tree via the llama importer key contract
    t_sd = {}
    tp = "text_model."
    t_sd["model.embed_tokens.weight"] = sd[tp + "embeddings.token_embedding.weight"]
    for i in range(tcfg.num_layers):
        s = f"{tp}encoder.layers.{i}."
        d = f"model.layers.{i}."
        t_sd[d + "input_layernorm.weight"] = sd[s + "layer_norm1.weight"]
        t_sd[d + "input_layernorm.bias"] = sd[s + "layer_norm1.bias"]
        t_sd[d + "post_attention_layernorm.weight"] = sd[s + "layer_norm2.weight"]
        t_sd[d + "post_attention_layernorm.bias"] = sd[s + "layer_norm2.bias"]
        for n in ("q", "k", "v"):
            t_sd[d + f"self_attn.{n}_proj.weight"] = sd[s + f"self_attn.{n}_proj.weight"]
            t_sd[d + f"self_attn.{n}_proj.bias"] = sd[s + f"self_attn.{n}_proj.bias"]
        t_sd[d + "self_attn.o_proj.weight"] = sd[s + "self_attn.out_proj.weight"]
        t_sd[d + "self_attn.o_proj.bias"] = sd[s + "self_attn.out_proj.bias"]
        t_sd[d + "mlp.up_proj.weight"] = sd[s + "mlp.fc1.weight"]
        t_sd[d + "mlp.up_proj.bias"] = sd[s + "mlp.fc1.bias"]
        t_sd[d + "mlp.down_proj.weight"] = sd[s + "mlp.fc2.weight"]
        t_sd[d + "mlp.down_proj.bias"] = sd[s + "mlp.fc2.bias"]
    t_sd["model.norm.weight"] = sd[tp + "final_layer_norm.weight"]
    t_sd["model.norm.bias"] = sd[tp + "final_layer_norm.bias"]
    t_sd["lm_head.weight"] = np.zeros_like(
        sd[tp + "embeddings.token_embedding.weight"])  # unused (pooling only)

    text_params = params_from_hf_state(t_sd, tcfg)
    text_params["position_embedding"] = sd[
        tp + "embeddings.position_embedding.weight"]
    params = {
        "vision": vit_params_from_hf_clip_vision(sd, cfg.vision),
        "text": text_params,
        "img_proj": {"kernel": _t(sd["visual_projection.weight"])},
        "txt_proj": {"kernel": _t(sd["text_projection.weight"])},
        "logit_scale": np.asarray(sd["logit_scale"], np.float32),
    }
    logging.info("Imported HF CLIP checkpoint into CLIPModel")
    return cfg, params
