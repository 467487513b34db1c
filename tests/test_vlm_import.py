"""VLM HF-importer parity: tiny-random transformers models → import →
logits/feature parity (reference HFLlavaImporter,
vlm/neva/model/llava.py:92; CLIP connector via lightning/io/mixin.py:330)."""

import numpy as np
import pytest

import torch

import jax
import jax.numpy as jnp

from nemo_tpu.interop.vlm_import import (
    import_hf_clip,
    import_hf_llava,
    vit_config_from_hf_clip_vision,
    vit_params_from_hf_clip_vision,
)


def _tiny_vision_cfg(**kw):
    from transformers import CLIPVisionConfig

    d = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=3,
             num_attention_heads=2, image_size=28, patch_size=14,
             projection_dim=16)
    d.update(kw)
    return CLIPVisionConfig(**d)


def test_clip_vision_tower_parity():
    """CLIPVisionModel hidden states == our ViT in HF-compat mode."""
    from transformers import CLIPVisionModel

    torch.manual_seed(0)
    hf = CLIPVisionModel(_tiny_vision_cfg()).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}

    from nemo_tpu.models.vision.vit import ViT

    cfg = vit_config_from_hf_clip_vision(hf.config)
    vit = ViT(cfg)
    params = vit_params_from_hf_clip_vision(sd, cfg)
    imgs = np.random.RandomState(0).randn(2, 28, 28, 3).astype(np.float32)
    with torch.no_grad():
        # HF wants NCHW; last_hidden_state excludes post_layernorm
        out = hf(torch.tensor(imgs.transpose(0, 3, 1, 2)))
    ours = np.asarray(vit.apply({"params": params}, jnp.asarray(imgs)))
    ref = hf.vision_model.post_layernorm(out.last_hidden_state).detach().numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_llava_import_logits_parity():
    """Tiny-random LlavaForConditionalGeneration → NevaModel: same logits
    on a prompt containing image placeholders."""
    from transformers import (
        CLIPVisionConfig, LlamaConfig, LlavaConfig,
        LlavaForConditionalGeneration,
    )

    torch.manual_seed(1)
    vc = _tiny_vision_cfg()
    tc = LlamaConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                     num_hidden_layers=2, num_attention_heads=4,
                     num_key_value_heads=2, max_position_embeddings=128)
    cfg = LlavaConfig(vision_config=vc, text_config=tc, image_token_index=99,
                      vision_feature_layer=-2,
                      vision_feature_select_strategy="default",
                      projector_hidden_act="gelu")
    hf = LlavaForConditionalGeneration(cfg).eval()

    ncfg, params = import_hf_llava(hf)
    assert ncfg.image_token_id == 99
    assert ncfg.vision.drop_last_layers == 1 and not ncfg.vision.final_layernorm

    from nemo_tpu.models.vlm.neva import NevaModel

    model = NevaModel(ncfg)
    rng = np.random.RandomState(2)
    imgs = rng.randn(1, 28, 28, 3).astype(np.float32)
    P = (28 // 14) ** 2  # patch tokens after dropping CLS
    toks = rng.randint(1, 90, (1, 12)).astype(np.int64)
    toks[0, 2:2 + P] = 99  # placeholder run inside the prompt

    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(toks),
                 pixel_values=torch.tensor(imgs.transpose(0, 3, 1, 2)),
                 attention_mask=torch.ones_like(torch.tensor(toks))).logits
    ours = model.apply({"params": params}, jnp.asarray(imgs),
                       jnp.asarray(toks.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               atol=5e-4, rtol=2e-3)


def test_clip_import_embedding_parity():
    """Tiny-random CLIPModel → our CLIPModel: identical normalized image
    and text embeddings + contrastive logits."""
    from transformers import CLIPConfig, CLIPModel as HFCLIP, CLIPTextConfig

    torch.manual_seed(3)
    tc = CLIPTextConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                        num_hidden_layers=2, num_attention_heads=2,
                        max_position_embeddings=32, eos_token_id=63)
    cfg = CLIPConfig(text_config=tc.to_dict(),
                     vision_config=_tiny_vision_cfg().to_dict(),
                     projection_dim=16)
    hf = HFCLIP(cfg).eval()

    ocfg, params = import_hf_clip(hf)

    from nemo_tpu.models.vlm.clip import CLIPModel

    model = CLIPModel(ocfg)
    rng = np.random.RandomState(4)
    imgs = rng.randn(2, 28, 28, 3).astype(np.float32)
    toks = rng.randint(1, 62, (2, 10)).astype(np.int64)
    toks[:, -1] = 63  # EOS — HF pools at the eos position
    lens = np.full(2, 10, np.int32)

    with torch.no_grad():
        out = hf(input_ids=torch.tensor(toks),
                 pixel_values=torch.tensor(imgs.transpose(0, 3, 1, 2)),
                 attention_mask=torch.ones_like(torch.tensor(toks)))
    logits, zi, zt = model.apply(
        {"params": params}, jnp.asarray(imgs),
        jnp.asarray(toks.astype(np.int32)), jnp.asarray(lens))
    ref_zi = out.image_embeds / out.image_embeds.norm(dim=-1, keepdim=True)
    ref_zt = out.text_embeds / out.text_embeds.norm(dim=-1, keepdim=True)
    np.testing.assert_allclose(np.asarray(zi), ref_zi.numpy(), atol=3e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(zt), ref_zt.numpy(), atol=3e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(logits),
                               out.logits_per_image.numpy(),
                               atol=2e-3, rtol=2e-3)
