"""Gemma3-VL HF importer parity: tiny-random Gemma3ForConditionalGeneration
→ import → logits parity (vision tower + pooled projector + bidirectional
image-span mask + text tower, end to end)."""

import numpy as np

import torch

import jax.numpy as jnp

from nemo_tpu.interop.vlm_import import (
    import_hf_gemma3vl, vit_config_from_hf_siglip,
    vit_params_from_hf_clip_vision,
)


def _tiny_siglip(**kw):
    from transformers import SiglipVisionConfig

    d = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
             num_attention_heads=2, image_size=56, patch_size=14)
    d.update(kw)
    return SiglipVisionConfig(**d)


def test_siglip_tower_parity():
    from transformers import SiglipVisionModel

    torch.manual_seed(0)
    hf = SiglipVisionModel(_tiny_siglip()).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}

    from nemo_tpu.models.vision.vit import ViT

    cfg = vit_config_from_hf_siglip(hf.config)
    assert not cfg.use_cls_token and cfg.patch_bias
    vit = ViT(cfg)
    params = vit_params_from_hf_clip_vision(sd, cfg)
    imgs = np.random.RandomState(0).randn(2, 56, 56, 3).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.tensor(imgs.transpose(0, 3, 1, 2))).last_hidden_state
    ours = np.asarray(vit.apply({"params": params}, jnp.asarray(imgs)))
    np.testing.assert_allclose(ours, ref.numpy(), atol=2e-4, rtol=1e-3)


def test_gemma3vl_import_logits_parity():
    from transformers import (
        Gemma3Config, Gemma3ForConditionalGeneration, Gemma3TextConfig,
    )

    torch.manual_seed(1)
    tc = Gemma3TextConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, max_position_embeddings=128, sliding_window=16,
        layer_types=["sliding_attention", "full_attention"])
    cfg = Gemma3Config(text_config=tc, vision_config=_tiny_siglip(),
                       mm_tokens_per_image=4, image_token_index=99,
                       boi_token_index=97, eoi_token_index=98)
    hf = Gemma3ForConditionalGeneration(cfg).eval()

    ocfg, params = import_hf_gemma3vl(hf)
    assert ocfg.image_token_id == 99
    assert ocfg.pool == 2  # 4 patches/side → 2 tokens/side
    assert ocfg.tokens_per_image == 4

    from nemo_tpu.models.vlm.gemma3vl import Gemma3VLModel

    model = Gemma3VLModel(ocfg)
    rng = np.random.RandomState(2)
    imgs = rng.randn(1, 56, 56, 3).astype(np.float32)
    toks = rng.randint(1, 90, (1, 12)).astype(np.int64)
    toks[0, 3:7] = 99  # one image span (mm_tokens_per_image placeholders)
    ttids = (toks == 99).astype(np.int64)

    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(toks),
                 pixel_values=torch.tensor(imgs.transpose(0, 3, 1, 2)),
                 token_type_ids=torch.tensor(ttids),
                 attention_mask=torch.ones_like(torch.tensor(toks))).logits
    ours = model.apply({"params": params}, jnp.asarray(imgs),
                       jnp.asarray(toks.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               atol=1e-3, rtol=2e-3)
