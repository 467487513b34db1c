"""AVLM: audio-visual language model (joint speech + image + text).

Reference parity: `nemo/collections/avlm/` (AVLM models combining the vlm
image path with a speech encoder into one LLM context). Composes the same
towers used by NeVA (ViT + projector) and SALM (conformer-style audio
encoder + frame-stacking adapter): the LLM consumes
[image tokens | audio tokens | text tokens] and trains with CE on the text
span only.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nemo_tpu.core.config import ConfigDict
from nemo_tpu.models.llm.config import GPTConfig
from nemo_tpu.models.llm.gpt import GPTModel
from nemo_tpu.models.vision.vit import ViT, ViTConfig


@dataclasses.dataclass(frozen=True)
class AVLMConfig:
    llm: GPTConfig = dataclasses.field(default_factory=GPTConfig)
    vision: ViTConfig = dataclasses.field(default_factory=ViTConfig)
    audio_encoder: Any = None  # conformer/conv encoder config dict
    mel_features: int = 80
    frame_stacking: int = 4
    freeze_vision: bool = True
    drop_cls_token: bool = True


class AVLMModel(nn.Module):
    cfg: AVLMConfig

    def setup(self):
        from nemo_tpu.models.asr.ctc_models import build_encoder

        self.vision = ViT(self.cfg.vision, name="vision")
        self.audio_encoder = build_encoder(
            ConfigDict(dict(self.cfg.audio_encoder)), self.cfg.mel_features,
            name="audio_encoder")
        self.llm = GPTModel(self.cfg.llm, name="llm")
        H = self.cfg.llm.hidden_size
        self.img_proj1 = nn.Dense(H, name="img_proj1")
        self.img_proj2 = nn.Dense(H, name="img_proj2")
        self.audio_proj = nn.Dense(H, name="audio_proj")

    def encode_images(self, images, *, train=False):
        feats = self.vision(images, train=train)
        if self.cfg.freeze_vision:
            feats = jax.lax.stop_gradient(feats)
        if self.cfg.vision.use_cls_token and self.cfg.drop_cls_token:
            feats = feats[:, 1:]
        x = self.img_proj1(feats.astype(jnp.float32))
        return self.img_proj2(nn.gelu(x, approximate=True))

    def encode_audio(self, feats, feat_len, *, train=False):
        enc, enc_len = self.audio_encoder(feats, feat_len, train=train)
        enc = jnp.transpose(enc, (0, 2, 1))
        k = self.cfg.frame_stacking
        B, T, d = enc.shape
        Ts = (T // k) * k
        stacked = enc[:, :Ts].reshape(B, Ts // k, k * d)
        return self.audio_proj(stacked), enc_len // k

    def __call__(self, images, audio_feats, audio_len, tokens, *, train=False):
        """[img | audio | text] → logits [B, P+Ta+S, V]."""
        img = self.encode_images(images, train=train)
        aud, _ = self.encode_audio(audio_feats, audio_len, train=train)
        txt = self.llm.embed_tokens(tokens)
        x = jnp.concatenate(
            [img.astype(txt.dtype), aud.astype(txt.dtype), txt], axis=1)
        return self.llm(tokens=None, inputs_embeds=x, train=train)

    def loss(self, images, audio_feats, audio_len, tokens, loss_mask,
             *, train=True):
        logits = self(images, audio_feats, audio_len, tokens, train=train)
        S = tokens.shape[1]
        text_logits = logits[:, -S:-1]
        labels = tokens[:, 1:]
        mask = loss_mask[:, 1:]
        lp = jax.nn.log_softmax(text_logits.astype(jnp.float32))
        nll = -jnp.take_along_axis(lp, labels[..., None], -1)[..., 0]
        return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)


def avlm_8b(**kw) -> AVLMConfig:
    """llama3-8B + CLIP-ViT-L/14-336 + fastconformer audio tower (reference
    avlm recipe shape)."""
    from nemo_tpu.models.llm.config import llama3_8b

    d = dict(
        llm=llama3_8b(),
        vision=ViTConfig(image_size=336, patch_size=14, hidden_size=1024,
                         num_layers=24, num_heads=16, ffn_hidden_size=4096),
        audio_encoder={"_target_": "x.ConformerEncoder", "feat_in": 80,
                       "n_layers": 17, "d_model": 512, "n_heads": 8,
                       "subsampling": "dw_striding", "subsampling_factor": 8},
    )
    d.update(kw)
    return AVLMConfig(**d)
