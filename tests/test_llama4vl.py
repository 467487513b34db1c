"""Llama-4 omni VLM: pixel-shuffle adapter + placeholder splice
(reference nemo/collections/vlm llama4 / HF Llama4ForConditionalGeneration
Llama4VisionPixelShuffleMLP)."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from nemo_tpu.models.llm.config import tiny_test
from nemo_tpu.models.vision.vit import ViTConfig
from nemo_tpu.models.vlm.llama4vl import (
    Llama4VLConfig, Llama4VLModel, llama4vl_scout, pixel_shuffle,
)


def test_pixel_shuffle_shape_and_bijection():
    B, side, C = 2, 4, 8
    x = jnp.asarray(np.arange(B * side * side * C, dtype=np.float32)
                    .reshape(B, side * side, C))
    out = pixel_shuffle(x, 0.5)
    # 4x fewer tokens, 4x more channels, same elements (a pure relayout)
    assert out.shape == (B, 4, 32)
    assert set(np.asarray(out).ravel().tolist()) \
        == set(np.asarray(x).ravel().tolist())
    # each output token folds a spatial neighborhood: token 0 must contain
    # patch (0,0)'s channel 0
    assert 0.0 in np.asarray(out)[0, 0].tolist()


def _tiny():
    llm = tiny_test(num_layers=2, hidden_size=64, ffn_hidden_size=128,
                    num_attention_heads=4, vocab_size=64)
    vision = ViTConfig(image_size=16, patch_size=4, hidden_size=32,
                       num_layers=2, num_heads=2, ffn_hidden_size=64,
                       use_cls_token=False)
    return Llama4VLConfig(llm=llm, vision=vision, image_token_id=63,
                          projector_input_dim=48)


def test_llama4vl_trains_and_vision_matters():
    cfg = _tiny()
    assert cfg.tokens_per_image == 4  # 16 patches · 0.25
    model = Llama4VLModel(cfg)
    rng = np.random.RandomState(0)
    B, n = 2, cfg.tokens_per_image
    toks = rng.randint(1, 60, (B, 12))
    toks[:, 2:2 + n] = 63
    tokens = jnp.asarray(toks, jnp.int32)
    images = jnp.asarray(rng.rand(B, 16, 16, 3), jnp.float32)
    mask = jnp.ones(tokens.shape, jnp.float32)

    params = model.init(jax.random.PRNGKey(0), images, tokens)["params"]
    opt = optax.adam(3e-3)
    ost = opt.init(params)

    @jax.jit
    def step(params, ost):
        l, g = jax.value_and_grad(lambda p: model.apply(
            {"params": p}, images, tokens, mask,
            method=Llama4VLModel.loss, train=False))(params)
        u, ost = opt.update(g, ost)
        return optax.apply_updates(params, u), ost, l

    first = last = None
    for i in range(25):
        params, ost, l = step(params, ost)
        if i == 0:
            first = float(l)
        last = float(l)
    assert last < first
    l1 = model.apply({"params": params}, images, tokens)
    l2 = model.apply({"params": params}, images * 0.1, tokens)
    assert float(jnp.abs(l1 - l2).max()) > 1e-4


def test_llama4vl_scout_preset():
    cfg = llama4vl_scout()
    assert cfg.tokens_per_image == 144  # 576 patches · 0.25
    assert cfg.vision.hidden_size == 1408 and cfg.vision.num_layers == 34
    assert cfg.projector_input_dim == 4096
    assert cfg.llm.num_moe_experts == 16  # scout LLM is the MoE preset
