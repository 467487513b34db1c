"""Qwen2-VL (M-RoPE) and MLlama (gated cross-attention) model families
(reference nemo/collections/vlm/qwen2vl, vlm/mllama)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from nemo_tpu.models.llm.config import GPTConfig, tiny_test
from nemo_tpu.models.llm.gpt import GPTModel
from nemo_tpu.models.vision.vit import ViTConfig
from nemo_tpu.models.vlm.mllama import MLlamaConfig, MLlamaModel
from nemo_tpu.models.vlm.qwen2vl import (
    PatchMerger, Qwen2VLConfig, Qwen2VLModel, get_mrope_positions,
    qwen2vl_2b,
)


def test_mrope_positions_algorithm():
    """Hand-checked example: text(2) + image grid (1,2,2) + text(1)."""
    IMG = 9
    tokens = np.array([[5, 6, IMG, IMG, IMG, IMG, 7]])
    pos = get_mrope_positions(tokens, IMG, [[(1, 2, 2)]])
    # text: 0,1 on all axes; image at offset 2: t=2, h=2+{0,0,1,1},
    # w=2+{0,1,0,1}; text resumes at 2+max(1,2,2)=4
    np.testing.assert_array_equal(pos[0, :, 0], [0, 1, 2, 2, 2, 2, 4])
    np.testing.assert_array_equal(pos[0, :, 1], [0, 1, 2, 2, 3, 3, 4])
    np.testing.assert_array_equal(pos[0, :, 2], [0, 1, 2, 3, 2, 3, 4])


def test_mrope_equals_rope_on_text():
    """Text-only: identical ids on all 3 axes ⇒ M-RoPE logits == 1-D RoPE
    logits with the same weights."""
    base = tiny_test(num_layers=2, hidden_size=64, ffn_hidden_size=128,
                     num_attention_heads=4, vocab_size=64, seq_length=16)
    import dataclasses
    mcfg = dataclasses.replace(base, mrope_sections=(4, 2, 2))
    assert sum(mcfg.mrope_sections) == mcfg.head_dim // 2
    rng = np.random.RandomState(0)
    tokens = jnp.asarray(rng.randint(0, 64, (2, 16)), jnp.int32)

    m_rope = GPTModel(base)
    params = m_rope.init(jax.random.PRNGKey(0), tokens)["params"]
    ref = m_rope.apply({"params": params}, tokens)

    m_mrope = GPTModel(mcfg)
    pos3 = jnp.broadcast_to(jnp.arange(16)[None, :, None], (2, 16, 3))
    out = m_mrope.apply({"params": params}, tokens,
                        positions=pos3.astype(jnp.int32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def _tiny_qwen2vl():
    llm = tiny_test(num_layers=2, hidden_size=64, ffn_hidden_size=128,
                    num_attention_heads=4, vocab_size=64, seq_length=64)
    import dataclasses
    llm = dataclasses.replace(llm, mrope_sections=(4, 2, 2))
    vision = ViTConfig(image_size=16, patch_size=4, hidden_size=32,
                       num_layers=2, num_heads=2, ffn_hidden_size=64,
                       use_cls_token=False)
    return Qwen2VLConfig(vision=vision, llm=llm, image_token_id=63,
                         spatial_merge_size=2)


def test_qwen2vl_trains():
    cfg = _tiny_qwen2vl()
    model = Qwen2VLModel(cfg)
    rng = np.random.RandomState(0)
    B = 2
    n_img = (16 // 4) ** 2 // 4  # merged vision tokens per image = 4
    toks = rng.randint(1, 60, (B, 12))
    toks[:, 3:3 + n_img] = 63  # placeholder span
    tokens = jnp.asarray(toks, jnp.int32)
    pos = jnp.asarray(get_mrope_positions(
        np.asarray(tokens), 63, [[(1, 2, 2)]] * B))
    images = jnp.asarray(rng.rand(B, 16, 16, 3), jnp.float32)
    mask = jnp.ones(tokens.shape, jnp.float32)

    params = model.init(jax.random.PRNGKey(0), images, tokens, pos)["params"]
    opt = optax.adam(3e-3)
    ost = opt.init(params)

    @jax.jit
    def step(params, ost):
        l, g = jax.value_and_grad(lambda p: model.apply(
            {"params": p}, images, tokens, pos, mask,
            method=Qwen2VLModel.loss, train=False))(params)
        u, ost = opt.update(g, ost)
        return optax.apply_updates(params, u), ost, l

    first = last = None
    for i in range(25):
        params, ost, l = step(params, ost)
        if i == 0:
            first = float(l)
        last = float(l)
    assert last < first
    # vision contributes: different image → different logits
    l1 = model.apply({"params": params}, images, tokens, pos)
    l2 = model.apply({"params": params}, images * 0.1, tokens, pos)
    assert float(jnp.abs(l1 - l2).max()) > 1e-4


def test_patch_merger_shapes():
    pm = PatchMerger(out_dim=32, merge=2)
    x = jnp.zeros((2, 4, 4, 8))
    params = pm.init(jax.random.PRNGKey(0), x)["params"]
    out = pm.apply({"params": params}, x)
    assert out.shape == (2, 4, 32)


def test_qwen2vl_2b_preset_shape():
    cfg = qwen2vl_2b()
    assert cfg.llm.mrope_sections == (16, 24, 24)
    assert sum(cfg.llm.mrope_sections) == cfg.llm.head_dim // 2


def _tiny_mllama():
    llm = tiny_test(num_layers=3, hidden_size=64, ffn_hidden_size=128,
                    num_attention_heads=4, vocab_size=64, seq_length=16)
    vision = ViTConfig(image_size=16, patch_size=4, hidden_size=32,
                       num_layers=2, num_heads=2, ffn_hidden_size=64)
    return MLlamaConfig(vision=vision, llm=llm, cross_attention_layers=(1,))


def test_mllama_zero_gates_match_text_llm_then_train():
    cfg = _tiny_mllama()
    model = MLlamaModel(cfg)
    rng = np.random.RandomState(0)
    tokens = jnp.asarray(rng.randint(0, 64, (2, 12)), jnp.int32)
    images = jnp.asarray(rng.rand(2, 16, 16, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), images, tokens)["params"]

    # zero gates: vision cannot influence the output at step 0
    l1 = model.apply({"params": params}, images, tokens)
    l2 = model.apply({"params": params}, images * 0.0, tokens)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-6)

    mask = jnp.ones(tokens.shape, jnp.float32)
    opt = optax.adam(3e-3)
    ost = opt.init(params)

    @jax.jit
    def step(params, ost):
        l, g = jax.value_and_grad(lambda p: model.apply(
            {"params": p}, images, tokens, mask, method=MLlamaModel.loss,
            train=False))(params)
        u, ost = opt.update(g, ost)
        return optax.apply_updates(params, u), ost, l

    first = last = None
    for i in range(30):
        params, ost, l = step(params, ost)
        if i == 0:
            first = float(l)
        last = float(l)
    assert last < first
    # gates opened: vision now matters
    g_attn = float(params["xattn1"]["attn_gate"][0])
    assert abs(g_attn) > 1e-4
    l1 = model.apply({"params": params}, images, tokens)
    l2 = model.apply({"params": params}, images * 0.0, tokens)
    assert float(jnp.abs(l1 - l2).max()) > 1e-5
