"""Gemma3-VL: bidirectional image-span attention + pooled SigLIP projector
(reference nemo/collections/vlm gemma3vl / HF Gemma3ForConditionalGeneration:
token_type_ids make image tokens mutually visible, overriding both the
causal mask and the local layers' sliding window)."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp
import optax

from nemo_tpu.models.llm.config import tiny_test
from nemo_tpu.models.llm.gpt import GPTModel
from nemo_tpu.models.vision.vit import ViTConfig
from nemo_tpu.models.vlm.gemma3vl import (
    Gemma3VLConfig, Gemma3VLModel, gemma3vl_4b, image_span_ids,
)


def test_image_span_ids_labelling():
    IMG = 9
    toks = np.array([
        [5, IMG, IMG, 7, IMG, IMG, IMG, 8],
        [IMG, 2, 3, 4, 5, 6, 7, IMG],
    ])
    ids = np.asarray(image_span_ids(jnp.asarray(toks), IMG))
    np.testing.assert_array_equal(ids[0], [0, 1, 1, 0, 2, 2, 2, 0])
    np.testing.assert_array_equal(ids[1], [1, 0, 0, 0, 0, 0, 0, 2])


def _tiny_llm(**kw):
    kw.setdefault("seq_length", 16)
    return tiny_test(num_layers=2, hidden_size=64, ffn_hidden_size=128,
                     num_attention_heads=4, vocab_size=64, **kw)


def test_bidir_ids_make_spans_mutually_visible():
    """Within a bidir span, an EARLIER position must see a LATER token
    (violating causality exactly there); positions before the span stay
    causal-clean; without bidir_ids the model stays fully causal."""
    cfg = _tiny_llm()
    model = GPTModel(cfg)
    rng = np.random.RandomState(0)
    base = rng.randint(0, 64, (1, 12))
    tok_a = jnp.asarray(base, jnp.int32)
    alt = base.copy()
    alt[0, 5] = (alt[0, 5] + 17) % 64  # mutate INSIDE the span
    tok_b = jnp.asarray(alt, jnp.int32)
    span = np.zeros((1, 12), np.int32)
    span[0, 3:7] = 1
    bidir = jnp.asarray(span)

    params = model.init(jax.random.PRNGKey(0), tok_a)["params"]
    la = model.apply({"params": params}, tok_a, bidir_ids=bidir)
    lb = model.apply({"params": params}, tok_b, bidir_ids=bidir)
    # position 3 (span start) now depends on position 5
    assert float(jnp.abs(la[0, 3] - lb[0, 3]).max()) > 1e-5
    # text BEFORE the span is untouched (causality preserved)
    np.testing.assert_allclose(np.asarray(la[0, :3]), np.asarray(lb[0, :3]),
                               atol=1e-6)
    # causal-only: position 3 cannot see position 5
    ca = model.apply({"params": params}, tok_a)
    cb = model.apply({"params": params}, tok_b)
    np.testing.assert_allclose(np.asarray(ca[0, :5]), np.asarray(cb[0, :5]),
                               atol=1e-6)


def test_bidir_overrides_sliding_window():
    """gemma3 local layers: the image span mask overrides the window — a
    span start must see a same-span token beyond the window length."""
    cfg = dataclasses.replace(_tiny_llm(), window_pattern=(2, 2))
    model = GPTModel(cfg)
    rng = np.random.RandomState(1)
    base = rng.randint(0, 64, (1, 12))
    tok_a = jnp.asarray(base, jnp.int32)
    alt = base.copy()
    alt[0, 6] = (alt[0, 6] + 11) % 64  # distance 3 > window 2 from pos 3
    tok_b = jnp.asarray(alt, jnp.int32)
    span = np.zeros((1, 12), np.int32)
    span[0, 3:7] = 1
    bidir = jnp.asarray(span)

    params = model.init(jax.random.PRNGKey(0), tok_a)["params"]
    la = model.apply({"params": params}, tok_a, bidir_ids=bidir)
    lb = model.apply({"params": params}, tok_b, bidir_ids=bidir)
    assert float(jnp.abs(la[0, 3] - lb[0, 3]).max()) > 1e-5
    # without the span the window hides position 6 from position 3
    ca = model.apply({"params": params}, tok_a)
    cb = model.apply({"params": params}, tok_b)
    np.testing.assert_allclose(np.asarray(ca[0, 3]), np.asarray(cb[0, 3]),
                               atol=1e-6)


def _tiny_gemma3vl():
    llm = _tiny_llm(seq_length=64)
    llm = dataclasses.replace(llm, embedding_multiplier=8.0)
    vision = ViTConfig(image_size=16, patch_size=4, hidden_size=32,
                       num_layers=2, num_heads=2, ffn_hidden_size=64,
                       use_cls_token=False)
    return Gemma3VLConfig(llm=llm, vision=vision, image_token_id=63, pool=2)


def test_gemma3vl_projector_token_count():
    cfg = _tiny_gemma3vl()
    assert cfg.tokens_per_image == 4  # (16/4 patches per side / pool 2)^2
    model = Gemma3VLModel(cfg)
    images = jnp.zeros((2, 16, 16, 3), jnp.float32)
    tokens = jnp.zeros((2, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), images, tokens)["params"]
    feats = model.apply({"params": params}, images,
                        method=Gemma3VLModel.encode_images)
    assert feats.shape == (2, 4, 64)


def test_gemma3vl_trains_and_vision_matters():
    cfg = _tiny_gemma3vl()
    model = Gemma3VLModel(cfg)
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
            method=Gemma3VLModel.loss, train=False))(params)
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


def test_vlm_train_module_dispatches_gemma3vl():
    """Recipe-family path: VLMTrainModule builds a Gemma3VLModel from a
    Gemma3VLConfig and runs a jitted step (stage-2 defaults)."""
    from nemo_tpu.models.vlm.train import VLMTrainModule, build_vlm_model
    from nemo_tpu.models.vlm.gemma3vl import Gemma3VLModel

    cfg = _tiny_gemma3vl()
    assert isinstance(build_vlm_model(cfg), Gemma3VLModel)
    tm = VLMTrainModule(cfg, image_size=16, freeze=("vision",))
    state = tm.init_state()
    rng = np.random.RandomState(3)
    n = cfg.tokens_per_image
    toks = rng.randint(1, 60, (2, 12))
    toks[:, 2:2 + n] = 63
    batch = {"images": jnp.asarray(rng.rand(2, 16, 16, 3), jnp.float32),
             "tokens": jnp.asarray(toks, jnp.int32),
             "loss_mask": jnp.ones((2, 12), jnp.float32)}
    state, m1 = tm.train_step(state, batch)
    state, m2 = tm.train_step(state, batch)
    assert np.isfinite(float(m2["loss"]))


def test_gemma3vl_4b_preset():
    cfg = gemma3vl_4b()
    assert cfg.tokens_per_image == 256  # 896/14=64 patches/side, pool 4
    assert cfg.vision.hidden_size == 1152 and cfg.vision.num_layers == 27
    assert cfg.llm.hidden_size == 2560
