"""VLM generation parity: KV-cached scan decode == full-forward argmax loop.

Reference contract: `nemo/collections/vlm/inference/vlm_engine.py` generate
(image-conditioned prefill into the text generation controller) — greedy
output must be token-exact vs re-running the full training forward and
taking argmax at every step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nemo_tpu.models.llm.config import GPTConfig
from nemo_tpu.models.llm.generate import SamplingParams
from nemo_tpu.models.vision.vit import ViTConfig
from nemo_tpu.models.vlm.gemma3vl import Gemma3VLConfig, Gemma3VLModel
from nemo_tpu.models.vlm.inference import VLMGenerationEngine
from nemo_tpu.models.vlm.neva import NevaConfig, NevaModel
from nemo_tpu.models.vlm.qwen2vl import (Qwen2VLConfig, Qwen2VLModel,
                                         get_mrope_positions)

IMG_ID = 61  # placeholder id inside the tiny 64-vocab


def _tiny_llm(**kw):
    # float32 compute: random-init logits sit ~1e-3 apart, so bf16
    # cached-decode vs full-recompute rounding flips argmax ties — the
    # parity contract is exact math, tested in f32
    d = dict(num_layers=2, hidden_size=32, ffn_hidden_size=64,
             num_attention_heads=4, num_query_groups=2, vocab_size=64,
             seq_length=64, scan_layers=False, compute_dtype="float32")
    d.update(kw)
    return GPTConfig(**d)


def _tiny_vit():
    return ViTConfig(image_size=16, patch_size=8, hidden_size=16,
                     num_layers=1, num_heads=2, ffn_hidden_size=32,
                     use_cls_token=False)


MAX_NEW = 6


def _prompts(n_img_tokens):
    # two equal-length rows: [text, IMG*n, text...] with image mid-prompt
    base = [5, 9] + [IMG_ID] * n_img_tokens + [17, 3, 42]
    return [list(base), [7, 1] + [IMG_ID] * n_img_tokens + [30, 8, 2]]


def _full_greedy(fwd, prompts, steps):
    """Teacher-forcing loop: re-run the full forward each step, argmax of
    the last position, append."""
    rows = [list(p) for p in prompts]
    outs = [[] for _ in rows]
    for _ in range(steps):
        toks = np.asarray(rows, np.int32)
        logits = np.asarray(fwd(toks))
        for b in range(len(rows)):
            t = int(np.argmax(logits[b, -1]))
            rows[b].append(t)
            outs[b].append(t)
    return outs


def _check(model, params, images, prompts, fwd, **kw):
    engine = VLMGenerationEngine(model, params, cache_dtype=jnp.float32)
    got = engine.generate_tokens(
        images, prompts,
        SamplingParams(greedy=True, max_new_tokens=MAX_NEW, eos_id=-1), **kw)
    want = _full_greedy(fwd, prompts, MAX_NEW)
    assert got == want


@jax.default_matmul_precision("float32")
def test_neva_generate_matches_full_forward():
    cfg = NevaConfig(llm=_tiny_llm(), vision=_tiny_vit(),
                     image_token_id=IMG_ID)
    model = NevaModel(cfg)
    prompts = _prompts(4)  # (16/8)^2 patches
    images = np.random.RandomState(0).rand(2, 16, 16, 3).astype(np.float32)
    toks0 = jnp.asarray(prompts, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(images),
                        toks0)["params"]

    def fwd(toks):
        return model.apply({"params": params}, jnp.asarray(images),
                           jnp.asarray(toks))

    _check(model, params, images, prompts, fwd)


@jax.default_matmul_precision("float32")
def test_gemma3vl_generate_matches_full_forward():
    llm = _tiny_llm(embedding_multiplier=32 ** 0.5,
                    window_pattern=(8, None))
    cfg = Gemma3VLConfig(llm=llm, vision=_tiny_vit(), image_token_id=IMG_ID,
                         pool=2)
    model = Gemma3VLModel(cfg)
    assert cfg.tokens_per_image == 1
    prompts = _prompts(1)
    images = np.random.RandomState(1).rand(2, 16, 16, 3).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(images),
                        jnp.asarray(prompts, jnp.int32))["params"]

    def fwd(toks):
        return model.apply({"params": params}, jnp.asarray(images),
                           jnp.asarray(toks))

    _check(model, params, images, prompts, fwd)


@jax.default_matmul_precision("float32")
def test_qwen2vl_generate_matches_full_forward():
    llm = _tiny_llm(mrope_sections=(2, 1, 1), rotary_base=10000.0)
    cfg = Qwen2VLConfig(llm=llm, vision=_tiny_vit(), image_token_id=IMG_ID,
                        spatial_merge_size=2)
    model = Qwen2VLModel(cfg)
    prompts = _prompts(1)  # merged grid 1x1
    grids = [[(1, 1, 1)], [(1, 1, 1)]]
    images = np.random.RandomState(2).rand(2, 16, 16, 3).astype(np.float32)
    toks0 = np.asarray(prompts, np.int32)
    pos0 = get_mrope_positions(toks0, IMG_ID, grids)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(images),
                        jnp.asarray(toks0), jnp.asarray(pos0))["params"]

    def fwd(toks):
        pos = get_mrope_positions(np.asarray(toks, np.int64), IMG_ID, grids)
        return model.apply({"params": params}, jnp.asarray(images),
                           jnp.asarray(toks), jnp.asarray(pos))

    _check(model, params, images, prompts, fwd, grids=grids)


@jax.default_matmul_precision("float32")
def test_vlm_engine_left_padding_unequal_prompts():
    """Rows of different lengths decode independently (left padding +
    kv_valid): each row matches its own single-row generation."""
    cfg = NevaConfig(llm=_tiny_llm(), vision=_tiny_vit(),
                     image_token_id=IMG_ID)
    model = NevaModel(cfg)
    p0 = [5, 9] + [IMG_ID] * 4 + [17, 3, 42]
    p1 = [7] + [IMG_ID] * 4 + [2]
    images = np.random.RandomState(3).rand(2, 16, 16, 3).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(images),
                        jnp.asarray([p0], jnp.int32))["params"]
    engine = VLMGenerationEngine(model, params, cache_dtype=jnp.float32)
    samp = SamplingParams(greedy=True, max_new_tokens=4, eos_id=-1)
    both = engine.generate_tokens(images, [p0, p1], samp)
    solo0 = engine.generate_tokens(images[:1], [p0], samp)
    solo1 = engine.generate_tokens(images[1:], [p1], samp)
    assert both[0] == solo0[0]
    assert both[1] == solo1[0]
