"""Common prompt formatters, losses, Perplexity metric, byte tokenizer
(reference nemo/collections/common/{prompts,losses,metrics,tokenizers})."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nemo_tpu.core.losses import (
    Perplexity, cosine_similarity_loss, masked_token_nll,
    smoothed_cross_entropy,
)
from nemo_tpu.data.prompt_formatters import (
    PromptFormatter, get_prompt_formatter,
)
from nemo_tpu.data.text_tokenizers import ByteLevelTokenizer


def test_byte_level_tokenizer_roundtrip():
    tok = ByteLevelTokenizer()
    s = "héllo wörld"
    ids = tok.text_to_ids(s)
    assert all(0 <= i < 256 for i in ids)
    assert tok.ids_to_text(ids) == s
    assert tok.vocab_size == 259
    assert tok.eos_id == 258


def test_prompt_formatters_registry_and_masks():
    tok = ByteLevelTokenizer()
    for name in ("chatml", "llama3", "gemma", "mistral", "plain", "llama2",
                 "canary"):
        assert PromptFormatter.resolve(name)

    fmt = get_prompt_formatter("chatml", tok)
    out = fmt.encode_dialog([
        {"role": "user", "slots": {"message": "hi"}},
        {"role": "assistant", "slots": {"message": "yo"}},
    ])
    ids, mask = out["input_ids"], out["mask"]
    assert ids.shape == mask.shape
    # only assistant-turn tokens (+eos) are targets
    text = tok.ids_to_text(ids[mask > 0].tolist())
    assert "yo" in text and "hi" not in text
    # user tokens are context
    ctx = tok.ids_to_text(ids[mask == 0].tolist())
    assert "hi" in ctx
    # eos appended after the output role
    assert ids[-1] == tok.eos_id and mask[-1] == 1


def test_llama3_format_and_gemma_output_role():
    tok = ByteLevelTokenizer()
    fmt = get_prompt_formatter("llama3", tok)
    s = fmt.format_turn("user", {"message": "Q"})
    assert s == "<|start_header_id|>user<|end_header_id|>\n\nQ<|eot_id|>"
    g = get_prompt_formatter("gemma", tok)
    out = g.encode_dialog([
        {"role": "user", "slots": {"message": "a"}},
        {"role": "model", "slots": {"message": "b"}},
    ])
    assert (out["mask"] > 0).any()

    c = get_prompt_formatter("canary", tok)
    s = c.format_turn("user", {
        "source_lang": "<|en|>", "task": "<|transcribe|>",
        "target_lang": "<|en|>", "pnc": "<|pnc|>"})
    assert s == "<|startoftranscript|><|en|><|transcribe|><|en|><|pnc|>"


def test_smoothed_ce_reduces_to_ce_and_pad_exclusion():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(2, 5, 7), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 7, (2, 5)), jnp.int32)
    plain = smoothed_cross_entropy(logits, labels)
    lp = jax.nn.log_softmax(logits, -1)
    ref = -jnp.take_along_axis(lp, labels[..., None], -1)[..., 0].mean()
    assert float(plain) == pytest.approx(float(ref), rel=1e-6)

    # smoothing increases loss on confident-correct predictions
    conf = jnp.full((1, 3, 7), -10.0).at[0, :, 2].set(10.0)
    lab = jnp.full((1, 3), 2, jnp.int32)
    assert float(smoothed_cross_entropy(conf, lab, label_smoothing=0.1)) > \
        float(smoothed_cross_entropy(conf, lab))

    # pad positions excluded
    labels_pad = labels.at[:, -2:].set(0)
    masked = smoothed_cross_entropy(logits, labels_pad, pad_id=0)
    manual_mask = (labels_pad != 0).astype(jnp.float32)
    nll = -jnp.take_along_axis(lp, labels_pad[..., None], -1)[..., 0]
    ref2 = (nll * manual_mask).sum() / manual_mask.sum()
    assert float(masked) == pytest.approx(float(ref2), rel=1e-6)


def test_cosine_similarity_loss():
    a = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    assert float(cosine_similarity_loss(a, a)) == pytest.approx(0.0, abs=1e-6)
    b = jnp.asarray([[-1.0, 0.0], [0.0, -1.0]])
    assert float(cosine_similarity_loss(a, b)) == pytest.approx(2.0, abs=1e-5)
    m = jnp.asarray([1.0, 0.0])
    assert float(cosine_similarity_loss(a, b, m)) == pytest.approx(2.0, abs=1e-5)


def test_perplexity_metric():
    rng = np.random.RandomState(0)
    V = 11
    logits = jnp.asarray(rng.randn(3, 6, V), jnp.float32)
    labels = jnp.asarray(rng.randint(0, V, (3, 6)), jnp.int32)
    ppl = Perplexity()
    for b in range(3):
        ppl.update(logits[b:b + 1], labels[b:b + 1])
    lp = jax.nn.log_softmax(logits, -1)
    nll = -jnp.take_along_axis(lp, labels[..., None], -1)[..., 0]
    assert ppl.compute() == pytest.approx(float(jnp.exp(nll.mean())), rel=1e-5)

    # uniform logits → ppl == V
    ppl.reset()
    ppl.update(jnp.zeros((1, 4, V)), jnp.zeros((1, 4), jnp.int32))
    assert ppl.compute() == pytest.approx(V, rel=1e-5)
