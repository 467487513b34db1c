"""Bidirectional attention for embedding/reranker backbones (reference
llama_embedding.py get_nv_embedding_layer_spec — NV-Embed runs the llama
stack WITHOUT causal masking; reranker.py:32 uses the same spec)."""

import numpy as np

import jax
import jax.numpy as jnp

from nemo_tpu.models.llm.config import GPTConfig
from nemo_tpu.models.llm.embedding import (
    EmbeddingConfig,
    EmbeddingModel,
    llama32_1b_embedding,
    llama32_1b_reranker,
    llama32_3b_embedding,
)


def _tiny(causal):
    return GPTConfig(num_layers=2, hidden_size=32, ffn_hidden_size=64,
                     num_attention_heads=4, num_query_groups=2, vocab_size=32,
                     seq_length=16, params_dtype="float32",
                     compute_dtype="float32", remat="none", causal=causal)


def test_bidirectional_attention_sees_future():
    """causal=False: position 0's hidden state changes when a LATER token
    changes; causal=True must not."""
    from nemo_tpu.models.llm.gpt import GPTModel

    tok_a = jnp.asarray([[5, 6, 7, 8]])
    tok_b = jnp.asarray([[5, 6, 7, 30]])
    for causal, expect_change in ((False, True), (True, False)):
        m = GPTModel(_tiny(causal))
        v = m.init(jax.random.PRNGKey(0), tok_a)
        ha = m.apply(v, tok_a, output_hidden=True)
        hb = m.apply(v, tok_b, output_hidden=True)
        changed = bool(np.abs(np.asarray(ha[0, 0] - hb[0, 0])).max() > 1e-6)
        assert changed == expect_change, (causal, changed)


def test_embedding_mask_blocks_pad_attention():
    """Pad tokens must not bleed into real positions' hidden states: with
    the mask gating attention (kv_valid), changing pad CONTENT leaves the
    embedding bit-identical — crucial for bidirectional stacks where pads
    would otherwise be visible to every position."""
    cfg = EmbeddingConfig(llm=_tiny(causal=False))
    m = EmbeddingModel(cfg)
    mask = jnp.asarray([[1, 1, 1, 0, 0, 0]], jnp.int32)
    toks1 = jnp.asarray([[5, 6, 7, 1, 1, 1]])
    toks2 = jnp.asarray([[5, 6, 7, 29, 13, 2]])
    v = m.init(jax.random.PRNGKey(0), toks1, mask)
    e1 = np.asarray(m.apply(v, toks1, mask))
    e2 = np.asarray(m.apply(v, toks2, mask))
    np.testing.assert_allclose(e1, e2, atol=1e-6)


def test_presets_are_bidirectional():
    for factory in (llama32_1b_embedding, llama32_3b_embedding,
                    llama32_1b_reranker):
        cfg = factory()
        assert cfg.llm.causal is False, factory.__name__
    assert llama32_3b_embedding().llm.hidden_size > \
        llama32_1b_embedding().llm.hidden_size
