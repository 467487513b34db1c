"""BERT + T5 model tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nemo_tpu.models.llm.bert import BertConfig, BertModel, mlm_loss
from nemo_tpu.models.llm.t5 import T5Config, T5Model, t5_greedy_decode, t5_loss


def _tiny_bert():
    return BertConfig(num_layers=2, hidden_size=64, ffn_hidden_size=128,
                      num_attention_heads=4, vocab_size=100, seq_length=32,
                      hidden_dropout=0.0, attention_dropout=0.0)


def test_bert_forward_and_mlm():
    cfg = _tiny_bert()
    model = BertModel(cfg)
    toks = jnp.asarray(np.random.RandomState(0).randint(0, 100, (2, 16)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), toks)
    seq, logits = model.apply(variables, toks)
    assert seq.shape == (2, 16, 64)
    assert logits.shape == (2, 16, 100)
    mask = jnp.zeros((2, 16)).at[:, :3].set(1.0)
    loss = mlm_loss(logits, toks, mask)
    assert np.isfinite(float(loss))


def test_bert_bidirectional():
    """Changing a late token must change early outputs (NOT causal)."""
    cfg = _tiny_bert()
    model = BertModel(cfg)
    rng = np.random.RandomState(0)
    t1 = rng.randint(0, 100, (1, 16)).astype(np.int32)
    t2 = t1.copy()
    t2[0, -1] = (t2[0, -1] + 1) % 100
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(t1))
    s1, _ = model.apply(variables, jnp.asarray(t1))
    s2, _ = model.apply(variables, jnp.asarray(t2))
    assert np.abs(np.asarray(s1)[:, 0] - np.asarray(s2)[:, 0]).max() > 1e-6


def _tiny_t5():
    return T5Config(num_layers=2, hidden_size=64, ffn_hidden_size=128,
                    num_attention_heads=4, kv_channels=16, vocab_size=100,
                    dropout=0.0)


@pytest.mark.slow
def test_t5_forward_loss_decode():
    cfg = _tiny_t5()
    model = T5Model(cfg)
    rng = np.random.RandomState(0)
    enc = jnp.asarray(rng.randint(0, 100, (2, 12)), jnp.int32)
    dec = jnp.asarray(rng.randint(0, 100, (2, 6)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), enc, dec)
    logits = model.apply(variables, enc, dec)
    assert logits.shape == (2, 6, 100)
    loss = t5_loss(logits, dec, jnp.ones((2, 6)))
    assert np.isfinite(float(loss))
    out = t5_greedy_decode(model, variables, enc, max_len=4)
    assert out.shape == (2, 4)


def test_t5_decoder_causal():
    cfg = _tiny_t5()
    model = T5Model(cfg)
    rng = np.random.RandomState(0)
    enc = jnp.asarray(rng.randint(0, 100, (1, 8)), jnp.int32)
    d1 = rng.randint(0, 100, (1, 6)).astype(np.int32)
    d2 = d1.copy()
    d2[0, -1] = (d2[0, -1] + 3) % 100
    variables = model.init(jax.random.PRNGKey(0), enc, jnp.asarray(d1))
    l1 = model.apply(variables, enc, jnp.asarray(d1))
    l2 = model.apply(variables, enc, jnp.asarray(d2))
    np.testing.assert_allclose(np.asarray(l1)[:, :-1], np.asarray(l2)[:, :-1], atol=1e-5)
