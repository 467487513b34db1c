"""Duplex speech-to-speech models (reference speechlm2
duplex_s2s_model.py / duplex_s2s_speech_decoder_model.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from nemo_tpu.models.llm.config import tiny_test
from nemo_tpu.models.speechlm.duplex_s2s import (
    DuplexS2SConfig, DuplexS2SModel, prepare_duplex_inputs,
)


def _cfg(**kw):
    llm = tiny_test(num_layers=2, hidden_size=64, ffn_hidden_size=128,
                    num_attention_heads=4, vocab_size=48, seq_length=32)
    return DuplexS2SConfig(llm=llm, num_codebooks=2, codebook_size=16, **kw)


def _batch(cfg, B=2, T=16, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "source_encoded": jnp.asarray(
            rng.randn(B, T, cfg.llm.hidden_size) * 0.1, jnp.float32),
        "target_tokens": jnp.asarray(
            rng.randint(3, cfg.llm.vocab_size, (B, T)), jnp.int32),
        "target_codes": jnp.asarray(
            rng.randint(0, cfg.codebook_size, (B, T, cfg.num_codebooks)),
            jnp.int32),
    }


def test_prepare_inputs_control_codes_and_delay():
    cfg = _cfg()
    toks = jnp.asarray([[1, 5, 6, 2]], jnp.int32)  # bos, x, x, eos
    codes = jnp.asarray([[[3, 4], [5, 6], [7, 8], [9, 10]]], jnp.int32)
    prep = prepare_duplex_inputs(cfg, toks, codes, 1, 2)
    # bos frame → speech_bos in ALL codebooks, eos frame → speech_eos,
    # then one-frame delay with speech_delay at t=0
    expect_inputs = [[cfg.speech_delay_id] * 2, [cfg.speech_bos_id] * 2,
                     [5, 6]]
    np.testing.assert_array_equal(np.asarray(prep["audio_inputs"][0]),
                                  expect_inputs)
    np.testing.assert_array_equal(
        np.asarray(prep["audio_labels"][0]),
        [[cfg.speech_bos_id] * 2, [5, 6], [7, 8]])
    np.testing.assert_array_equal(np.asarray(prep["text_inputs"][0]),
                                  [1, 5, 6])
    np.testing.assert_array_equal(np.asarray(prep["text_labels"][0]),
                                  [5, 6, 2])


@pytest.mark.parametrize("decoder_layers", [0, 2])
def test_duplex_trains_both_channels(decoder_layers):
    cfg = _cfg(speech_decoder_layers=decoder_layers)
    model = DuplexS2SModel(cfg)
    batch = _batch(cfg)
    params = model.variables["params"]
    opt = optax.adam(3e-3)
    ost = opt.init(params)

    @jax.jit
    def step(params, ost, rng):
        (l, m), g = jax.value_and_grad(
            lambda p: model.loss_fn(p, batch, rng), has_aux=True)(params)
        u, ost = opt.update(g, ost)
        return optax.apply_updates(params, u), ost, l, m

    first = last = None
    m0 = mN = None
    for i in range(25):
        params, ost, l, m = step(params, ost, jax.random.PRNGKey(i))
        if i == 0:
            first, m0 = float(l), m
        last, mN = float(l), m
    assert last < first
    # both channels individually improve
    assert float(mN["text_loss"]) < float(m0["text_loss"])
    assert float(mN["audio_loss"]) < float(m0["audio_loss"])


def test_duplex_offline_inference_consumes_own_outputs():
    cfg = _cfg()
    model = DuplexS2SModel(cfg)
    batch = _batch(cfg, B=2, T=8)
    texts, audios = model.offline_inference(
        model.variables["params"], batch["source_encoded"])
    assert texts.shape == (2, 8)
    assert audios.shape == (2, 8, cfg.num_codebooks)
    assert (np.asarray(audios) >= 0).all()
    assert (np.asarray(audios) < cfg.speech_vocab_size).all()

    # duplex property: the decode is causal in the source — changing a
    # later source frame cannot change earlier outputs
    src2 = batch["source_encoded"].at[:, 5:].set(0.0)
    t2, a2 = model.offline_inference(model.variables["params"], src2)
    np.testing.assert_array_equal(np.asarray(texts[:, :5]),
                                  np.asarray(t2[:, :5]))
    np.testing.assert_array_equal(np.asarray(audios[:, :5]),
                                  np.asarray(a2[:, :5]))


def test_speech_decoder_variant_offline_inference():
    cfg = _cfg(speech_decoder_layers=1)
    model = DuplexS2SModel(cfg)
    batch = _batch(cfg, B=1, T=6)
    texts, audios = model.offline_inference(
        model.variables["params"], batch["source_encoded"])
    assert texts.shape == (1, 6)
    assert audios.shape == (1, 6, cfg.num_codebooks)
