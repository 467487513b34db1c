"""StableHLO export tests (reference: export/tensorrt_llm.py engine export,
core Exportable — here jax.export saved programs)."""

import numpy as np

import jax
import jax.numpy as jnp

from nemo_tpu.export import (
    export_asr_ctc,
    export_gpt_decode,
    export_gpt_logits,
    load_exported,
)
from nemo_tpu.models.llm.config import tiny_test
from nemo_tpu.models.llm.gpt import GPTModel


def _tiny(seed=0):
    cfg = tiny_test()
    model = GPTModel(cfg)
    import flax.linen as nn
    params = nn.meta.unbox(
        model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 16), jnp.int32))["params"])
    return cfg, model, params


def test_gpt_logits_export_round_trip(tmp_path):
    cfg, model, params = _tiny()
    path = export_gpt_logits(cfg, params, str(tmp_path / "exp"), batch=2, seq_len=16)
    prog = load_exported(path)
    tok = jnp.asarray(np.random.RandomState(0).randint(0, 100, (2, 16)), jnp.int32)
    out = prog(tok)
    ref = model.apply({"params": params}, tok)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    assert prog.manifest["kind"] == "gpt_logits"


def test_gpt_decode_export_runs(tmp_path):
    cfg, model, params = _tiny()
    path = export_gpt_decode(cfg, params, str(tmp_path / "dec"), batch=1, max_len=8)
    prog = load_exported(path)
    from nemo_tpu.models.llm.gpt import init_kv_caches
    k, v = init_kv_caches(cfg, 1, 8, dtype=jnp.float32)
    logits, k, v = prog(jnp.zeros((1, 1), jnp.int32), jnp.zeros((1, 1), jnp.int32),
                        k, v, jnp.zeros((), jnp.int32))
    assert logits.shape == (1, 1, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_asr_ctc_export_round_trip(tmp_path):
    from nemo_tpu.models.asr.configs import quartznet_tiny
    from nemo_tpu.models.asr.ctc_models import EncDecCTCModel

    m = EncDecCTCModel(quartznet_tiny())
    path = export_asr_ctc(m, str(tmp_path / "asr"), batch=1, num_samples=16000)
    prog = load_exported(path)
    wav = jnp.asarray(np.random.RandomState(0).randn(1, 16000) * 0.1, jnp.float32)
    lens = jnp.asarray([16000], jnp.int32)
    lp, fl = prog(wav, lens)
    ref_lp, ref_fl = m._infer_fn(m.variables, wav, lens)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(ref_lp), atol=1e-4)
    assert prog.manifest["labels"] == m.labels


def test_tts_synthesize_export_round_trip(tmp_path):
    import numpy as np

    from nemo_tpu.core.config import ConfigDict
    from nemo_tpu.export.stablehlo import export_tts_synthesize, load_exported
    from nemo_tpu.models.tts.fastpitch_model import FastPitchModel
    from nemo_tpu.models.tts.hifigan_model import HifiGanModel

    fp = FastPitchModel(ConfigDict({"d_model": 32, "d_ff": 64,
                                    "enc_layers": 1, "dec_layers": 1,
                                    "max_mel_len": 64}))
    hg = HifiGanModel(ConfigDict({"generator": {
        "upsample_rates": (4, 4), "upsample_kernel_sizes": (8, 8),
        "upsample_initial_channel": 16}}))
    path = export_tts_synthesize(fp, hg, str(tmp_path / "tts"), batch=1,
                                 max_tokens=16)
    prog = load_exported(path)
    toks = fp.parse("hello world")[:, :16]
    toks = np.pad(np.asarray(toks), ((0, 0), (0, 16 - toks.shape[1])))
    audio, mel_len = prog(toks.astype(np.int32),
                          np.array([16], np.int32))
    hop = prog.manifest["hop_length"]
    assert audio.shape == (1, 64 * hop)
    n = int(mel_len[0]) * hop
    assert np.abs(np.asarray(audio)[0, :n]).max() > 0


def test_quantized_decode_export(tmp_path):
    """StableHLO export of the int8-resident PTQ decode step (the
    quantized-engine artifact: int8 weights baked into the program)."""
    from nemo_tpu.llm.api import ptq
    from nemo_tpu.models.llm.gpt import init_kv_caches

    cfg, model, params = _tiny()
    cfg_q, params_q = ptq(cfg, params, algorithm="int8_serve")
    path = export_gpt_decode(cfg_q, params_q, str(tmp_path / "qdec"),
                             batch=1, max_len=8)
    prog = load_exported(path)
    k, v = init_kv_caches(cfg_q, 1, 8, dtype=jnp.float32)
    logits, k, v = prog(jnp.zeros((1, 1), jnp.int32),
                        jnp.zeros((1, 1), jnp.int32),
                        k, v, jnp.zeros((), jnp.int32))
    assert logits.shape == (1, 1, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_train_module_rejects_int8_ptq():
    import pytest as _pytest

    from nemo_tpu.models.llm.config import tiny_test
    from nemo_tpu.models.llm.train import GPTTrainModule

    with _pytest.raises(ValueError, match="int8_ptq"):
        GPTTrainModule(tiny_test(quantization="int8_ptq"))
