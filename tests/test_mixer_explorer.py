"""MixerTTS training/inference + speech data explorer stats."""

import json

import numpy as np

import jax
import jax.numpy as jnp
import optax

from nemo_tpu.core.config import ConfigDict
from nemo_tpu.models.tts.mixer_model import MixerTTSModel


def test_mixer_tts_trains_and_generates():
    m = MixerTTSModel(ConfigDict(n_mels=16, d_model=32, enc_layers=1,
                                 dec_layers=1, max_text_len=16,
                                 max_mel_len=64))
    rng = np.random.RandomState(0)
    tokens = m.parse("hello world")
    tokens = jnp.concatenate([tokens, tokens], 0)
    U = tokens.shape[1]
    token_len = jnp.asarray([U, U - 3], jnp.int32)
    durations = jnp.asarray(rng.randint(1, 4, (2, U)), jnp.int32)
    durations = jnp.where(jnp.arange(U)[None] < token_len[:, None], durations, 0)
    mel_len = jnp.sum(durations, 1)
    T = int(mel_len.max())
    mels = jnp.asarray(rng.randn(2, 16, T), jnp.float32)
    pitch = jnp.asarray(rng.randn(2, U), jnp.float32)

    tx = optax.adam(2e-3)
    v = m.variables
    opt = tx.init(v)

    @jax.jit
    def step(vars_, opt_state):
        (l, parts), g = jax.value_and_grad(
            lambda vv: m.loss(vv, tokens, token_len, mels, mel_len,
                              durations, pitch,
                              rng=jax.random.PRNGKey(0)), has_aux=True)(vars_)
        up, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(vars_, up), opt_state, l

    losses = []
    for _ in range(5):
        v, opt, l = step(v, opt)
        losses.append(float(l))
    assert losses[-1] < losses[0]
    m.variables = v
    mel = m.generate_spectrogram(m.parse("hi there"))
    assert mel.shape[0] == 1 and mel.shape[1] == 16 and mel.shape[2] >= 1


def test_data_explorer(tmp_path):
    from nemo_tpu.data.audio_io import write_wav
    from nemo_tpu.tools.data_explorer import analyze_manifest, report

    rng = np.random.RandomState(0)
    man = tmp_path / "m.jsonl"
    with open(man, "w") as f:
        for i, (dur, text) in enumerate([(1.0, "hello world"),
                                         (2.0, "the quick fox"),
                                         (0.5, "")]):
            p = str(tmp_path / f"{i}.wav")
            write_wav(p, (rng.randn(int(16000 * dur)) * 0.1).astype(np.float32), 16000)
            f.write(json.dumps({"audio_filepath": p, "text": text,
                                "duration": dur}) + "\n")
        # missing audio entry
        f.write(json.dumps({"audio_filepath": str(tmp_path / "nope.wav"),
                            "text": "x"}) + "\n")

    stats = analyze_manifest(str(man), vocab=list("abcdefghijklmnopqrstuvwxyz "),
                             check_audio=True)
    assert stats["num_utterances"] == 4
    assert abs(stats["total_hours"] - 3.5 / 3600) < 1e-6
    assert stats["problems"]["missing_audio"] == [3]
    assert stats["problems"]["empty_text"] == [2]
    r = report(stats)
    assert "utterances : 4" in r and "missing audio" in r


def test_data_explorer_html_dashboard(tmp_path):
    """SDE dashboard analog: self-contained HTML with stat tiles, SVG
    histograms and problem tables."""
    import json

    from nemo_tpu.tools.data_explorer import explore_to_html

    man = tmp_path / "m.jsonl"
    rows = [{"audio_filepath": f"/nope/{i}.wav", "text": "hello world",
             "duration": 1.0 + 0.1 * i} for i in range(20)]
    rows.append({"audio_filepath": "/nope/x.wav", "text": "", "duration": 1.0})
    man.write_text("\n".join(json.dumps(r) for r in rows))
    out = tmp_path / "dash.html"
    stats = explore_to_html(str(man), str(out), vocab=list("helo wrd"))
    html = out.read_text()
    assert "<svg" in html and "utterances" in html
    assert "empty_text" in html
    assert stats["num_utterances"] == 21
