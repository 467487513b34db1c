"""OpenAI audio API endpoints: /v1/audio/transcriptions + /v1/audio/speech."""

import http.client
import io
import json
import wave

import numpy as np

from nemo_tpu.serve.audio_server import AudioServer, _parse_wav, _wav_bytes


def _mk_wav(x, sr=16000):
    return _wav_bytes(np.asarray(x, np.float32), sr)


def test_wav_round_trip():
    x = (np.sin(np.linspace(0, 40, 1600)) * 0.5).astype(np.float32)
    y, sr = _parse_wav(_mk_wav(x))
    assert sr == 16000
    np.testing.assert_allclose(y, x, atol=1e-3)


def test_audio_endpoints_end_to_end():
    from nemo_tpu.models.asr.configs import quartznet_tiny
    from nemo_tpu.models.asr.ctc_models import EncDecCTCModel
    from nemo_tpu.models.tts.fastpitch_model import FastPitchModel
    from nemo_tpu.models.tts.hifigan_model import HifiGanModel

    asr = EncDecCTCModel(quartznet_tiny())
    spec = FastPitchModel({"max_mel_len": 64})
    voc = HifiGanModel({})
    srv = AudioServer(asr=asr, tts=(spec, voc))
    httpd = srv.serve(port=0, blocking=False)
    port = httpd.server_address[1]
    try:
        rng = np.random.RandomState(0)
        wav = _mk_wav(rng.randn(16000) * 0.1)

        # raw-body transcription
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        conn.request("POST", "/v1/audio/transcriptions", body=wav,
                     headers={"Content-Type": "audio/wav"})
        r = conn.getresponse()
        assert r.status == 200
        out = json.loads(r.read())
        assert "text" in out

        # multipart transcription (the OpenAI client shape)
        boundary = "XBOUNDARYX"
        part = (f"--{boundary}\r\nContent-Disposition: form-data; "
                f'name="file"; filename="a.wav"\r\n'
                f"Content-Type: audio/wav\r\n\r\n").encode() + wav + \
            f"\r\n--{boundary}--\r\n".encode()
        conn.request("POST", "/v1/audio/transcriptions", body=part,
                     headers={"Content-Type":
                              f"multipart/form-data; boundary={boundary}"})
        r = conn.getresponse()
        assert r.status == 200
        assert json.loads(r.read())["text"] == out["text"]

        # speech synthesis
        conn.request("POST", "/v1/audio/speech",
                     body=json.dumps({"input": "hello world"}),
                     headers={"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 200
        data = r.read()
        with wave.open(io.BytesIO(data), "rb") as w:
            assert w.getnframes() > 0
    finally:
        srv.shutdown()
