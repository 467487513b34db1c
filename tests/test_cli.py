"""CLI subcommands: usage help, asr align + diarize e2e on tiny models."""

import numpy as np

from nemo_tpu.cli import main
from nemo_tpu.core.config import ConfigDict


def test_usage_help(capsys):
    assert main([]) == 2
    out = capsys.readouterr().out
    for cmd in ("asr align", "asr diarize", "tts synthesize", "llm pretrain"):
        assert cmd in out


def test_asr_align_command(tmp_path, capsys):
    from nemo_tpu.data.audio_io import write_wav
    from nemo_tpu.models.asr.configs import quartznet_tiny
    from nemo_tpu.models.asr.ctc_models import EncDecCTCModel

    m = EncDecCTCModel(quartznet_tiny())
    ckpt = str(tmp_path / "m.ntpu")
    m.save_to(ckpt)
    wav = str(tmp_path / "a.wav")
    rng = np.random.RandomState(0)
    write_wav(wav, (rng.randn(8000) * 0.1).astype(np.float32), 16000)

    rc = main(["asr", "align", f"model={ckpt}", f"audio={wav}",
               "text=hello world"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 2
    assert out[0].split("\t")[2] == "hello"


def test_asr_diarize_command(tmp_path, capsys):
    from nemo_tpu.data.audio_io import write_wav

    wav = str(tmp_path / "d.wav")
    rng = np.random.RandomState(1)
    write_wav(wav, (rng.randn(16000) * 0.1).astype(np.float32), 16000)
    rc = main(["asr", "diarize", f"audio={wav}"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "SPEAKER" in out or out.strip() == ""  # RTTM lines (random model)


def test_asr_eval_command(tmp_path, capsys):
    """`asr eval manifest=...` scores WER over a manifest
    (speech_to_text_eval.py analog) and writes a predictions file."""
    import json

    from nemo_tpu.data.audio_io import write_wav
    from nemo_tpu.models.asr.configs import quartznet_tiny
    from nemo_tpu.models.asr.ctc_models import EncDecCTCModel

    m = EncDecCTCModel(quartznet_tiny())
    ckpt = str(tmp_path / "m.ntpu")
    m.save_to(ckpt)
    rng = np.random.RandomState(0)
    manifest = tmp_path / "eval.jsonl"
    with open(manifest, "w") as f:
        for i in range(2):
            wav = str(tmp_path / f"a{i}.wav")
            write_wav(wav, (rng.randn(8000) * 0.1).astype(np.float32), 16000)
            f.write(json.dumps({"audio_filepath": wav, "text": "a b"}) + "\n")
    outfile = str(tmp_path / "preds.jsonl")
    rc = main(["asr", "eval", f"model={ckpt}", f"manifest={manifest}",
               f"output={outfile}", "batch_size=2"])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["utterances"] == 2 and "wer" in res
    assert len(open(outfile).read().strip().splitlines()) == 2


def test_llm_finetune_command(tmp_path, capsys):
    """`llm finetune` runs the tiny recipe a few steps (mock data path)."""
    rc = main(["llm", "finetune", "model=tiny_test", "trainer.max_steps=2"])
    assert rc == 0


def test_asr_serve_command_background(tmp_path):
    """`asr serve` binds the OpenAI audio API around a checkpoint."""
    import http.client
    import json as _json
    import threading

    from nemo_tpu.models.asr.configs import quartznet_tiny
    from nemo_tpu.models.asr.ctc_models import EncDecCTCModel
    from nemo_tpu.serve.audio_server import AudioServer, _wav_bytes

    m = EncDecCTCModel(quartznet_tiny())
    ckpt = str(tmp_path / "m.ntpu")
    m.save_to(ckpt)
    # drive through the same loader path the CLI uses, non-blocking
    m2 = EncDecCTCModel.restore_from(ckpt)
    srv = AudioServer(asr=m2)
    httpd = srv.serve(port=0, blocking=False)
    port = httpd.server_address[1]
    try:
        wav = _wav_bytes((np.random.RandomState(0).randn(8000) * 0.1
                          ).astype(np.float32), 16000)
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        conn.request("POST", "/v1/audio/transcriptions", body=wav,
                     headers={"Content-Type": "audio/wav"})
        r = conn.getresponse()
        assert r.status == 200 and "text" in _json.loads(r.read())
    finally:
        srv.shutdown()


def test_llm_ptq_command(tmp_path, monkeypatch):
    """`llm ptq` quantizes and writes a servable checkpoint."""
    import flax.linen as nn
    import jax

    import nemo_tpu.llm as llm_pkg
    from nemo_tpu.models.llm.config import tiny_test
    from nemo_tpu.models.llm.gpt import GPTModel

    cfg = tiny_test(seq_length=32)
    params = nn.meta.unbox(GPTModel(cfg).init(
        jax.random.PRNGKey(0), jnp_zeros((1, 8)))["params"])
    monkeypatch.setattr(llm_pkg, "import_ckpt", lambda src: (cfg, params))
    out = str(tmp_path / "q")
    rc = main(["llm", "ptq", "checkpoint=hf://fake", f"out={out}",
               "algorithm=int8_serve"])
    assert rc == 0
    import os
    assert os.path.isdir(out)
    import json as _json
    ctx = _json.load(open(os.path.join(
        out, "step=0-last", "context", "config.json")))
    assert ctx["config"]["quantization"] == "int8_ptq"


def jnp_zeros(shape):
    import jax.numpy as jnp

    return jnp.zeros(shape, jnp.int32)
