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
