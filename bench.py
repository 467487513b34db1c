"""Benchmark: Conformer-Large CTC full-pipeline transcription RTFx per chip.

North star (BASELINE.json): Conformer-Large transcribes at ≥2000× RTF per
v5e chip (reference: >2000 RTFx on NVIDIA GPUs, README.md:146-148). RTFx is
measured the way the reference's harness does (transcribe_speech.py:383-496):
total audio seconds / wall-clock of the FULL `transcribe()` call — mel
frontend + encoder + greedy CTC decode + text assembly, after a same-shape
warmup.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import os
    import tempfile

    from nemo_tpu.data.audio_io import write_wav
    from nemo_tpu.models.asr.configs import conformer_ctc
    from nemo_tpu.models.asr.ctc_models import EncDecCTCModel

    model = EncDecCTCModel(conformer_ctc("large", compute_dtype="bfloat16"))

    B = 8
    secs = 30.0
    T = int(16000 * secs)
    rng = np.random.RandomState(0)
    # distinct wav files per iteration (identical inputs can be served from
    # execution caches and undercount the work)
    iters = 5
    tmp = tempfile.mkdtemp(prefix="bench_wavs_")
    batches = []
    for i in range(iters):
        paths = []
        for b in range(B):
            p = os.path.join(tmp, f"{i}_{b}.wav")
            write_wav(p, rng.randn(T).astype(np.float32) * 0.05, 16000)
            paths.append(p)
        batches.append(paths)

    # warmup (compile) with the same shapes; transcribe ALL batches once so
    # timing measures steady-state pipelined throughput
    model.transcribe(batches[0], batch_size=B)

    flat = [p for batch in batches for p in batch]
    t0 = time.perf_counter()
    out = model.transcribe(flat, batch_size=B)
    t1 = time.perf_counter()
    assert len(out) == B * iters

    wall = (t1 - t0) / iters
    audio_seconds = B * secs  # per batch
    rtfx = audio_seconds / wall
    baseline = 2000.0
    print(
        json.dumps(
            {
                "metric": "conformer_large_ctc_transcribe_rtfx",
                "value": round(rtfx, 1),
                "unit": "x realtime per chip (full transcribe incl. decode)",
                "vs_baseline": round(rtfx / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
