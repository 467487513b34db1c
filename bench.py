"""Benchmark: Conformer-Large CTC inference RTFx per chip.

North star (BASELINE.json): Conformer-Large transcribes at ≥2000× RTF per
v5e chip (reference: >2000 RTFx on NVIDIA GPUs, README.md:146-148).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from nemo_tpu.models.asr.configs import conformer_ctc
    from nemo_tpu.models.asr.ctc_models import EncDecCTCModel

    model = EncDecCTCModel(conformer_ctc("large", compute_dtype="bfloat16"))

    B = 8
    secs = 30.0
    T = int(16000 * secs)
    rng = np.random.RandomState(0)
    # distinct inputs per iteration (identical inputs can be served from
    # execution caches and undercount the work)
    iters = 5
    signals = [jnp.asarray(rng.randn(B, T).astype(np.float32) * 0.05) for _ in range(iters)]
    length = jnp.full((B,), T, jnp.int32)

    def sync(x):
        # scalar device-slice fetch: block_until_ready is unreliable through
        # the remote-execution relay, a 4-byte fetch is an honest barrier
        return float(x.ravel()[0])

    # warmup (compile)
    log_probs, enc_len = model.forward(signals[0], length)
    sync(log_probs)

    t0 = time.perf_counter()
    for i in range(iters):
        log_probs, enc_len = model.forward(signals[i], length)
    sync(log_probs)
    t1 = time.perf_counter()

    wall = (t1 - t0) / iters
    audio_seconds = B * secs
    rtfx = audio_seconds / wall
    baseline = 2000.0
    print(
        json.dumps(
            {
                "metric": "conformer_large_ctc_inference_rtfx",
                "value": round(rtfx, 1),
                "unit": "x realtime per chip",
                "vs_baseline": round(rtfx / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
