"""A/B Conformer attention backends at bench shapes on the real chip.

VERDICT r2 weak #6: `decomposed` (XLA einsum rel-pos) vs
`decomposed_flash` (Pallas flash kernel under the trig-decomposed
rel-pos) was never measured at the RTFx bench shape. This measures the
FULL transcribe pipeline both ways (B=16 x 30 s, Conformer-L bf16) and
records the winner so the default is a measured decision.

Run: JAX_PLATFORMS=axon PYTHONPATH=/root/.axon_site:/root/repo \
     python -u scripts/conformer_flash_ab.py
"""

import json
import time

import numpy as np


def bench(att_impl: str, iters: int = 4):
    import jax
    import jax.numpy as jnp

    from nemo_tpu.models.asr.configs import conformer_ctc
    from nemo_tpu.models.asr.ctc_models import EncDecCTCModel

    cfg = conformer_ctc("large", compute_dtype="bfloat16")
    cfg.encoder["att_impl"] = att_impl
    model = EncDecCTCModel(cfg)

    B, secs = 16, 30.0
    T = int(16000 * secs)
    rng = np.random.RandomState(0)
    batches = []
    for i in range(iters + 1):
        sig = (np.clip(rng.randn(B, T) * 0.05, -1, 1) * 32767).astype(np.int16)
        batches.append((jax.device_put(jnp.asarray(sig)),
                        jnp.full((B,), T, jnp.int32), B))
    model.transcribe_staged(batches[:1])  # compile
    t0 = time.perf_counter()
    out = model.transcribe_staged(batches[1:])
    t1 = time.perf_counter()
    rtfx = B * secs * iters / (t1 - t0)
    return rtfx


def main():
    for impl in ("decomposed", "decomposed_flash"):
        try:
            r = bench(impl)
            print(json.dumps({"att_impl": impl, "rtfx": round(r, 1)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"att_impl": impl, "error": str(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
