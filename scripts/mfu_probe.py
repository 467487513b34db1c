"""Short MFU probes for the 551M training config: isolate what limits the
sustained 45% (head_dim padding in the flash kernel, remat policy, batch).

Run: JAX_PLATFORMS=axon PYTHONPATH=/root/.axon_site:/root/repo \
     python scripts/mfu_probe.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def probe(name, steps=80, B=8, S=2048, heads=16, remat="full",
          attention_backend="flash", seed=0):
    import jax
    import jax.numpy as jnp

    from nemo_tpu.llm.auto_configurator import model_flops_per_token
    from nemo_tpu.models.llm.config import _cfg
    from nemo_tpu.models.llm.train import GPTTrainModule
    from nemo_tpu.parallel.mesh import MeshConfig

    cfg = _cfg(
        num_layers=16, hidden_size=1536, ffn_hidden_size=6144,
        num_attention_heads=heads, num_query_groups=heads, vocab_size=32768,
        seq_length=S, compute_dtype="bfloat16",
        attention_backend=attention_backend, remat=remat,
    )
    mod = GPTTrainModule(cfg, mesh_cfg=MeshConfig(dp=1))
    state = mod.init_state(seed=seed)
    step_fn = mod.train_step_jit()
    rng = np.random.RandomState(seed)
    batches = [
        {"tokens": jnp.asarray(rng.randint(0, cfg.vocab_size, (B, S)), jnp.int32),
         "labels": jnp.asarray(rng.randint(0, cfg.vocab_size, (B, S)), jnp.int32)}
        for _ in range(16)
    ]
    key = jax.random.PRNGKey(seed)
    state, m = step_fn(state, batches[0], key)
    _ = float(m["loss"])  # compile+sync
    t0 = time.perf_counter()
    for i in range(1, steps):
        state, m = step_fn(state, batches[i % 16], key)
    _ = float(m["loss"])
    t1 = time.perf_counter()
    tok_s = B * S * (steps - 1) / (t1 - t0)
    tflops = tok_s * model_flops_per_token(cfg) / 1e12
    out = dict(name=name, tokens_per_sec=round(tok_s, 1),
               tflops=round(tflops, 1), mfu=round(tflops / 197.0, 4),
               heads=heads, B=B, S=S, remat=remat)
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    probe("base_h16_dh96_full_B8")
    probe("h12_dh128_full_B8", heads=12)
    probe("h12_dh128_selective_B8", heads=12, remat="selective")
    probe("h12_dh128_full_B16", heads=12, B=16)
    probe("h16_selective_B8", remat="selective")
    probe("h12_dh128_selective_B16", heads=12, remat="selective", B=16)
