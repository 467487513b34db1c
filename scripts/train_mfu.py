"""Measure GPT training throughput/MFU on the real TPU chip: bf16 vs fp8.

VERDICT r2 #3: fp8 existed only as a CPU-parity-tested GEMM path; the
reference's headline numbers are fp8 (BASELINE.md, TE fp8 'hybrid'
recipe). This records chip-measured fp8 vs bf16 tokens/sec + MFU and a
loss-curve overlay on the same data/seed, so the fp8 row is a measured
claim, not a unit-test claim.

Run: JAX_PLATFORMS=axon PYTHONPATH=/root/.axon_site:/root/repo \
     python scripts/train_mfu.py [--steps 500] [--quant fp8 bf16]

Notes on v5e: the MXU has native bf16 and int8 pipes; fp8 matmuls are
XLA-emulated (upcast) so fp8 numerics come WITHOUT an fp8-speed pipe —
the measurement records whatever the chip actually does.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def make_cfg(quantization=None, seq_length=2048, heads=12):
    from nemo_tpu.models.llm.config import _cfg

    # ~540M-param GPT: 16 L, d=1536, ffn 6144, 12 heads × dh=128.
    # head_dim=128 (not the r2 config's 16×96) is the TPU-native choice:
    # the flash kernel tiles heads onto the 128-lane MXU, so dh=96 pads
    # to 128 and throws away 1/4 of the attention work — measured +17%
    # step throughput from this change alone (scripts/mfu_probe.py:
    # 19.9k → 23.3k tok/s, 45.9% → 53.5% MFU at 80 steps).
    return _cfg(
        num_layers=16, hidden_size=1536, ffn_hidden_size=6144,
        num_attention_heads=heads, num_query_groups=heads, vocab_size=32768,
        seq_length=seq_length, compute_dtype="bfloat16",
        attention_backend="flash", remat="full",
        quantization=quantization,
    )


def make_cfg_1b(seq_length=2048):
    """llama3.2-1B geometry (the ≥1B single-chip MFU point, VERDICT r5
    item 5): 1.24B params. Adam fp32 m+v (~10 GB) would not fit next to
    fp32 params on a 16 GB chip, so run() pairs this with adafactor
    (factored second moment — the HBM model's predicted fit)."""
    from nemo_tpu.models.llm.config import llama32_1b

    return llama32_1b(
        seq_length=seq_length, compute_dtype="bfloat16",
        attention_backend="flash", remat="full", scan_layers=True)


def run(quantization, steps, B, S, seed=0, chunk=100, model="551m"):
    import jax
    import jax.numpy as jnp
    import optax

    from nemo_tpu.models.llm.train import GPTTrainModule
    from nemo_tpu.parallel.mesh import MeshConfig
    from nemo_tpu.llm.auto_configurator import model_flops_per_token

    if model == "llama32_1b":
        cfg = make_cfg_1b(seq_length=S)
        opt = optax.chain(optax.clip_by_global_norm(1.0),
                          optax.adafactor(3e-4))
        mod = GPTTrainModule(cfg, mesh_cfg=MeshConfig(dp=1), optimizer=opt)
    else:
        cfg = make_cfg(quantization, seq_length=S)
        mod = GPTTrainModule(cfg, mesh_cfg=MeshConfig(dp=1))
    state = mod.init_state(seed=seed)
    step_fn = mod.train_step_jit()

    rng = np.random.RandomState(seed)
    n_batches = 128  # large cycle: avoids memorization collapse in the
    # loss overlay AND defeats relay caches (distinct inputs per step)
    batches = [
        {
            "tokens": jnp.asarray(rng.randint(0, cfg.vocab_size, (B, S)), jnp.int32),
            "labels": jnp.asarray(rng.randint(0, cfg.vocab_size, (B, S)), jnp.int32),
        }
        for _ in range(n_batches)
    ]
    key = jax.random.PRNGKey(seed)

    losses = []
    # warmup / compile
    state, m = step_fn(state, batches[0], key)
    _ = float(m["loss"])

    t0 = time.perf_counter()
    done = 1
    while done < steps:
        state, m = step_fn(state, batches[done % n_batches], key)
        if done % chunk == 0 or done == steps - 1:
            losses.append((done, float(m["loss"])))  # also syncs
        done += 1
    _ = float(m["loss"])
    t1 = time.perf_counter()

    toks = B * S * (steps - 1)
    tok_s = toks / (t1 - t0)
    flops_tok = model_flops_per_token(cfg)
    tflops = tok_s * flops_tok / 1e12
    return dict(
        quant=quantization or "bf16", tokens_per_sec=round(tok_s, 1),
        tflops_per_sec=round(tflops, 1),
        mfu_vs_bf16_peak=round(tflops / 197.0, 4),
        steps=steps, batch=B, seq=S,
        losses=losses,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--quant", nargs="+", default=["bf16", "fp8"])
    ap.add_argument("--model", default="551m",
                    choices=["551m", "llama32_1b"])
    args = ap.parse_args()

    results = {}
    for q in args.quant:
        r = run(None if q == "bf16" else q, args.steps, args.batch,
                args.seq, model=args.model)
        results[q] = r
        print(json.dumps({k: v for k, v in r.items() if k != "losses"}), flush=True)
    if "bf16" in results and "fp8" in results:
        lb = dict(results["bf16"]["losses"])
        lf = dict(results["fp8"]["losses"])
        common = sorted(set(lb) & set(lf))
        if common:
            last = common[-1]
            rel = abs(lf[last] - lb[last]) / max(abs(lb[last]), 1e-9)
            print(json.dumps({
                "fp8_vs_bf16_loss_at_step": last,
                "bf16_loss": round(lb[last], 4), "fp8_loss": round(lf[last], 4),
                "rel_diff": round(rel, 4),
                "speedup": round(results["fp8"]["tokens_per_sec"]
                                 / results["bf16"]["tokens_per_sec"], 3),
            }))


if __name__ == "__main__":
    main()
