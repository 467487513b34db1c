"""Decode throughput on the real chip: bf16 vs int8-resident PTQ serving.

Measures continuous-batching decode tokens/sec/chip (the serving hot loop:
one jitted step advancing every slot) for a ~1B-shape GPT at realistic
serving geometry, in bf16 and with `ptq(algorithm="int8_serve")` weights.
Decode at small batch is weight-HBM-bandwidth bound, so int8-resident
weights (half the bf16 bytes) bound the possible win at ~2×; this records
what the chip actually does.

Run: JAX_PLATFORMS=axon PYTHONPATH=/root/.axon_site:/root/repo \
     python scripts/decode_throughput.py [--layers 16] [--slots 8]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def run(quant: bool, layers: int, slots: int, max_len: int, steps: int,
        kv_int8: bool = False, chunk: int = 32, scan_layers: bool = True):
    import jax
    import jax.numpy as jnp

    from nemo_tpu.models.llm.config import _cfg
    from nemo_tpu.models.llm.generate import ContinuousBatchingEngine
    from nemo_tpu.models.llm.gpt import GPTModel
    import flax.linen as nn

    cfg = _cfg(
        num_layers=layers, hidden_size=2048, ffn_hidden_size=8192,
        num_attention_heads=16, kv_channels=128,
        vocab_size=32000, seq_length=max_len, scan_layers=scan_layers,
        attention_backend="xla",
    )
    model = GPTModel(cfg)
    tokens = jnp.zeros((1, 8), jnp.int32)
    params = nn.meta.unbox(model.init(jax.random.PRNGKey(0), tokens)["params"])
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    label = "bf16"
    if quant:
        from nemo_tpu.llm.api import ptq

        cfg, params = ptq(cfg, params, algorithm="int8_serve")
        label = "int8_ptq"
    else:
        params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
    params = jax.device_put(params)

    if kv_int8:
        label += "+kv8"
    # pin ONE kv-length bucket covering the whole run (prefill 48 + warmup
    # + timed steps): a bucket-boundary crossing mid-run recompiles inside
    # the timed region and poisons the number
    # ONE exact bucket covering the whole run (prefill 48 + warm chunk +
    # chain-start chunk + timed chunks): any bucket crossing mid-run
    # grows the pool and recompiles inside the timed region
    n_chunks = max(2, steps // chunk)
    kv_bucket = min(48 + chunk * (2 + n_chunks) + 2, max_len)
    eng = ContinuousBatchingEngine(
        cfg, params, max_slots=slots, max_len=max_len,
        prefill_buckets=(64,),
        kv_len_buckets=(min(kv_bucket, max_len),),
        cache_dtype=jnp.int8 if kv_int8 else jnp.bfloat16)
    rng = np.random.RandomState(0)
    for s in range(slots):
        eng.prefill_slot(s, rng.randint(1, 30000, 48).tolist())
    active = np.ones(slots, bool)
    feed = rng.randint(1, 30000, slots)
    # Multi-step decode: `chunk` tokens per host dispatch (one jitted scan;
    # decode_steps returns synced numpy, so each call is a full round-trip).
    # Warm the program, then time whole chunks; report the MEDIAN chunk
    # (host-load spikes and stray compiles show up as outliers).
    # PIPELINED protocol: begin chunk i+1 BEFORE fetching chunk i — the
    # device carry (tokens/cur_len/active) never leaves the chip between
    # dispatches, so the ~25 ms relay fetch RTT hides behind the next
    # chunk's execution. Warm both the program and the chain first.
    eng.decode_steps(feed, active, n_steps=chunk)  # compile + warm
    prev = eng.begin_decode_steps(n_steps=chunk, seed=1000)
    chunk_ts = []
    for i in range(n_chunks):
        t0 = time.perf_counter()
        nxt = eng.begin_decode_steps(n_steps=chunk, seed=i)
        toks, _, _ = eng.finish_decode_steps(prev)
        prev = nxt
        chunk_ts.append(time.perf_counter() - t0)
    eng.finish_decode_steps(prev)
    dt = float(np.median(chunk_ts)) * n_chunks
    n_steps = n_chunks * chunk
    tps = slots * n_steps / dt
    # HBM roofline: every decode step reads all weight bytes once (small-
    # batch decode is weight-bandwidth bound); v5e HBM ≈ 819 GB/s
    wbytes = sum(p.nbytes for p in jax.tree.leaves(eng.params))
    roofline_tps = slots / (wbytes / 819e9)
    # single-step reference point (the legacy per-token path)
    nxt = eng.decode_step(toks[-1], active)
    t0 = time.perf_counter()
    for i in range(16):
        nxt = eng.decode_step(np.asarray(nxt), active, seed=i)
    _ = int(np.asarray(nxt)[0])
    ms_single = (time.perf_counter() - t0) / 16 * 1e3
    return {
        "mode": label, "params_m": round(n_params / 1e6, 1),
        "slots": slots, "steps": n_steps, "chunk": chunk,
        "tokens_per_sec": round(tps, 1),
        "ms_per_step": round(1e3 * dt / n_steps, 2),
        "ms_per_step_unchunked": round(ms_single, 2),
        "weight_gb": round(wbytes / 1e9, 2),
        "roofline_tokens_per_sec": round(roofline_tps, 1),
        "vs_roofline": round(tps / roofline_tps, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--max-len", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--unroll", action="store_true",
                    help="unrolled layers (no lax.scan over the stack)")
    ap.add_argument("--modes", nargs="+",
                    default=["bf16", "int8_ptq", "int8_ptq+kv8"])
    args = ap.parse_args()
    for mode in args.modes:
        r = run(mode.startswith("int8_ptq"), args.layers, args.slots,
                args.max_len, args.steps, kv_int8=mode.endswith("+kv8"),
                chunk=args.chunk, scan_layers=not args.unroll)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
