"""Chip-measured feasibility numbers for multimodal recipes (VERDICT r5
item 7): run real train steps on the TPU for (a) gemma3vl_4b stage-1
(projector training under frozen towers — the reference neva/gemma3vl
finetune recipe's first stage) and (b) DiT-XL class-conditioned diffusion,
recording step time and HBM into scripts/hbm_validate_results.jsonl next
to the LLM pp-recipe entries.

Single-chip protocol: the recipes' multi-chip meshes don't exist here, so
each model runs at the largest single-chip micro-batch (bf16 params;
stage-1 freezing keeps optimizer state at projector-size via
optax.masked). An OOM compiler report is recorded as the measurement
bound, like scripts/hbm_validate.py does.

Run: JAX_PLATFORMS=axon PYTHONPATH=/root/.axon_site:/root/repo \
     python -u scripts/multimodal_chip_validate.py
"""

from __future__ import annotations

import dataclasses
import json
import re
import time

import numpy as np

RESULTS = "scripts/hbm_validate_results.jsonl"


def record(entry):
    with open(RESULTS, "a") as f:
        f.write(json.dumps(entry) + "\n")
    print(json.dumps(entry), flush=True)


def measure(name, fn):
    try:
        out = fn()
        record({"model": name, **out})
    except Exception as e:
        m = re.search(r"Used ([0-9.]+)G of ([0-9.]+)G", str(e))
        record({"model": name, "oom": True,
                "compiler_used_gb": float(m.group(1)) if m else None,
                "error": str(e)[:300]})


def gemma3vl_stage1(steps=5, B=1, S=512):
    import jax
    import jax.numpy as jnp

    from nemo_tpu.models.vlm.gemma3vl import gemma3vl_4b
    from nemo_tpu.models.vlm.train import VLMTrainModule

    cfg = gemma3vl_4b()
    cfg = dataclasses.replace(
        cfg,
        llm=dataclasses.replace(
            cfg.llm, params_dtype="bfloat16", compute_dtype="bfloat16",
            remat="full", seq_length=S),
        freeze_vision=True)
    mod = VLMTrainModule(cfg, freeze=("vision", "language"),
                         image_size=cfg.vision.image_size)
    state = mod.init_state(seed=0)
    rng = np.random.RandomState(0)
    n_img = cfg.tokens_per_image
    toks = rng.randint(0, 1000, (B, S))
    toks[:, 1:1 + n_img] = cfg.image_token_id
    batch = {
        "images": jnp.asarray(rng.rand(
            B, cfg.vision.image_size, cfg.vision.image_size, 3),
            jnp.float32),
        "tokens": jnp.asarray(toks, jnp.int32),
        "loss_mask": jnp.ones((B, S), jnp.float32),
    }
    state, m = mod.train_step(state, batch)  # compile
    loss0 = float(m["loss"])
    t0 = time.perf_counter()
    for i in range(steps):
        state, m = mod.train_step(state, batch)
    loss = float(m["loss"])  # syncs
    dt = (time.perf_counter() - t0) / steps
    stats = jax.local_devices()[0].memory_stats() or {}
    return {
        "stage": "gemma3vl_4b stage-1 projector (frozen towers, bf16)",
        "batch": B, "seq": S, "steps": steps,
        "step_time_s": round(dt, 3), "loss0": round(loss0, 3),
        "loss": round(loss, 3),
        "peak_hbm_gb": round(stats.get("peak_bytes_in_use", 0) / 1e9, 2)
        if stats else None,
    }


def dit_xl_train(steps=5, B=8):
    import jax
    import jax.numpy as jnp

    from nemo_tpu.models.diffusion.dit import DiTConfig
    from nemo_tpu.models.diffusion.train import DiffusionTrainModule

    cfg = DiTConfig(hidden_size=1152, num_layers=28, num_heads=16,
                    patch_size=2, input_size=32, in_channels=4,
                    num_classes=1000)
    mod = DiffusionTrainModule(cfg)
    state = mod.init_state(seed=0)
    rng = np.random.RandomState(0)
    batch = {
        "latents": jnp.asarray(rng.randn(B, 32, 32, 4), jnp.float32),
        "labels": jnp.asarray(rng.randint(0, 1000, (B,)), jnp.int32),
    }
    state, m = mod.train_step(state, batch, jax.random.PRNGKey(0))
    loss0 = float(m["loss"])
    t0 = time.perf_counter()
    for i in range(steps):
        state, m = mod.train_step(state, batch, jax.random.PRNGKey(i + 1))
    loss = float(m["loss"])
    dt = (time.perf_counter() - t0) / steps
    stats = jax.local_devices()[0].memory_stats() or {}
    return {
        "stage": "dit_xl class-conditioned (full train, Adam)",
        "batch": B, "latent": "32x32x4", "steps": steps,
        "step_time_s": round(dt, 3), "loss0": round(loss0, 3),
        "loss": round(loss, 3),
        "peak_hbm_gb": round(stats.get("peak_bytes_in_use", 0) / 1e9, 2)
        if stats else None,
    }


if __name__ == "__main__":
    measure("gemma3vl_4b", gemma3vl_stage1)
    measure("dit_xl", dit_xl_train)
