"""nemo_tpu — a TPU-native (JAX/XLA/Pallas) speech & LLM framework.

Brand-new framework with the capabilities of NVIDIA NeMo (see SURVEY.md),
re-designed TPU-first: flax modules for models, pjit/shard_map over device
meshes for parallelism, Pallas kernels for hot ops, optax optimizers and
orbax-style checkpointing.

Layout (mirrors reference layer map, SURVEY.md §1):
  core/      — module base, config system, optimizers, LR schedulers, trainer
  ops/       — numerical ops & Pallas kernels (mel frontend, attention, CTC/RNNT)
  parallel/  — device mesh, sharding rules, collectives
  models/    — asr / tts / llm collections
  data/      — datasets, samplers, tokenizers
  utils/     — logging, exp manager, flops formulas
"""

__version__ = "0.1.0"
