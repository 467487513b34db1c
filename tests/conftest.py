"""Test config: force the CPU backend with 8 virtual devices so sharding
logic (dp/fsdp/tp/cp meshes) is exercised without TPU hardware, and so
tests don't contend for the single tunneled TPU chip.

NOTE: env vars (JAX_PLATFORMS) are overridden by the axon TPU plugin's
sitecustomize before conftest runs, so we must force the platform through
jax.config BEFORE any backend initializes. Mirrors the reference's
no-dist-init topology testing strategy (SURVEY.md §4:
fake_initialize_model_parallel)."""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: most of the suite's wall time is CPU
# compiles of conv/transformer graphs that are identical run-to-run (the
# 1-CPU gate host recompiles everything otherwise). Safe to share — keys
# include jaxlib version + flags.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
