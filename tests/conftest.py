"""Test config: force CPU backend with 8 virtual devices so sharding
logic (dp/fsdp/tp/cp meshes) is exercised without TPU hardware.
Mirrors the reference's no-dist-init topology testing strategy
(SURVEY.md §4: fake_initialize_model_parallel)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
