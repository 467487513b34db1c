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

# Raise the main-thread stack rlimit to 64 MB (Linux grows the main stack
# lazily up to the rlimit, so a runtime raise works). XLA:CPU's compiler
# recursion on the deepest programs in this suite — the pipeline-parallel
# MoE train steps under 8 virtual devices — can overflow the default 8 MB
# stack and SIGSEGV/SIGABRT *inside backend_compile*, killing the whole
# run (r03 flaky SIGABRT at test_gpipe_schedule_matches_1f1b; r04 SIGSEGV
# at test_1f1b_moe_aux_loss_matches_unpipelined, both mid-compile).
try:
    import resource

    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    _want = 64 << 20
    if _soft != resource.RLIM_INFINITY and _soft < _want:
        _new_soft = _want if _hard == resource.RLIM_INFINITY else min(_want, _hard)
        resource.setrlimit(resource.RLIMIT_STACK, (_new_soft, _hard))
except Exception:  # non-Linux or restricted env: keep defaults
    pass

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# NO persistent XLA compilation cache. Round 3 enabled one to speed up the
# suite; it was the root cause of the flaky SIGABRT in test_pipeline.py:
# XLA:CPU entries are AOT machine code whose cache key does NOT include the
# host CPU feature set, so entries compiled on a different gate host (the
# fleet is heterogeneous) execute illegal instructions → silent abort.
# Even same-host reloads trip cpu_aot_loader feature-mismatch errors on
# this jaxlib (XLA annotates compile features with +prefer-no-gather /
# +prefer-no-scatter, which never appear in host CPUID). Correctness over
# compile time: every run compiles fresh.


# Run each test's CALL phase on a fresh thread with a big PREALLOCATED
# stack. Raising RLIMIT_STACK alone is not enough: hours into a run the
# main thread's stack VMA cannot grow past later mmaps, so XLA:CPU's
# compiler recursion on the deepest pipeline/MoE programs still
# segfaults (reproduced at test_1f1b_moe_aux_loss_matches_unpipelined
# with the 64 MB rlimit in place). A worker thread's stack is allocated
# up front, so compile-depth never depends on process age.
import threading

import pytest


# IMPORTANT: pytest_runtest_call is NOT a firstresult hook, so a plain
# implementation that runs the test itself does not stop the default
# runner from running it AGAIN (the r04 conftest did exactly that: every
# test executed twice and 4+ tests failed deterministically on the second
# pass). The correct shape is a wrapper that swaps item.runtest for the
# threaded version and yields — the default runner then calls OUR runtest
# exactly once, on the big-stack worker thread.
@pytest.hookimpl(wrapper=True)
def pytest_runtest_call(item):
    orig_runtest = item.runtest

    def threaded_runtest():
        result: dict = {}

        def run():
            try:
                orig_runtest()
            except BaseException as e:  # noqa: BLE001 — re-raised below
                result["exc"] = e

        threading.stack_size(512 << 20)
        try:
            t = threading.Thread(target=run, name=f"test:{item.name}")
            t.start()
            t.join()
        finally:
            threading.stack_size(0)
        if "exc" in result:
            raise result["exc"]

    item.runtest = threaded_runtest
    try:
        return (yield)
    finally:
        item.runtest = orig_runtest
