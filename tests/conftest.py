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


# -- full-suite subprocess sharding ----------------------------------------
# XLA:CPU's JIT segfaults mid-compile after ~300 tests' worth of live
# compiled programs accumulate in one process (r5: reproduced twice at
# different tests — test_moe and test_lm_eval_harness — both inside
# backend_compile, both after ~300 green tests; a 4000-compile single-
# process stress probe with released programs does NOT crash, so the
# trigger is accumulated LIVE programs, not compile count). Mitigation:
# when a run collects a large item count (the full gate), execute it as
# per-module subprocess groups — each process stays far below the
# crash threshold. Small runs (single modules, -k selections) behave
# exactly as before. Disable with NEMO_TPU_NO_SHARD=1.

import os as _os
import subprocess as _subprocess
import sys as _sys

_SHARD_THRESHOLD = 250
_GROUP_TESTS = 120  # target tests per subprocess


def pytest_runtestloop(session):
    if (_os.environ.get("NEMO_TPU_NO_SHARD")
            or _os.environ.get("_NEMO_TPU_SHARD_CHILD")
            or len(session.items) < _SHARD_THRESHOLD
            or session.config.getoption("collectonly", False)):
        return None  # default loop

    # group items by module file, preserving order
    modules = []
    counts = {}
    for item in session.items:
        path = str(item.fspath)
        if path not in counts:
            counts[path] = 0
            modules.append(path)
        counts[path] += 1

    groups = []
    cur, n = [], 0
    for mod in modules:
        cur.append(mod)
        n += counts[mod]
        if n >= _GROUP_TESTS:
            groups.append(cur)
            cur, n = [], 0
    if cur:
        groups.append(cur)

    exitfirst = session.config.getoption("exitfirst", False)
    env = dict(_os.environ)
    env["_NEMO_TPU_SHARD_CHILD"] = "1"
    failed = 0
    print(f"\n[conftest] sharding {len(session.items)} tests across "
          f"{len(groups)} subprocess groups (XLA:CPU JIT segfault "
          f"mitigation)", flush=True)
    markexpr = session.config.getoption("markexpr", "")
    keyword = session.config.getoption("keyword", "")
    for gi, group in enumerate(groups):
        cmd = [_sys.executable, "-m", "pytest", "-q", "-p",
               "no:cacheprovider", *group]
        if exitfirst:
            cmd.append("-x")
        if markexpr:  # forward CLI -m (addopts alone would override it)
            cmd += ["-m", markexpr]
        if keyword:
            cmd += ["-k", keyword]
        print(f"[conftest] group {gi + 1}/{len(groups)}: "
              f"{len(group)} modules", flush=True)
        rc = _subprocess.call(cmd, env=env)
        if rc != 0:
            failed += 1
            if exitfirst:
                break
    session.testsfailed = failed
    if failed:
        session.config.hook.pytest_deselected(items=[])  # no-op, keeps API
    return True  # skip the default loop
