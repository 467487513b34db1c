"""AutoConfigurator + rampup batch size + fault-tolerance tests
(reference: llm/tools/auto_configurator, run/plugins.py FT plugin,
local_ckpt.py, MegatronDataSampler rampup)."""

import json
import os
import subprocess
import sys
import time

import numpy as np
import pytest

from nemo_tpu.data.gpt_dataset import MegatronPretrainingSampler
from nemo_tpu.llm.auto_configurator import (
    Candidate,
    estimate_hbm_gb,
    generate_configs,
    model_flops_per_token,
    recommend,
)
from nemo_tpu.models.llm.config import llama3_8b, llama31_405b, tiny_test
from nemo_tpu.utils.fault_tolerance import (
    HeartbeatCallback,
    heartbeat_age,
    run_with_restarts,
)


def test_autoconfig_8b_finds_feasible_v5e_pod():
    cfgs = generate_configs(llama3_8b(), num_chips=64, global_batch_size=512)
    assert cfgs, "no candidates generated"
    best = recommend(llama3_8b(), 64, 512)
    assert best is not None and best.feasible
    assert best.tp * best.fsdp * best.dp * best.cp == 64
    assert best.est_hbm_gb <= 16.0 * 0.92


def test_autoconfig_405b_needs_many_chips():
    """405B can't fit 8 v5e chips; a 1024-chip slice must yield a plan
    (fp32 state alone is ~4.9 TB → ≥ ~350 chips just for the optimizer)."""
    assert recommend(llama31_405b(), 8, 64) is None
    big = recommend(llama31_405b(), 1024, 1024)
    assert big is not None and big.feasible
    assert big.tp * big.fsdp >= 256


def test_autoconfig_memory_monotone_in_sharding():
    cfg = llama3_8b()
    m1 = estimate_hbm_gb(cfg, tp=1, fsdp=1, cp=1, micro_batch=1)
    m8 = estimate_hbm_gb(cfg, tp=8, fsdp=8, cp=1, micro_batch=1)
    assert m8 < m1 / 4
    assert model_flops_per_token(cfg) > 6 * 7e9  # ≥ 6·params


def test_rampup_batch_size_schedule():
    s = MegatronPretrainingSampler(
        total_samples=10000, global_batch_size=32, dp_rank=0, dp_size=1,
        rampup_batch_size=[8, 8, 96])  # 8 → 32 in +8 steps over 96 samples
    sizes = [len(b) for b in s]
    assert sizes[0] == 8
    assert sizes[-1] == 32
    # monotone non-decreasing and hits every increment
    assert all(a <= b for a, b in zip(sizes, sizes[1:]))
    assert {8, 16, 24, 32} <= set(sizes)
    # DP sharding divides the ramped GBS
    s2 = MegatronPretrainingSampler(
        total_samples=1000, global_batch_size=32, dp_rank=1, dp_size=2,
        rampup_batch_size=[8, 8, 96])
    b0 = next(iter(s2))
    assert len(b0) == 4  # 8 / dp2


def test_heartbeat_callback(tmp_path):
    hb = str(tmp_path / "hb.json")
    cb = HeartbeatCallback(hb, every=1)

    class T:
        global_step = 3

    cb.on_train_start(T())
    assert heartbeat_age(hb) < 5
    cb.on_step_end(T(), 3, {})
    with open(hb) as f:
        assert json.load(f)["step"] == 3


def test_run_with_restarts_recovers(tmp_path):
    """Child crashes twice (no state file) then succeeds — supervisor retries."""
    marker = tmp_path / "count.txt"
    script = tmp_path / "child.py"
    script.write_text(
        "import sys, os\n"
        f"p = {str(marker)!r}\n"
        "n = int(open(p).read()) if os.path.exists(p) else 0\n"
        "open(p, 'w').write(str(n + 1))\n"
        "sys.exit(0 if n >= 2 else 1)\n")
    rc = run_with_restarts([sys.executable, str(script)], max_restarts=3,
                           poll_interval=0.05)
    assert rc == 0
    assert marker.read_text() == "3"


def test_run_with_restarts_kills_hung_child(tmp_path):
    """Child writes one heartbeat then sleeps forever → watchdog restarts;
    second attempt exits clean."""
    hb = str(tmp_path / "hb.json")
    marker = tmp_path / "ran.txt"
    script = tmp_path / "hang.py"
    script.write_text(
        "import json, os, sys, time\n"
        f"hb, marker = {hb!r}, {str(marker)!r}\n"
        "first = not os.path.exists(marker)\n"
        "open(marker, 'a').write('x')\n"
        "json.dump({'step': 0, 'ts': time.time()}, open(hb, 'w'))\n"
        "if first:\n"
        "    time.sleep(600)\n"
        "sys.exit(0)\n")
    t0 = time.time()
    # hang_timeout must exceed interpreter startup on a loaded 1-CPU box
    rc = run_with_restarts([sys.executable, str(script)], max_restarts=2,
                           heartbeat_path=hb, hang_timeout=8.0, poll_interval=0.5)
    assert rc == 0
    assert time.time() - t0 < 120
    assert marker.read_text() == "xx"
