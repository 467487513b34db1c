"""Launcher (multi-process bootstrap env, auto-restart, slurm script) and
remote-path staging (mem:// backend exercising the s3/msc plumbing)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from nemo_tpu.parallel.launcher import LocalLauncher, slurm_script


def test_launcher_env_wiring_and_bootstrap_state(tmp_path):
    """Each spawned process must see its rank env and be able to configure
    jax's distributed global state from it (cluster formation itself needs
    real multi-host networking; the state wiring is what we own)."""
    worker = tmp_path / "w.py"
    worker.write_text(
        "import os, json, sys\n"
        "out = {k: os.environ[k] for k in\n"
        "       ('NEMO_TPU_COORDINATOR','NEMO_TPU_NUM_PROCESSES',"
        "'NEMO_TPU_PROCESS_ID')}\n"
        f"open(r'{tmp_path}/rank' + os.environ['NEMO_TPU_PROCESS_ID'] + "
        "'.json','w').write(json.dumps(out))\n"
    )
    rc = LocalLauncher(num_processes=2, coordinator_port=29912).run([str(worker)])
    assert rc == 0
    import json

    r0 = json.loads((tmp_path / "rank0.json").read_text())
    r1 = json.loads((tmp_path / "rank1.json").read_text())
    assert r0["NEMO_TPU_NUM_PROCESSES"] == "2"
    assert {r0["NEMO_TPU_PROCESS_ID"], r1["NEMO_TPU_PROCESS_ID"]} == {"0", "1"}
    assert r0["NEMO_TPU_COORDINATOR"].endswith(":29912")


def test_launcher_auto_restart(tmp_path):
    """FT launcher: job fails twice then succeeds; launcher restarts."""
    marker = tmp_path / "attempts"
    worker = tmp_path / "flaky.py"
    worker.write_text(
        "import os, sys\n"
        f"p = r'{marker}'\n"
        "n = int(open(p).read()) if os.path.exists(p) else 0\n"
        "open(p, 'w').write(str(n + 1))\n"
        "sys.exit(0 if n >= 2 else 1)\n"
    )
    lau = LocalLauncher(num_processes=1, max_restarts=3, restart_backoff_s=0.0)
    rc = lau.run([str(worker)])
    assert rc == 0
    assert int(marker.read_text()) == 3  # two failures + one success


def test_launcher_gives_up(tmp_path):
    worker = tmp_path / "bad.py"
    worker.write_text("import sys; sys.exit(7)\n")
    lau = LocalLauncher(num_processes=1, max_restarts=1, restart_backoff_s=0.0)
    assert lau.run([str(worker)]) == 7


def test_slurm_script_contents():
    s = slurm_script("llama3-pretrain", "python -m nemo_tpu.cli llm pretrain",
                     nodes=4, account="acct", partition="tpu",
                     env={"TOKENIZERS_PARALLELISM": "false"})
    assert "#SBATCH --nodes=4" in s
    assert "NEMO_TPU_NUM_PROCESSES=$SLURM_NNODES" in s
    assert "NEMO_TPU_PROCESS_ID=$SLURM_PROCID" in s
    assert "srun python -m nemo_tpu.cli llm pretrain" in s
    assert "export TOKENIZERS_PARALLELISM=false" in s


def test_model_save_restore_via_remote_url(tmp_path):
    from nemo_tpu.core.config import ConfigDict
    from nemo_tpu.models.asr.configs import quartznet_tiny
    from nemo_tpu.models.asr.ctc_models import EncDecCTCModel
    from nemo_tpu.utils.remote_paths import _BACKENDS

    m = EncDecCTCModel(quartznet_tiny())
    url = "mem://bucket/models/qn.ntpu"
    m.save_to(url)
    assert _BACKENDS["mem"].exists(url)

    m2 = EncDecCTCModel.restore_from(url)
    import jax

    a = jax.tree.leaves(m.variables)
    b = jax.tree.leaves(m2.variables)
    assert all(np.allclose(np.asarray(x), np.asarray(y)) for x, y in zip(a, b))


def test_s3_backend_clear_error_without_boto3():
    from nemo_tpu.utils.remote_paths import S3Backend

    with pytest.raises(RuntimeError, match="boto3"):
        S3Backend().put(__file__, "s3://bucket/key")
