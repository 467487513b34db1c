"""Multi-process launch + distributed bootstrap (ProcessLauncher analog).

Reference parity:
- `nemo/core/utils/process_launcher/launcher.py` (ProcessLauncher: spawn one
  process per device with env-configured ranks)
- `nemo/lightning/run/plugins.py` FaultTolerancePlugin (auto-restarting
  launcher) and nemo_run's local/slurm executors.

TPU-native stance: JAX is single-controller per HOST (one process drives all
local chips), so the launcher is per-host, not per-device. Cluster formation
is `jax.distributed.initialize` — on Cloud TPU pods the arguments are
auto-detected from the metadata server; elsewhere they come from env vars
(NEMO_TPU_COORDINATOR / NUM_PROCESSES / PROCESS_ID, or the standard
JAX_COORDINATOR_ADDRESS family).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

from nemo_tpu.utils.logging import logging as log

_ENV_COORD = ("NEMO_TPU_COORDINATOR", "JAX_COORDINATOR_ADDRESS")
_ENV_NPROC = ("NEMO_TPU_NUM_PROCESSES", "JAX_NUM_PROCESSES")
_ENV_PID = ("NEMO_TPU_PROCESS_ID", "JAX_PROCESS_ID")


def _env_first(names: Sequence[str]) -> Optional[str]:
    for n in names:
        v = os.environ.get(n)
        if v is not None:
            return v
    return None


def bootstrap_from_env(timeout_s: int = 300) -> bool:
    """Initialize `jax.distributed` for multi-host runs.

    Returns True if a multi-process cluster was formed; False for
    single-process (no env present — the common 1-host case). On Cloud TPU
    pods with no env set, falls back to JAX's own auto-detection.
    """
    import jax

    coord = _env_first(_ENV_COORD)
    nproc = _env_first(_ENV_NPROC)
    pid = _env_first(_ENV_PID)
    if coord is None and nproc is None:
        # on TPU pods jax auto-detects; initialize() is a no-op elsewhere.
        try:
            jax.distributed.initialize(initialization_timeout=timeout_s)
            return jax.process_count() > 1
        except Exception:
            return False
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(nproc) if nproc else None,
        process_id=int(pid) if pid else None,
        initialization_timeout=timeout_s,
    )
    return True


@dataclass
class LocalLauncher:
    """Spawn N host processes of a training script with rank env set, with
    fault-tolerant auto-restart (reference FaultTolerancePlugin
    `run/plugins.py:92`: restart the job up to max_restarts on failure)."""

    num_processes: int = 1
    coordinator_port: int = 12955
    max_restarts: int = 0
    restart_backoff_s: float = 1.0
    extra_env: Dict[str, str] = field(default_factory=dict)

    def _env_for(self, rank: int) -> Dict[str, str]:
        env = dict(os.environ)
        env.update(self.extra_env)
        env["NEMO_TPU_COORDINATOR"] = f"127.0.0.1:{self.coordinator_port}"
        env["NEMO_TPU_NUM_PROCESSES"] = str(self.num_processes)
        env["NEMO_TPU_PROCESS_ID"] = str(rank)
        return env

    def run(self, argv: Sequence[str]) -> int:
        """Run `python argv...` × num_processes; restart the whole gang on
        failure up to max_restarts. Returns the final exit code."""
        attempt = 0
        while True:
            procs: List[subprocess.Popen] = []
            for rank in range(self.num_processes):
                procs.append(subprocess.Popen(
                    [sys.executable, *argv], env=self._env_for(rank)))
            rcs = [p.wait() for p in procs]
            if all(rc == 0 for rc in rcs):
                return 0
            attempt += 1
            if attempt > self.max_restarts:
                log.error(f"launcher: giving up after {attempt - 1} restarts "
                          f"(rcs={rcs})")
                return max(rcs)
            log.warning(f"launcher: restart {attempt}/{self.max_restarts} "
                        f"(rcs={rcs})")
            time.sleep(self.restart_backoff_s)


def slurm_script(
    job_name: str,
    command: str,
    nodes: int = 1,
    time_limit: str = "04:00:00",
    account: Optional[str] = None,
    partition: Optional[str] = None,
    container_image: Optional[str] = None,
    env: Optional[Dict[str, str]] = None,
) -> str:
    """Emit an sbatch script for a multi-host run (nemo_run SlurmExecutor
    analog, `run/plugins.py` + nemo_run docs). One task per node; ranks wired
    into the NEMO_TPU_* bootstrap env from SLURM variables."""
    lines = [
        "#!/bin/bash",
        f"#SBATCH --job-name={job_name}",
        f"#SBATCH --nodes={nodes}",
        "#SBATCH --ntasks-per-node=1",
        f"#SBATCH --time={time_limit}",
    ]
    if account:
        lines.append(f"#SBATCH --account={account}")
    if partition:
        lines.append(f"#SBATCH --partition={partition}")
    lines.append("")
    for k, v in (env or {}).items():
        lines.append(f"export {k}={v}")
    lines += [
        'MASTER=$(scontrol show hostnames "$SLURM_JOB_NODELIST" | head -n1)',
        "export NEMO_TPU_COORDINATOR=${MASTER}:12955",
        "export NEMO_TPU_NUM_PROCESSES=$SLURM_NNODES",
        "export NEMO_TPU_PROCESS_ID=$SLURM_PROCID",
    ]
    run = command
    if container_image:
        run = f"srun --container-image={container_image} {command}"
    else:
        run = f"srun {command}"
    lines.append(run)
    return "\n".join(lines) + "\n"
