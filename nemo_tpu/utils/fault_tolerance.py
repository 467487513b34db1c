"""Fault tolerance: heartbeat, hang watchdog, auto-restart supervisor,
node-local checkpoints.

Reference parity: the FT launcher plugin
(`nemo/lightning/run/plugins.py:92` FaultTolerancePlugin — nvidia-resiliency-ext
heartbeats + automatic in-job restarts) and node-local checkpointing
(`nemo/lightning/pytorch/local_ckpt.py`).

TPU-native shape: a single-controller process writes an atomic heartbeat
file per train step; an external supervisor (`run_with_restarts`) relaunches
the training command on crash OR on stale heartbeat (hang). Local
checkpoints reuse CheckpointIO against a node-local directory at a higher
cadence than the durable top-k checkpoints.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time
from typing import Dict, List, Optional, Sequence

from nemo_tpu.core.callbacks import Callback
from nemo_tpu.utils.logging import logging


class HeartbeatCallback(Callback):
    """Writes {step, ts} to <path> atomically every `every` steps; a
    supervisor treats a stale file as a hang."""

    def __init__(self, path: str, every: int = 1):
        self.path = path
        self.every = max(1, every)

    def _write(self, step: int):
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"step": int(step), "ts": time.time()}, f)
        os.replace(tmp, self.path)

    def on_train_start(self, trainer):
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        self._write(-1)

    def on_step_end(self, trainer, step, metrics):
        if step % self.every == 0:
            self._write(step)

    def on_train_end(self, trainer):
        self._write(int(getattr(trainer, "global_step", -1)))


def heartbeat_age(path: str) -> Optional[float]:
    """Seconds since the last heartbeat; None if no heartbeat yet."""
    try:
        with open(path) as f:
            return time.time() - json.load(f)["ts"]
    except (OSError, ValueError, KeyError):
        return None


class LocalCheckpointCallback(Callback):
    """High-cadence node-local checkpoints (reference local_ckpt.py):
    cheap scratch-disk saves every `every` steps, keep-last-1, separate
    from the durable exp-dir checkpoints. On restart, AutoResume should
    prefer this dir when its step is newer."""

    def __init__(self, local_dir: str, every: int = 50):
        from nemo_tpu.core.checkpoint import CheckpointIO

        self.io = CheckpointIO(local_dir, keep_top_k=1)
        self.every = max(1, every)

    def on_step_end(self, trainer, step, metrics):
        if step > 0 and step % self.every == 0 and trainer.state is not None:
            self.io.save(trainer.state, step)


def run_with_restarts(
    argv: Sequence[str],
    *,
    max_restarts: int = 3,
    heartbeat_path: Optional[str] = None,
    hang_timeout: float = 600.0,
    poll_interval: float = 5.0,
    env: Optional[Dict[str, str]] = None,
) -> int:
    """Supervise a training command: restart on nonzero exit; kill+restart
    when the heartbeat goes stale (hang). Returns the final exit code.
    The child is expected to AutoResume from its checkpoints."""
    restarts = 0
    while True:
        logging.info(f"[ft] launching (attempt {restarts + 1}): {' '.join(argv)}")
        proc = subprocess.Popen(list(argv), env={**os.environ, **(env or {})})
        launch_ts = time.time()
        hung = False
        while True:
            rc = proc.poll()
            if rc is not None:
                break
            if heartbeat_path:
                age = heartbeat_age(heartbeat_path)
                # staleness clock resets at launch: a leftover heartbeat from
                # the previous attempt must not kill a fresh child
                if age is not None:
                    age = min(age, time.time() - launch_ts)
                if age is not None and age > hang_timeout:
                    logging.error(f"[ft] heartbeat stale ({age:.0f}s) — killing child")
                    proc.send_signal(signal.SIGTERM)
                    try:
                        proc.wait(timeout=30)
                    except subprocess.TimeoutExpired:
                        proc.kill()
                        proc.wait()
                    hung = True
                    rc = proc.returncode
                    break
            time.sleep(poll_interval)
        if rc == 0 and not hung:
            logging.info("[ft] child completed cleanly")
            return 0
        restarts += 1
        if restarts > max_restarts:
            logging.error(f"[ft] giving up after {max_restarts} restarts (rc={rc})")
            return rc if rc is not None else 1
        logging.warning(f"[ft] child {'hung' if hung else f'exited rc={rc}'} — restarting")
