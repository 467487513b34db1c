"""Experiment manager: run dirs, versioning, loggers, config dumps.

Reference parity: `nemo/utils/exp_manager.py:471` — log-dir creation/
versioning, rank-0 gating, config dumps, TB/CSV loggers, resume wiring.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import jax

from nemo_tpu.core.config import ConfigDict, to_yaml
from nemo_tpu.utils.logging import add_file_handler, logging


class MetricsLogger:
    """JSONL + optional TensorBoard metric sink."""

    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        self.log_dir = log_dir
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(log_dir, "tb"))
            except Exception:
                self._tb = None

    def log(self, step: int, metrics: Dict[str, Any]):
        row = {"step": step, "ts": time.time()}
        for k, v in metrics.items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                continue
        self._jsonl.write(json.dumps(row) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in row.items():
                if k not in ("step", "ts"):
                    self._tb.add_scalar(k, v, step)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


def exp_manager(
    exp_dir: str,
    name: str = "default",
    version: Optional[str] = None,
    cfg: Optional[ConfigDict] = None,
    use_tensorboard: bool = True,
) -> Dict[str, Any]:
    """Create <exp_dir>/<name>/<version>/ with log file, config dump and a
    MetricsLogger; returns {log_dir, logger, checkpoint_dir}."""
    if version is None:
        existing = []
        base = os.path.join(exp_dir, name)
        if os.path.isdir(base):
            for d in os.listdir(base):
                if d.startswith("version_") and d[8:].isdigit():
                    existing.append(int(d[8:]))
        version = f"version_{max(existing) + 1 if existing else 0}"
    log_dir = os.path.join(exp_dir, name, version)
    os.makedirs(log_dir, exist_ok=True)

    if jax.process_index() == 0:
        add_file_handler(os.path.join(log_dir, f"nemo_tpu_rank{jax.process_index()}.log"))
        if cfg is not None:
            with open(os.path.join(log_dir, "config.yaml"), "w") as f:
                f.write(to_yaml(cfg))
    logger = MetricsLogger(log_dir, use_tensorboard=use_tensorboard)
    ckpt_dir = os.path.join(log_dir, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    logging.info(f"exp_manager: logging to {log_dir}")
    return {"log_dir": log_dir, "logger": logger, "checkpoint_dir": ckpt_dir}
