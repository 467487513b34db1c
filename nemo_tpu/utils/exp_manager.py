"""Experiment manager: run dirs, versioning, loggers, config dumps.

Reference parity: `nemo/utils/exp_manager.py:471` (exp_manager entry:
log-dir creation/versioning, rank-0 gating, config dumps, resume wiring)
and `:1224` (logger zoo: TensorBoard/WandB/MLflow/ClearML/DLLogger), plus
the early-stopping / EMA / step-timing config surface (`ExpManagerConfig`).

TPU-native shape: one duck-typed sink protocol — `log(step, metrics)` +
`close()` — fanned out by MetricsLogger; external trackers are optional
imports that degrade to a warning when the wheel is absent (this image has
none of them), so the same config runs anywhere.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, List, Optional

import jax

from nemo_tpu.core.config import ConfigDict, to_yaml
from nemo_tpu.utils.logging import add_file_handler, logging


class TensorBoardSink:
    def __init__(self, log_dir: str):
        from torch.utils.tensorboard import SummaryWriter

        self._tb = SummaryWriter(os.path.join(log_dir, "tb"))

    def log(self, step: int, metrics: Dict[str, float]):
        for k, v in metrics.items():
            self._tb.add_scalar(k, v, step)

    def close(self):
        self._tb.close()


class WandBSink:
    """Weights & Biases adapter (reference exp_manager.py create_wandb_logger
    + WandBLoggerParams: name/project/entity/tags/group/resume)."""

    def __init__(self, name: Optional[str] = None, project: Optional[str] = None,
                 entity: Optional[str] = None, save_dir: Optional[str] = None,
                 config: Optional[Dict] = None, **kwargs):
        import wandb  # optional dependency

        self._run = wandb.init(name=name, project=project, entity=entity,
                               dir=save_dir, config=config, **kwargs)

    def log(self, step: int, metrics: Dict[str, float]):
        self._run.log(metrics, step=step)

    def close(self):
        self._run.finish()


class MLflowSink:
    """MLflow adapter (reference MLFlowParams: experiment_name/tracking_uri/
    tags/run_name; logs batched metrics per step)."""

    def __init__(self, experiment_name: str = "nemo_tpu",
                 tracking_uri: Optional[str] = None,
                 run_name: Optional[str] = None,
                 tags: Optional[Dict] = None):
        import mlflow  # optional dependency

        self._mlflow = mlflow
        if tracking_uri:
            mlflow.set_tracking_uri(tracking_uri)
        mlflow.set_experiment(experiment_name)
        self._run = mlflow.start_run(run_name=run_name, tags=tags)

    def log(self, step: int, metrics: Dict[str, float]):
        self._mlflow.log_metrics(metrics, step=step)

    def close(self):
        self._mlflow.end_run()


class ClearMLSink:
    """ClearML adapter (reference ClearMLParams: project/task/tags)."""

    def __init__(self, project: str = "nemo_tpu", task: str = "train",
                 **kwargs):
        from clearml import Task  # optional dependency

        self._task = Task.init(project_name=project, task_name=task, **kwargs)
        self._logger = self._task.get_logger()

    def log(self, step: int, metrics: Dict[str, float]):
        for k, v in metrics.items():
            title, _, series = k.partition("/")
            self._logger.report_scalar(title, series or title, v, step)

    def close(self):
        self._task.close()


class MetricsLogger:
    """JSONL + fan-out to optional external sinks (TB/WandB/MLflow/ClearML).

    Every sink failure degrades to a warning — metric logging must never
    sink a training run (reference exp_manager error_checks philosophy)."""

    def __init__(self, log_dir: str, use_tensorboard: bool = True,
                 sinks: Optional[List[Any]] = None):
        self.log_dir = log_dir
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self.sinks: List[Any] = list(sinks or [])
        if use_tensorboard:
            try:
                self.sinks.append(TensorBoardSink(log_dir))
            except Exception:
                pass

    def log(self, step: int, metrics: Dict[str, Any]):
        row = {"step": step, "ts": time.time()}
        for k, v in metrics.items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                continue
        self._jsonl.write(json.dumps(row) + "\n")
        self._jsonl.flush()
        scalars = {k: v for k, v in row.items() if k not in ("step", "ts")}
        for sink in self.sinks:
            try:
                sink.log(step, scalars)
            except Exception as e:  # never fail the run on a logger
                logging.warning(f"metric sink {type(sink).__name__} failed: {e}")

    def close(self):
        self._jsonl.close()
        for sink in self.sinks:
            try:
                sink.close()
            except Exception:
                pass


def _optional_sink(factory, kind: str):
    try:
        return factory()
    except ImportError as e:
        logging.warning(f"create_{kind}_logger=True but the {kind} package "
                        f"is not installed — skipping ({e})")
    except Exception as e:
        logging.warning(f"{kind} logger init failed — skipping ({e})")
    return None


def exp_manager(
    exp_dir: str,
    name: str = "default",
    version: Optional[str] = None,
    cfg: Optional[ConfigDict] = None,
    use_tensorboard: bool = True,
    explicit_log_dir: Optional[str] = None,
    use_datetime_version: bool = False,
    # logger zoo (reference exp_manager.py:1224)
    create_wandb_logger: bool = False,
    wandb_logger_kwargs: Optional[Dict] = None,
    create_mlflow_logger: bool = False,
    mlflow_logger_kwargs: Optional[Dict] = None,
    create_clearml_logger: bool = False,
    clearml_logger_kwargs: Optional[Dict] = None,
    extra_sinks: Optional[List[Any]] = None,
    # trainer-callback config surface (reference ExpManagerConfig)
    create_early_stopping: Optional[Dict] = None,
    ema: Optional[Dict] = None,
    log_step_timing: bool = True,
    files_to_copy: Optional[List[str]] = None,
) -> Dict[str, Any]:
    """Create <exp_dir>/<name>/<version>/ with log file, config dump, a
    fan-out MetricsLogger, and configured trainer callbacks; returns
    {log_dir, logger, checkpoint_dir, callbacks}."""
    if explicit_log_dir:
        log_dir = explicit_log_dir
    else:
        if version is None:
            if use_datetime_version:
                version = time.strftime("%Y-%m-%d_%H-%M-%S")
            else:
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
        for src in files_to_copy or []:
            import shutil

            try:
                shutil.copy(src, log_dir)
            except OSError as e:
                logging.warning(f"files_to_copy: {src}: {e}")

    sinks: List[Any] = list(extra_sinks or [])
    if create_wandb_logger:
        kw = dict(wandb_logger_kwargs or {})
        kw.setdefault("save_dir", log_dir)
        if cfg is not None:
            kw.setdefault("config", cfg.to_dict() if hasattr(cfg, "to_dict") else dict(cfg))
        s = _optional_sink(lambda: WandBSink(**kw), "wandb")
        if s:
            sinks.append(s)
    if create_mlflow_logger:
        s = _optional_sink(lambda: MLflowSink(**(mlflow_logger_kwargs or {})), "mlflow")
        if s:
            sinks.append(s)
    if create_clearml_logger:
        s = _optional_sink(lambda: ClearMLSink(**(clearml_logger_kwargs or {})), "clearml")
        if s:
            sinks.append(s)

    logger = MetricsLogger(log_dir, use_tensorboard=use_tensorboard, sinks=sinks)
    ckpt_dir = os.path.join(log_dir, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)

    callbacks: List[Any] = []
    from nemo_tpu.core.callbacks import EarlyStopping, EMACallback, TimingCallback

    if log_step_timing:
        callbacks.append(TimingCallback())
    if create_early_stopping is not None:
        callbacks.append(EarlyStopping(**dict(create_early_stopping)))
    if ema is not None:
        callbacks.append(EMACallback(**dict(ema)))

    logging.info(f"exp_manager: logging to {log_dir}")
    return {"log_dir": log_dir, "logger": logger, "checkpoint_dir": ckpt_dir,
            "callbacks": callbacks}
