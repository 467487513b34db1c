"""exp_manager: versioned dirs, logger zoo fan-out (fake wandb/mlflow
modules — the wheels are absent by design), callback config surface
(reference nemo/utils/exp_manager.py:471,1224)."""

import json
import os
import sys
import types

import numpy as np
import pytest

from nemo_tpu.core.config import ConfigDict
from nemo_tpu.utils.exp_manager import MetricsLogger, exp_manager


def test_exp_manager_versioned_dirs(tmp_path):
    r1 = exp_manager(str(tmp_path), name="run", use_tensorboard=False)
    r2 = exp_manager(str(tmp_path), name="run", use_tensorboard=False)
    assert r1["log_dir"].endswith("version_0")
    assert r2["log_dir"].endswith("version_1")
    assert os.path.isdir(r1["checkpoint_dir"])
    r1["logger"].log(1, {"loss": 2.5, "skip_me": "not-a-number"})
    r1["logger"].close()
    rows = [json.loads(l) for l in
            open(os.path.join(r1["log_dir"], "metrics.jsonl"))]
    assert rows[0]["loss"] == 2.5 and "skip_me" not in rows[0]


def test_exp_manager_explicit_dir_and_config_dump(tmp_path):
    d = str(tmp_path / "explicit")
    r = exp_manager(str(tmp_path), explicit_log_dir=d,
                    cfg=ConfigDict(lr=0.1), use_tensorboard=False)
    assert r["log_dir"] == d
    assert os.path.exists(os.path.join(d, "config.yaml"))


def test_wandb_sink_via_fake_module(tmp_path, monkeypatch):
    """create_wandb_logger=True routes metrics into wandb.init().log()
    (reference exp_manager create_wandb_logger/WandBLoggerParams)."""
    calls = {"init": None, "log": [], "finish": 0}

    class FakeRun:
        def log(self, metrics, step=None):
            calls["log"].append((step, dict(metrics)))

        def finish(self):
            calls["finish"] += 1

    fake = types.ModuleType("wandb")

    def init(**kw):
        calls["init"] = kw
        return FakeRun()

    fake.init = init
    monkeypatch.setitem(sys.modules, "wandb", fake)

    r = exp_manager(str(tmp_path), name="wb", use_tensorboard=False,
                    create_wandb_logger=True,
                    wandb_logger_kwargs={"project": "p1", "name": "n1"},
                    cfg=ConfigDict(lr=0.5))
    assert calls["init"]["project"] == "p1"
    r["logger"].log(3, {"loss": 1.25})
    r["logger"].close()
    assert calls["log"] == [(3, {"loss": 1.25})]
    assert calls["finish"] == 1


def test_mlflow_sink_via_fake_module(tmp_path, monkeypatch):
    calls = {"metrics": [], "experiment": None, "ended": 0}
    fake = types.ModuleType("mlflow")
    fake.set_experiment = lambda n: calls.__setitem__("experiment", n)
    fake.set_tracking_uri = lambda u: None
    fake.start_run = lambda run_name=None, tags=None: None
    fake.log_metrics = lambda m, step=None: calls["metrics"].append((step, m))
    fake.end_run = lambda: calls.__setitem__("ended", calls["ended"] + 1)
    monkeypatch.setitem(sys.modules, "mlflow", fake)

    r = exp_manager(str(tmp_path), name="mf", use_tensorboard=False,
                    create_mlflow_logger=True,
                    mlflow_logger_kwargs={"experiment_name": "exp9"})
    assert calls["experiment"] == "exp9"
    r["logger"].log(7, {"wer": 0.25})
    r["logger"].close()
    assert calls["metrics"] == [(7, {"wer": 0.25})]
    assert calls["ended"] == 1


def test_missing_tracker_degrades_to_warning(tmp_path):
    """The wheels are absent in this image: requesting the loggers must not
    raise — the run proceeds with JSONL only."""
    r = exp_manager(str(tmp_path), name="nolib", use_tensorboard=False,
                    create_wandb_logger=True, create_clearml_logger=True)
    r["logger"].log(1, {"loss": 1.0})
    r["logger"].close()
    assert not r["logger"].sinks  # nothing attached, nothing raised


def test_sink_failure_never_sinks_the_run(tmp_path):
    class Exploding:
        def log(self, step, metrics):
            raise RuntimeError("boom")

        def close(self):
            raise RuntimeError("boom")

    lg = MetricsLogger(str(tmp_path), use_tensorboard=False,
                       sinks=[Exploding()])
    lg.log(1, {"loss": 1.0})  # must not raise
    lg.close()


def test_exp_manager_callbacks_surface(tmp_path):
    from nemo_tpu.core.callbacks import EarlyStopping, EMACallback

    r = exp_manager(str(tmp_path), name="cb", use_tensorboard=False,
                    create_early_stopping={"monitor": "val_loss",
                                           "patience": 3},
                    ema={"decay": 0.99})
    kinds = [type(c).__name__ for c in r["callbacks"]]
    assert "EarlyStopping" in kinds and "EMACallback" in kinds
    es = next(c for c in r["callbacks"] if isinstance(c, EarlyStopping))
    assert es.monitor == "val_loss" and es.patience == 3
    ema = next(c for c in r["callbacks"] if isinstance(c, EMACallback))
    assert ema.decay == 0.99
