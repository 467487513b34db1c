"""Trainer callback bus + standard callbacks.

Reference parity: the CallbackConnector event bus
(`nemo/lightning/megatron_parallel.py:930` on_megatron_step_start/... )
and the callback zoo (`nemo/lightning/pytorch/callbacks/`): TimingCallback,
FLOPsMeasurementCallback (flops_callback.py:48), PreemptionCallback
(preemption.py:29, SIGTERM → save+stop), GarbageCollectionCallback,
ProgressPrinter.
"""

from __future__ import annotations

import gc
import signal
import time
from typing import Any, Dict, List, Optional

from nemo_tpu.utils.logging import logging


class Callback:
    def on_train_start(self, trainer):
        pass

    def on_step_start(self, trainer, step: int):
        pass

    def on_step_end(self, trainer, step: int, metrics: Dict[str, Any]):
        pass

    def on_validation(self, trainer, step: int, metrics: Dict[str, Any]):
        pass

    def on_checkpoint(self, trainer, step: int, path: str):
        pass

    def on_train_end(self, trainer):
        pass


class TimingCallback(Callback):
    """Per-step wall time → metrics (reference exp_manager.py:297)."""

    def __init__(self, window: int = 20):
        self._t0 = None
        self._times: List[float] = []
        self.window = window

    def on_step_start(self, trainer, step):
        self._t0 = time.perf_counter()

    def on_step_end(self, trainer, step, metrics):
        if self._t0 is not None:
            dt = time.perf_counter() - self._t0
            self._times.append(dt)
            self._times = self._times[-self.window :]
            metrics["step_time"] = dt
            metrics["step_time_avg"] = sum(self._times) / len(self._times)


class FLOPsMeasurementCallback(Callback):
    """TFLOP/s/chip from closed-form formulas (reference flops_callback.py:48)."""

    def __init__(self, model_name: str, flops_cfg, n_chips: int = 1):
        from nemo_tpu.utils.flops_formulas import FLOPS_FORMULAS

        self.flops_per_batch = FLOPS_FORMULAS[model_name](flops_cfg)
        self.n_chips = n_chips

    def on_step_end(self, trainer, step, metrics):
        dt = metrics.get("step_time")
        if dt:
            metrics["tflops_per_chip"] = self.flops_per_batch / dt / self.n_chips / 1e12


class PreemptionCallback(Callback):
    """SIGTERM → checkpoint + graceful stop (reference preemption.py:29)."""

    def __init__(self, sig=signal.SIGTERM):
        self.sig = sig
        self._received = False

    def on_train_start(self, trainer):
        self._prev = signal.signal(self.sig, self._handler)

    def _handler(self, signum, frame):
        logging.warning("Preemption signal received — will checkpoint and stop")
        self._received = True

    def on_step_end(self, trainer, step, metrics):
        if self._received:
            trainer.save_checkpoint(step)
            trainer.should_stop = True


class GarbageCollectionCallback(Callback):
    """Periodic synchronized gc (reference garbage_collection.py)."""

    def __init__(self, every_n_steps: int = 100):
        self.every = every_n_steps
        gc.disable()

    def on_step_end(self, trainer, step, metrics):
        if step % self.every == 0:
            gc.collect()

    def on_train_end(self, trainer):
        gc.enable()


class ProgressPrinter(Callback):
    """Megatron-style stdout log (reference progress_printer.py)."""

    def __init__(self, log_every: int = 10):
        self.log_every = log_every

    def on_step_end(self, trainer, step, metrics):
        if step % self.log_every == 0:
            parts = [f"step {step}/{trainer.max_steps}"]
            for k in ("loss", "grad_norm", "step_time_avg", "tflops_per_chip", "lr"):
                if k in metrics:
                    v = metrics[k]
                    parts.append(f"{k}: {float(v):.4g}")
            logging.info(" | ".join(parts))
