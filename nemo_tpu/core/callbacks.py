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


class EMACallback(Callback):
    """Exponential moving average of params (reference common/callbacks/ema.py).

    Keeps `trainer.ema_params`; `swap()` exchanges them with the live params
    for evaluation."""

    def __init__(self, decay: float = 0.999):
        self.decay = decay
        self.ema = None
        self._update = None

    def on_step_end(self, trainer, step, metrics):
        import jax

        params = getattr(trainer.state, "params", None)
        if params is None:
            return
        if self.ema is None:
            self.ema = jax.tree.map(lambda x: x, params)
            d = self.decay

            @jax.jit
            def update(ema, p):
                return jax.tree.map(lambda e, x: d * e + (1 - d) * x, ema, p)

            self._update = update
        else:
            self.ema = self._update(self.ema, params)
        trainer.ema_params = self.ema


class EarlyStopping(Callback):
    """Stop when a validation metric stops improving
    (reference exp_manager early_stopping)."""

    def __init__(self, monitor: str = "loss", patience: int = 5, mode: str = "min",
                 min_delta: float = 0.0):
        self.monitor, self.patience, self.mode = monitor, patience, mode
        self.min_delta = min_delta
        self.best = None
        self.count = 0

    def on_validation(self, trainer, step, metrics):
        v = metrics.get(self.monitor)
        if v is None:
            return
        improved = (
            self.best is None
            or (self.mode == "min" and v < self.best - self.min_delta)
            or (self.mode == "max" and v > self.best + self.min_delta)
        )
        if improved:
            self.best, self.count = v, 0
        else:
            self.count += 1
            if self.count >= self.patience:
                logging.info(f"EarlyStopping: no {self.monitor} improvement for {self.patience} validations")
                trainer.should_stop = True


class ProfilerCallback(Callback):
    """jax profiler trace for a step window (reference NsysCallback nsys.py:44:
    start/end step ranges; TPU equivalent = jax.profiler traces)."""

    def __init__(self, log_dir: str, start_step: int = 10, end_step: int = 12):
        self.log_dir = log_dir
        self.start_step, self.end_step = start_step, end_step
        self._active = False

    def on_step_start(self, trainer, step):
        import jax

        if step == self.start_step:
            jax.profiler.start_trace(self.log_dir)
            self._active = True

    def on_step_end(self, trainer, step, metrics):
        import jax

        if step == self.end_step and self._active:
            jax.profiler.stop_trace()
            self._active = False
            logging.info(f"profiler trace written to {self.log_dir}")


class StragglerDetectionCallback(Callback):
    """Flag abnormally slow steps (reference exp_manager.py:199-209 straggler
    detection — single-process analog: relative step-time outliers)."""

    def __init__(self, window: int = 50, threshold: float = 2.0):
        self.window, self.threshold = window, threshold
        self._times = []

    def on_step_end(self, trainer, step, metrics):
        dt = metrics.get("step_time")
        if dt is None:
            return
        if len(self._times) >= 10:
            import numpy as _np

            med = _np.median(self._times)
            if dt > self.threshold * med:
                logging.warning(
                    f"straggler: step {step} took {dt:.3f}s (median {med:.3f}s)")
                metrics["straggler"] = 1.0
        self._times.append(dt)
        self._times = self._times[-self.window:]


class NanGuardCallback(Callback):
    """Sanitizer: halt (or warn) on non-finite loss/grad-norm.

    Reference analog: the NaN/inf guards in megatron train steps and the
    debugging sanitizers surveyed in SURVEY §5 (parity guards). On TPU a
    NaN usually surfaces first in the loss/grad-norm scalars the step
    already returns, so the guard is free — no extra device work.
    """

    def __init__(self, metrics=("loss", "grad_norm"), action: str = "raise",
                 patience: int = 0):
        self.metrics = metrics
        self.action = action  # raise | stop | warn
        self.patience = patience
        self._bad = 0

    def on_step_end(self, trainer, step, metrics):
        import numpy as np

        bad = []
        for k in self.metrics:
            v = metrics.get(k)
            if v is None:
                continue
            try:
                if not np.isfinite(float(v)):
                    bad.append(k)
            except TypeError:
                continue
        if not bad:
            self._bad = 0
            return
        self._bad += 1
        msg = f"non-finite {bad} at step {step} ({self._bad}/{self.patience + 1})"
        if self._bad <= self.patience:
            logging.warning(f"NanGuard: {msg} — tolerating")
            return
        if self.action == "raise":
            raise FloatingPointError(f"NanGuard: {msg}")
        if self.action == "stop":
            logging.error(f"NanGuard: {msg} — stopping training")
            trainer.should_stop = True
        else:
            logging.warning(f"NanGuard: {msg}")


class SpeedMonitor(Callback):
    """Samples/sec + tokens/sec from the step timer (reference
    SpeedMonitor callback)."""

    def __init__(self, tokens_per_step: Optional[int] = None,
                 samples_per_step: Optional[int] = None):
        self.tokens = tokens_per_step
        self.samples = samples_per_step

    def on_step_end(self, trainer, step, metrics):
        dt = metrics.get("step_time")
        if not dt:
            return
        if self.tokens:
            metrics["tokens_per_sec"] = self.tokens / dt
        if self.samples:
            metrics["samples_per_sec"] = self.samples / dt


class RuntimeEstimator(Callback):
    """Logs remaining wall-time estimate (reference RuntimeEstimator)."""

    def __init__(self, log_every: int = 50):
        self.log_every = log_every

    def on_step_end(self, trainer, step, metrics):
        avg = metrics.get("step_time_avg")
        if avg and step and step % self.log_every == 0:
            remaining = (trainer.max_steps - step) * avg
            metrics["eta_minutes"] = remaining / 60.0
            logging.info(f"ETA: {remaining / 60.0:.1f} min "
                         f"({trainer.max_steps - step} steps × {avg:.3f}s)")


class OptimizerMonitor(Callback):
    """Param/update norm stats every N steps (reference OptimizerMonitor —
    grad-norm is already in metrics; this adds the param-side view)."""

    def __init__(self, every_n_steps: int = 50):
        self.every = every_n_steps

    def on_step_end(self, trainer, step, metrics):
        if step % self.every or trainer.state is None:
            return
        import jax
        import jax.numpy as jnp

        leaves = [jnp.sum(jnp.square(x.astype(jnp.float32)))
                  for x in jax.tree.leaves(trainer.state.params)
                  if hasattr(x, "dtype")]
        if leaves:
            metrics["param_norm"] = float(jnp.sqrt(sum(leaves)))
