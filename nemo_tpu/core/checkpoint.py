"""Distributed checkpointing: async sharded save/restore + resume scan.

Reference parity (SURVEY.md §5.4): MCore dist-checkpointing via
MegatronCheckpointIO (`nemo/lightning/io/pl.py:136`), async save
(`dist_ckpt_io.py:88`), top-k + '-last' management
(`callbacks/model_checkpoint.py`), AutoResume directory scan
(`resume.py:63,185`), TrainerContext config capture (`io/pl.py:55` —
`context/` dir enabling reconstruction without source).

TPU-native: orbax/tensorstore sharded checkpoints — already mesh-aware and
reshardable across mesh-shape changes (the tp/pp-invariance of MCore
dist_checkpointing falls out of named shardings).
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

from nemo_tpu.utils.logging import logging

_STEP_RE = re.compile(r"^step=(\d+)(-last)?$")


class CheckpointIO:
    """Save/restore TrainState pytrees under <dir>/step=N[-last]/ with
    async orbax writes, top-k retention and a context/ config capture."""

    def __init__(
        self,
        directory: str,
        *,
        keep_top_k: int = 3,
        async_save: bool = True,
        monitor: Optional[str] = None,
        mode: str = "min",
    ):
        """`monitor` enables metric-based top-k retention (reference
        ModelCheckpoint semantics, callbacks/model_checkpoint.py): keep the
        k checkpoints with the best `monitor` value (`mode` min/max) plus
        the newest '-last'. Without `monitor`, keeps the newest k."""
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.keep_top_k = keep_top_k
        self.monitor = monitor
        self.mode = mode
        self.ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler()) if async_save else ocp.Checkpointer(ocp.StandardCheckpointHandler())

    # -- save ---------------------------------------------------------------
    def save(self, state: Any, step: int, context: Optional[Dict] = None,
             metrics: Optional[Dict] = None) -> str:
        # Re-saving a step that already exists un-suffixed is a legitimate
        # production event (crash between save and prune → resume → re-save;
        # final save landing on the same step as a periodic save). Replace
        # the stale finalized dir — the reference's ModelCheckpoint handles
        # the same case with unfinished-markers
        # (lightning/pytorch/callbacks/model_checkpoint.py).
        stale = os.path.join(self.directory, f"step={step}")
        if os.path.exists(stale):
            self.wait()
            shutil.rmtree(stale)
        path = os.path.join(self.directory, f"step={step}-last")
        self.ckptr.save(os.path.join(path, "weights"), state, force=True)
        if context is not None:
            os.makedirs(os.path.join(path, "context"), exist_ok=True)
            with open(os.path.join(path, "context", "config.json"), "w") as f:
                json.dump(context, f, indent=2, default=str)
        if metrics is not None:
            with open(os.path.join(path, "metrics.json"), "w") as f:
                json.dump({k: float(v) for k, v in metrics.items()}, f)
        self._relink_last(step)
        self._prune()
        logging.info(f"Saved checkpoint step={step} → {path}")
        return path

    def _metric_of(self, step: int) -> Optional[float]:
        for suffix in ("-last", ""):
            p = os.path.join(self.directory, f"step={step}{suffix}", "metrics.json")
            if os.path.exists(p):
                with open(p) as f:
                    return json.load(f).get(self.monitor)
        return None

    def wait(self):
        if hasattr(self.ckptr, "wait_until_finished"):
            self.ckptr.wait_until_finished()

    def _relink_last(self, newest: int):
        for name in os.listdir(self.directory):
            m = _STEP_RE.match(name)
            if m and m.group(2) and int(m.group(1)) != newest:
                dst = os.path.join(self.directory, f"step={m.group(1)}")
                if os.path.exists(dst):
                    # a previous re-save of this step left a finalized dir
                    # behind — replace it with the newer '-last' contents
                    self.wait()
                    shutil.rmtree(dst)
                os.rename(os.path.join(self.directory, name), dst)

    def _prune(self):
        steps = sorted(
            int(_STEP_RE.match(n).group(1))
            for n in os.listdir(self.directory)
            if _STEP_RE.match(n)
        )
        if len(steps) <= self.keep_top_k:
            return
        newest = steps[-1]
        if self.monitor is not None:
            # metric-based: always keep the newest (resume anchor) + the
            # best (k-1) by metric; steps without a metric rank worst
            sign = 1.0 if self.mode == "min" else -1.0
            rest = steps[:-1]
            rest.sort(key=lambda st: (
                (m := self._metric_of(st)) is None, sign * (m or 0.0)
            ))
            keep = {newest} | set(rest[: max(0, self.keep_top_k - 1)])
            victims = [st for st in steps if st not in keep]
        else:
            victims = steps[: len(steps) - self.keep_top_k]
        for victim in victims:
            for suffix in ("", "-last"):
                p = os.path.join(self.directory, f"step={victim}{suffix}")
                if os.path.exists(p):
                    self.wait()
                    shutil.rmtree(p)

    # -- restore ------------------------------------------------------------
    def latest_step(self) -> Optional[int]:
        steps = [
            int(_STEP_RE.match(n).group(1))
            for n in os.listdir(self.directory)
            if _STEP_RE.match(n)
        ]
        return max(steps) if steps else None

    def restore(self, abstract_state: Any, step: Optional[int] = None) -> Any:
        self.wait()
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoints in {self.directory}")
        for suffix in ("-last", ""):
            path = os.path.join(self.directory, f"step={step}{suffix}", "weights")
            if os.path.exists(path):
                restorer = ocp.Checkpointer(ocp.StandardCheckpointHandler())
                return restorer.restore(path, abstract_state)
        raise FileNotFoundError(f"step={step} not found in {self.directory}")

    def load_context(self, step: Optional[int] = None) -> Optional[Dict]:
        if step is None:
            step = self.latest_step()
        for suffix in ("-last", ""):
            p = os.path.join(self.directory, f"step={step}{suffix}", "context", "config.json")
            if os.path.exists(p):
                with open(p) as f:
                    return json.load(f)
        return None


class AutoResume:
    """Find the latest '-last' checkpoint and restore trainer state
    (reference resume.py:63)."""

    def __init__(self, resume_if_exists: bool = True, resume_ignore_no_checkpoint: bool = True):
        self.resume_if_exists = resume_if_exists
        self.resume_ignore_no_checkpoint = resume_ignore_no_checkpoint

    def setup(self, ckpt_io: CheckpointIO, abstract_state: Any):
        if not self.resume_if_exists:
            return None, None
        step = ckpt_io.latest_step()
        if step is None:
            if self.resume_ignore_no_checkpoint:
                return None, None
            raise FileNotFoundError("AutoResume: no checkpoint found")
        state = ckpt_io.restore(abstract_state, step)
        logging.info(f"AutoResume: restored step={step}")
        return state, step
