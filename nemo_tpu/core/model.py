"""Model base class: config-built models with tar save/restore.

TPU-native counterpart of the reference's ModelPT + SaveRestoreConnector
(`nemo/core/classes/modelPT.py:64`, `nemo/core/connectors/save_restore_connector.py:38`):
a model is (config, flax variables); `.ntpu` archives are tar files holding
`model_config.yaml` + `model_weights.msgpack` (+ registered artifacts),
mirroring the `.nemo` layout so converters are straightforward.
"""

from __future__ import annotations

import io
import os
import tarfile
import tempfile
from typing import Any, Dict, Optional, Type

import jax
from flax import serialization

from nemo_tpu.core.config import ConfigDict, load_yaml, to_yaml
from nemo_tpu.utils.logging import logging

_MODEL_REGISTRY: Dict[str, Type["Model"]] = {}


class Model:
    """Base for all task models.

    Subclasses set `self.variables` (flax variable dict: params, batch_stats…)
    and implement `_build(cfg)`.
    """

    def __init_subclass__(cls, **kw):
        super().__init_subclass__(**kw)
        _MODEL_REGISTRY[cls.__name__] = cls

    def __init__(self, cfg: ConfigDict):
        self.cfg = ConfigDict(cfg)
        self.variables: Dict[str, Any] = {}
        self._artifacts: Dict[str, bytes] = {}

    # -- artifacts (reference: ModelPT.register_artifact, modelPT.py:237) ----
    def register_artifact(self, name: str, data: bytes) -> None:
        self._artifacts[name] = data

    # -- save / restore (reference: save_restore_connector.py:49,231) -------
    def save_to(self, path: str) -> None:
        from nemo_tpu.utils.remote_paths import is_remote, stage_out

        if is_remote(path):
            # remote URL (s3://, msc://, …): stage through local disk
            # (reference S3CheckpointIO / s3_utils.py)
            import tempfile

            with tempfile.TemporaryDirectory() as d:
                local = os.path.join(d, "model.ntpu")
                self.save_to(local)
                stage_out(local, path)
            logging.info(f"Saved model to {path}")
            return
        tmp = path + ".tmp"
        with tarfile.open(tmp, "w") as tar:
            cfg_bytes = to_yaml({"target": type(self).__name__, **self.cfg.to_dict()}).encode()
            self._add_member(tar, "model_config.yaml", cfg_bytes)
            weights = serialization.to_bytes(self.variables)
            self._add_member(tar, "model_weights.msgpack", weights)
            for name, data in self._artifacts.items():
                self._add_member(tar, f"artifacts/{name}", data)
        os.replace(tmp, path)
        logging.info(f"Saved model to {path}")

    @staticmethod
    def _add_member(tar: tarfile.TarFile, name: str, data: bytes) -> None:
        info = tarfile.TarInfo(name)
        info.size = len(data)
        tar.addfile(info, io.BytesIO(data))

    @classmethod
    def restore_from(cls, path: str) -> "Model":
        from nemo_tpu.utils.remote_paths import is_remote, stage_in

        if is_remote(path):
            path = stage_in(path)
        with tarfile.open(path, "r:*") as tar:
            names = tar.getnames()
            if any(n.startswith("/") or ".." in n for n in names):
                raise ValueError("Unsafe tar member paths")  # safe-extract guard
            cfg = load_yaml(tar.extractfile("model_config.yaml").read().decode())
            target = cfg.pop("target", cls.__name__)
            model_cls = _MODEL_REGISTRY.get(target, cls)
            model = model_cls(cfg)
            weights = tar.extractfile("model_weights.msgpack").read()
            model.variables = serialization.from_bytes(model.variables, weights)
            for n in names:
                if n.startswith("artifacts/"):
                    model._artifacts[n[len("artifacts/"):]] = tar.extractfile(n).read()
        return model

    @property
    def num_weights(self) -> int:
        return sum(
            x.size for x in jax.tree.leaves(self.variables.get("params", {}))
        )
