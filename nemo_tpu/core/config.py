"""Config system: YAML + dotted overrides + `_target_` instantiation.

TPU-native counterpart of the reference's Hydra/OmegaConf layer:
- `ConfigDict`: a dict with attribute access, the in-memory config node
  (reference: OmegaConf DictConfig).
- `from_config_dict`: builds an object from a node with a `_target_`
  fully-qualified class path, mirroring `Serialization.from_config_dict`
  (reference nemo/core/classes/common.py:526) including the import-path
  whitelist guard against config injection (common.py:79-110).
- `parse_overrides`: `a.b.c=value` dotted CLI overrides
  (reference: hydra_runner, nemo/core/config/hydra_runner.py:54).
"""

from __future__ import annotations

import copy
import dataclasses
import importlib
import re
from typing import Any, Iterable, Mapping

import yaml

# Import-path prefixes permitted for `_target_` instantiation. Mirrors the
# reference's whitelist guard (common.py:79-110) which prevents arbitrary
# code execution through user-supplied config files.
_ALLOWED_TARGET_PREFIXES = ("nemo_tpu.",)


class ConfigDict(dict):
    """Dict with attribute access and recursive wrapping."""

    def __init__(self, data: Mapping[str, Any] | None = None, **kw: Any):
        super().__init__()
        merged = dict(data or {})
        merged.update(kw)
        for k, v in merged.items():
            self[k] = _wrap(v)

    def __setitem__(self, k: str, v: Any) -> None:
        super().__setitem__(k, _wrap(v))

    def __getattr__(self, k: str) -> Any:
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k: str, v: Any) -> None:
        self[k] = v

    def __deepcopy__(self, memo: dict) -> "ConfigDict":
        return ConfigDict({k: copy.deepcopy(v, memo) for k, v in self.items()})

    def to_dict(self) -> dict:
        return _unwrap(self)

    def clone(self) -> "ConfigDict":
        return copy.deepcopy(self)


def _wrap(v: Any) -> Any:
    if isinstance(v, ConfigDict):
        return v
    if isinstance(v, Mapping):
        return ConfigDict(v)
    if isinstance(v, list):
        return [_wrap(x) for x in v]
    if isinstance(v, tuple):
        return tuple(_wrap(x) for x in v)
    return v


def _unwrap(v: Any) -> Any:
    if isinstance(v, Mapping):
        return {k: _unwrap(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_unwrap(x) for x in v]
    return v


def load_yaml(path_or_str: str) -> ConfigDict:
    """Load a YAML file path (or literal YAML string) into a ConfigDict."""
    text = path_or_str
    if "\n" not in path_or_str and (
        path_or_str.endswith((".yaml", ".yml")) or "/" in path_or_str
    ):
        with open(path_or_str) as f:
            text = f.read()
    data = yaml.safe_load(text) or {}
    return ConfigDict(data)


_INTERP_FULL = re.compile(r"^\$\{([^}]+)\}$")
_INTERP_PART = re.compile(r"\$\{([^}]+)\}")


def resolve_interpolations(cfg: ConfigDict) -> ConfigDict:
    """OmegaConf-style `${a.b.c}` interpolation resolution against the
    config root (the reference's hydra YAMLs use these pervasively —
    SURVEY §5.6; e.g. `feat_in: ${model.preprocessor.features}`).
    Whole-string refs keep the referenced value's native type; embedded
    refs stringify. Unresolvable refs are left as-is."""

    def look(path: str):
        node = cfg
        for p in path.split("."):
            node = node[p]
        return node

    def rec(node, depth=0):
        if isinstance(node, dict):
            return ConfigDict({k: rec(v, depth) for k, v in node.items()})
        if isinstance(node, (list, tuple)):
            return [rec(v, depth) for v in node]
        if isinstance(node, str) and depth < 8:
            m = _INTERP_FULL.match(node)
            if m:
                try:
                    v = look(m.group(1))
                except (KeyError, TypeError):
                    return node
                return rec(v, depth + 1)

            def sub(mm):
                try:
                    return str(look(mm.group(1)))
                except (KeyError, TypeError):
                    return mm.group(0)

            return _INTERP_PART.sub(sub, node)
        return node

    return rec(cfg)


def to_yaml(cfg: Any) -> str:
    if dataclasses.is_dataclass(cfg) and not isinstance(cfg, type):
        cfg = dataclasses.asdict(cfg)
    if isinstance(cfg, ConfigDict):
        cfg = cfg.to_dict()
    return yaml.safe_dump(cfg, sort_keys=False)


def _parse_value(s: str) -> Any:
    return yaml.safe_load(s)


def parse_overrides(args: Iterable[str], base: ConfigDict | None = None) -> ConfigDict:
    """Apply `a.b.c=value` overrides to (a clone of) `base`."""
    cfg = base.clone() if base is not None else ConfigDict()
    for arg in args:
        if "=" not in arg:
            raise ValueError(f"Override must be key=value, got: {arg!r}")
        key, _, val = arg.partition("=")
        node = cfg
        parts = key.strip().lstrip("+").split(".")
        for p in parts[:-1]:
            if p not in node or not isinstance(node[p], ConfigDict):
                node[p] = ConfigDict()
            node = node[p]
        node[parts[-1]] = _parse_value(val)
    return cfg


def resolve_target(path: str) -> Any:
    """Import `pkg.mod.Class` with whitelist check."""
    if not path.startswith(_ALLOWED_TARGET_PREFIXES):
        raise ValueError(
            f"_target_ {path!r} not under allowed prefixes {_ALLOWED_TARGET_PREFIXES}; "
            "refusing to instantiate (config-injection guard)"
        )
    module_path, _, name = path.rpartition(".")
    mod = importlib.import_module(module_path)
    return getattr(mod, name)


def from_config_dict(cfg: Mapping[str, Any]) -> Any:
    """Instantiate an object from a config node with `_target_`.

    Reference parity: `Serialization.from_config_dict`
    (nemo/core/classes/common.py:526).
    """
    cfg = ConfigDict(cfg)
    if "_target_" not in cfg:
        raise ValueError("from_config_dict requires a `_target_` key")
    cls = resolve_target(cfg["_target_"])
    kwargs = {k: v for k, v in cfg.items() if k != "_target_"}
    return cls(**kwargs)


def instantiate_dataclass(cls: type, cfg: Mapping[str, Any]) -> Any:
    """Build a dataclass from a config mapping, ignoring unknown keys of
    nested ConfigDicts only when the field is absent from the dataclass."""
    names = {f.name for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in cfg.items():
        if k in ("_target_",):
            continue
        if k not in names:
            raise ValueError(f"{cls.__name__} has no field {k!r}")
        kwargs[k] = _unwrap(v)
    return cls(**kwargs)
