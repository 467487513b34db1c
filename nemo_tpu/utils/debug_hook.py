"""Tensor debug hooks: activation capture, gradient stats, anomaly hunt.

Reference parity: `nemo/utils/debug_hook.py` (register_debug_hooks —
forward/backward hooks dumping per-module tensor norms for debugging
divergence). The JAX shape of the same tool: flax
`capture_intermediates` for forward activations (zero cost when off),
`jax.grad` for exact per-leaf gradient stats, and a summariser that
flags NaN/Inf/exploding tensors — usable on any flax module in the
framework without instrumenting model code.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

__all__ = [
    "tensor_stats",
    "capture_activations",
    "activation_summary",
    "grad_summary",
    "find_anomalies",
    "save_debug_dump",
]


def tensor_stats(x) -> Dict[str, float]:
    """Summary stats of one tensor (computed on device, fetched as scalars)."""
    x = jnp.asarray(x)
    if x.size == 0:
        return {"shape": tuple(x.shape), "dtype": str(x.dtype), "mean": 0.0,
                "abs_max": 0.0, "l2": 0.0, "nan_frac": 0.0, "inf_frac": 0.0}
    xf = x.astype(jnp.float32)
    finite = jnp.isfinite(xf)
    total = x.size
    return {
        "shape": tuple(x.shape),
        "dtype": str(x.dtype),
        "mean": float(jnp.where(finite, xf, 0).sum() / max(total, 1)),
        "abs_max": float(jnp.max(jnp.abs(jnp.where(finite, xf, 0)))),
        "l2": float(jnp.sqrt(jnp.sum(jnp.where(finite, xf, 0) ** 2))),
        "nan_frac": float(jnp.mean(jnp.isnan(xf))),
        "inf_frac": float(jnp.mean(jnp.isinf(xf))),
    }


def _flatten(tree, prefix="") -> List[Tuple[str, Any]]:
    out = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        name = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        out.append((prefix + name, leaf))
    return out


def capture_activations(
    module,
    variables,
    *args,
    filter_fn: Optional[Callable[[str], bool]] = None,
    method=None,
    **kwargs,
):
    """Run module.apply capturing every submodule's outputs.

    Returns (outputs, {path: tensor}). filter_fn selects paths (e.g.
    ``lambda p: "attention" in p``). Tensors are the raw intermediates —
    pass to activation_summary for stats or save_debug_dump for npz.
    """
    flt = (lambda mdl, _: True) if filter_fn is None else (
        lambda mdl, _: filter_fn(mdl.path and "/".join(mdl.path) or ""))
    out, state = module.apply(
        variables, *args, capture_intermediates=flt,
        mutable=["intermediates"], method=method, **kwargs)
    acts: Dict[str, Any] = {}
    for name, leaf in _flatten(state["intermediates"]):
        acts[name] = leaf
    return out, acts


def activation_summary(acts: Dict[str, Any]) -> Dict[str, Dict[str, float]]:
    return {k: tensor_stats(v) for k, v in acts.items()
            if hasattr(v, "shape")}


def grad_summary(loss_fn: Callable, params, *args) -> Dict[str, Dict[str, float]]:
    """Per-leaf gradient stats of loss_fn(params, *args) — the backward-
    hook analog (exact, from one jax.grad call)."""
    grads = jax.grad(loss_fn)(params, *args)
    return {name: tensor_stats(g) for name, g in _flatten(grads)}


def find_anomalies(
    stats: Dict[str, Dict[str, float]],
    *,
    abs_max_threshold: float = 1e4,
    l2_threshold: float = 1e6,
) -> List[str]:
    """Names whose tensors contain NaN/Inf or exceed magnitude thresholds
    — the first place to look when a loss diverges."""
    bad = []
    for name, s in stats.items():
        if s.get("nan_frac", 0) > 0 or s.get("inf_frac", 0) > 0:
            bad.append(f"{name}: nan={s['nan_frac']:.4f} inf={s['inf_frac']:.4f}")
        elif s.get("abs_max", 0) > abs_max_threshold or s.get("l2", 0) > l2_threshold:
            bad.append(f"{name}: abs_max={s['abs_max']:.3e} l2={s['l2']:.3e}")
    return bad


def save_debug_dump(path: str, acts: Dict[str, Any]) -> None:
    """npz dump of captured tensors (host fetch — debugging scale only)."""
    arrays = {}
    for k, v in acts.items():
        if hasattr(v, "shape"):
            arrays[k.replace("/", ".")] = np.asarray(v)
    np.savez_compressed(path, **arrays)
