"""Optimizer registry on optax.

Reference parity: `nemo/core/optim/optimizers.py` (registry of
adam/adamw/sgd/novograd/adafactor/lion/lamb/...), plus the distributed
(ZeRO-1-style) optimizer: on TPU, optimizer-state sharding falls out of
GSPMD — we annotate optimizer state with the same shardings as params
(see nemo_tpu/parallel), so no Apex-style fused kernels are needed.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Union

import jax.numpy as jnp
import optax

ScalarOrSchedule = Union[float, Callable]

AVAILABLE_OPTIMIZERS: Dict[str, Callable[..., optax.GradientTransformation]] = {}


def register_optimizer(name: str):
    def deco(fn):
        AVAILABLE_OPTIMIZERS[name] = fn
        return fn

    return deco


def get_optimizer(name: str, lr: ScalarOrSchedule = 1e-3, **kwargs) -> optax.GradientTransformation:
    if name not in AVAILABLE_OPTIMIZERS:
        raise ValueError(
            f"Unknown optimizer {name!r}; available: {sorted(AVAILABLE_OPTIMIZERS)}"
        )
    return AVAILABLE_OPTIMIZERS[name](lr=lr, **kwargs)


def _wd_mask(params: Any) -> Any:
    """Default weight-decay mask: skip biases / 1-D params (LN scales etc.)."""
    import jax

    return jax.tree.map(lambda p: p.ndim > 1, params)


@register_optimizer("adamw")
def adamw(lr=1e-3, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0, mask=None, **_):
    return optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay, mask=mask)


@register_optimizer("adam")
def adam(lr=1e-3, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0, **_):
    if weight_decay:
        return optax.chain(
            optax.add_decayed_weights(weight_decay), optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)
        )
    return optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)


@register_optimizer("sgd")
def sgd(lr=1e-3, momentum=0.0, weight_decay=0.0, nesterov=False, **_):
    tx = optax.sgd(lr, momentum=momentum or None, nesterov=nesterov)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


@register_optimizer("novograd")
def novograd(lr=1e-3, betas=(0.95, 0.98), eps=1e-8, weight_decay=0.0, **_):
    # Reference default for ASR (e.g. QuartzNet configs use novograd).
    tx = optax.novograd(lr, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay)
    return tx


@register_optimizer("adafactor")
def adafactor(lr=None, weight_decay=0.0, **_):
    return optax.adafactor(learning_rate=lr, weight_decay_rate=weight_decay or None)


@register_optimizer("lion")
def lion(lr=1e-4, betas=(0.9, 0.99), weight_decay=0.0, **_):
    return optax.lion(lr, b1=betas[0], b2=betas[1], weight_decay=weight_decay)


@register_optimizer("lamb")
def lamb(lr=1e-3, betas=(0.9, 0.999), eps=1e-6, weight_decay=0.0, **_):
    return optax.lamb(lr, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay)


@register_optimizer("radam")
def radam(lr=1e-3, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0, **_):
    tx = optax.radam(lr, b1=betas[0], b2=betas[1], eps=eps)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


@register_optimizer("adan")
def adan(lr=1e-3, weight_decay=0.0, **_):
    return optax.contrib.adan(lr, weight_decay=weight_decay)


@register_optimizer("adadelta")
def adadelta(lr=1.0, rho=0.9, eps=1e-6, weight_decay=0.0, **_):
    return optax.adadelta(lr, rho=rho, eps=eps, weight_decay=weight_decay)


@register_optimizer("adamax")
def adamax(lr=2e-3, betas=(0.9, 0.999), eps=1e-8, **_):
    return optax.adamax(lr, b1=betas[0], b2=betas[1], eps=eps)


def build_optimizer(
    name: str,
    lr: ScalarOrSchedule,
    *,
    grad_clip: Optional[float] = None,
    weight_decay: float = 0.0,
    wd_exclude_1d: bool = True,
    params: Any = None,
    **kwargs,
) -> optax.GradientTransformation:
    """Full training transform: [global-norm clip] → optimizer(lr schedule).

    Matches reference semantics where grad clipping happens in the optimizer
    step (MegatronOptimizer clip_grad) and weight decay skips LN/bias params.
    """
    mask = None
    if weight_decay and wd_exclude_1d and params is not None:
        mask = _wd_mask(params)
    if name == "adamw" and mask is not None:
        tx = adamw(lr=lr, weight_decay=weight_decay, mask=mask, **kwargs)
    else:
        tx = get_optimizer(name, lr=lr, weight_decay=weight_decay, **kwargs)
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx



def layer_freeze(schedule) -> optax.GradientTransformation:
    """Step-scheduled layer freezing (reference: LayerFreezer callback,
    nemo/lightning/pytorch/callbacks — freeze modules for given step
    ranges). `schedule` maps a path glob (over '/'-joined param paths,
    fnmatch syntax) to the step until which it stays frozen (-1 =
    forever). Chain BEFORE the optimizer so frozen subtrees see zero
    gradients (their moments stay untouched too when chained first)."""
    import fnmatch

    from flax import traverse_util

    def init(params):
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update(updates, state, params=None):
        step = state.count
        try:
            flat = traverse_util.flatten_dict(updates, sep="/")
        except Exception:
            raise TypeError(
                "layer_freeze needs a dict-like param tree to address "
                f"paths; got {type(updates).__name__}")
        out = {}
        for path, u in flat.items():
            frozen = None
            for pat, until in schedule.items():
                if fnmatch.fnmatch(path, pat):
                    frozen = until
                    break
            if frozen is None:
                out[path] = u
            elif frozen < 0:
                out[path] = jnp.zeros_like(u)
            else:
                out[path] = jnp.where(step < frozen, jnp.zeros_like(u), u)
        return (traverse_util.unflatten_dict(out, sep="/"),
                optax.ScaleByScheduleState(count=step + 1))

    return optax.GradientTransformation(init, update)
