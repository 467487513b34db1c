"""LR schedule registry — the reference's ~20 policies as optax schedules.

Reference parity: `nemo/core/optim/lr_scheduler.py` (WarmupPolicy,
WarmupHoldPolicy, SquareAnnealing:…, SquareRootAnnealing:455,
CosineAnnealing:467, NoamAnnealing:518, NoamHoldAnnealing,
WarmupAnnealing, InverseSquareRootAnnealing, T5InverseSquareRootAnnealing,
PolynomialDecayAnnealing, PolynomialHoldDecayAnnealing, ...).

Each factory returns an `optax.Schedule`: a function `step -> lr`, built from
jnp ops so it can live inside a jitted train step.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax.numpy as jnp

Schedule = Callable[[Any], Any]

AVAILABLE_SCHEDULERS: Dict[str, Callable[..., Schedule]] = {}


def register_scheduler(name: str):
    def deco(fn):
        AVAILABLE_SCHEDULERS[name] = fn
        return fn

    return deco


def get_scheduler(name: str, **kwargs) -> Schedule:
    if name not in AVAILABLE_SCHEDULERS:
        raise ValueError(
            f"Unknown scheduler {name!r}; available: {sorted(AVAILABLE_SCHEDULERS)}"
        )
    return AVAILABLE_SCHEDULERS[name](**kwargs)


def _warmup_steps(max_steps: Optional[int], warmup_steps, warmup_ratio) -> float:
    if warmup_steps is not None:
        return float(warmup_steps)
    if warmup_ratio is not None:
        if max_steps is None:
            raise ValueError("warmup_ratio requires max_steps")
        return float(warmup_ratio * max_steps)
    return 0.0


def _hold_steps(max_steps, hold_steps, hold_ratio) -> float:
    if hold_steps is not None:
        return float(hold_steps)
    if hold_ratio is not None:
        if max_steps is None:
            raise ValueError("hold_ratio requires max_steps")
        return float(hold_ratio * max_steps)
    return 0.0


def _warmup_policy(lr, warmup, max_steps, min_lr, anneal):
    """Shared shape: linear warmup 0→lr over `warmup`, then anneal(progress)."""
    warmup = max(float(warmup), 0.0)
    max_steps = float(max_steps)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm_lr = lr * (step + 1.0) / (warmup + 1.0)
        decay_total = jnp.maximum(max_steps - warmup, 1.0)
        progress = jnp.clip((step - warmup) / decay_total, 0.0, 1.0)
        ann = anneal(progress)
        out = jnp.where(step < warmup, warm_lr, jnp.maximum(ann, min_lr))
        return jnp.where(step >= max_steps, min_lr, out).astype(jnp.float32)

    return schedule


@register_scheduler("CosineAnnealing")
def cosine_annealing(
    max_steps: int,
    lr: float = 1e-3,
    warmup_steps=None,
    warmup_ratio=None,
    min_lr: float = 0.0,
    **_,
) -> Schedule:
    warmup = _warmup_steps(max_steps, warmup_steps, warmup_ratio)
    return _warmup_policy(
        lr,
        warmup,
        max_steps,
        min_lr,
        lambda p: min_lr + 0.5 * (lr - min_lr) * (1.0 + jnp.cos(jnp.pi * p)),
    )


@register_scheduler("SquareAnnealing")
def square_annealing(max_steps, lr=1e-3, warmup_steps=None, warmup_ratio=None, min_lr=1e-5, **_):
    warmup = _warmup_steps(max_steps, warmup_steps, warmup_ratio)
    return _warmup_policy(lr, warmup, max_steps, min_lr, lambda p: lr * (1.0 - p) ** 2)


@register_scheduler("SquareRootAnnealing")
def square_root_annealing(max_steps, lr=1e-3, warmup_steps=None, warmup_ratio=None, min_lr=0.0, **_):
    warmup = _warmup_steps(max_steps, warmup_steps, warmup_ratio)
    return _warmup_policy(lr, warmup, max_steps, min_lr, lambda p: lr * jnp.sqrt(1.0 - p))


@register_scheduler("WarmupAnnealing")
def warmup_annealing(max_steps, lr=1e-3, warmup_steps=None, warmup_ratio=None, min_lr=0.0, **_):
    """Linear decay after warmup."""
    warmup = _warmup_steps(max_steps, warmup_steps, warmup_ratio)
    return _warmup_policy(lr, warmup, max_steps, min_lr, lambda p: lr * (1.0 - p))


@register_scheduler("PolynomialDecayAnnealing")
def polynomial_decay(
    max_steps, lr=1e-3, warmup_steps=None, warmup_ratio=None, min_lr=0.0, power=1.0, cycle=False, **_
):
    warmup = _warmup_steps(max_steps, warmup_steps, warmup_ratio)
    return _warmup_policy(
        lr, warmup, max_steps, min_lr, lambda p: (lr - min_lr) * (1.0 - p) ** power + min_lr
    )


@register_scheduler("PolynomialHoldDecayAnnealing")
def polynomial_hold_decay(
    max_steps,
    lr=1e-3,
    warmup_steps=None,
    warmup_ratio=None,
    hold_steps=None,
    hold_ratio=None,
    min_lr=0.0,
    power=1.0,
    **_,
):
    warmup = _warmup_steps(max_steps, warmup_steps, warmup_ratio)
    hold = warmup + _hold_steps(max_steps, hold_steps, hold_ratio)
    max_steps = float(max_steps)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm_lr = lr * (step + 1.0) / (warmup + 1.0)
        decay_total = jnp.maximum(max_steps - hold, 1.0)
        p = jnp.clip((step - hold) / decay_total, 0.0, 1.0)
        decay_lr = (lr - min_lr) * (1.0 - p) ** power + min_lr
        out = jnp.where(step < warmup, warm_lr, jnp.where(step < hold, lr, decay_lr))
        return jnp.where(step >= max_steps, min_lr, out).astype(jnp.float32)

    return schedule


@register_scheduler("NoamAnnealing")
def noam_annealing(
    d_model: int,
    lr: float = 1.0,
    warmup_steps=None,
    warmup_ratio=None,
    max_steps=None,
    min_lr: float = 0.0,
    **_,
) -> Schedule:
    """lr * d_model^-0.5 * min(step^-0.5, step * warmup^-1.5).

    Reference: NoamAnnealing (lr_scheduler.py:518).
    """
    warmup = max(_warmup_steps(max_steps, warmup_steps, warmup_ratio), 1.0)
    norm = float(d_model) ** -0.5

    def schedule(step):
        step = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
        out = lr * norm * jnp.minimum(step**-0.5, step * warmup**-1.5)
        return jnp.maximum(out, min_lr).astype(jnp.float32)

    return schedule


@register_scheduler("NoamHoldAnnealing")
def noam_hold_annealing(
    max_steps,
    lr=1e-3,
    warmup_steps=None,
    warmup_ratio=None,
    hold_steps=None,
    hold_ratio=None,
    decay_rate: float = 0.5,
    min_lr: float = 0.0,
    **_,
):
    warmup = max(_warmup_steps(max_steps, warmup_steps, warmup_ratio), 1.0)
    hold = warmup + _hold_steps(max_steps, hold_steps, hold_ratio)

    def schedule(step):
        step = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
        warm_lr = lr * step / warmup
        decay = lr * (hold ** decay_rate) * jnp.maximum(step, hold) ** (-decay_rate)
        out = jnp.where(step <= warmup, warm_lr, jnp.where(step <= hold, lr, decay))
        return jnp.maximum(out, min_lr).astype(jnp.float32)

    return schedule


@register_scheduler("InverseSquareRootAnnealing")
def inverse_square_root_annealing(
    max_steps, lr=1e-3, warmup_steps=None, warmup_ratio=None, min_lr=0.0, **_
):
    warmup = max(_warmup_steps(max_steps, warmup_steps, warmup_ratio), 1.0)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm_lr = lr * (step + 1.0) / (warmup + 1.0)
        decay = lr * jnp.sqrt(warmup) / jnp.sqrt(jnp.maximum(step, warmup))
        out = jnp.where(step < warmup, warm_lr, decay)
        return jnp.maximum(out, min_lr).astype(jnp.float32)

    return schedule


@register_scheduler("T5InverseSquareRootAnnealing")
def t5_inverse_square_root_annealing(max_steps, lr=1e-3, warmup_steps=10000, min_lr=0.0, **_):
    warmup = float(warmup_steps or 10000)

    def schedule(step):
        step = jnp.maximum(jnp.asarray(step, jnp.float32), warmup)
        return jnp.maximum(lr / jnp.sqrt(step / warmup), min_lr).astype(jnp.float32)

    return schedule


@register_scheduler("WarmupPolicy")
def warmup_policy(max_steps, lr=1e-3, warmup_steps=None, warmup_ratio=None, min_lr=0.0, **_):
    warmup = _warmup_steps(max_steps, warmup_steps, warmup_ratio)
    return _warmup_policy(lr, warmup, max_steps, min_lr, lambda p: jnp.full_like(p, lr))


@register_scheduler("WarmupHoldPolicy")
def warmup_hold_policy(max_steps, lr=1e-3, warmup_steps=None, warmup_ratio=None, **_):
    return warmup_policy(max_steps=max_steps, lr=lr, warmup_steps=warmup_steps, warmup_ratio=warmup_ratio, min_lr=lr)


@register_scheduler("ConstantPolicy")
def constant_policy(lr=1e-3, **_):
    def schedule(step):
        return jnp.full((), lr, jnp.float32)

    return schedule


@register_scheduler("CosineAnnealingWithRestarts")
def cosine_annealing_restarts(max_steps, lr=1e-3, min_lr=0.0, cycle_steps=None, warmup_steps=None, warmup_ratio=None, **_):
    cycle = float(cycle_steps or max_steps)
    warmup = _warmup_steps(max_steps, warmup_steps, warmup_ratio)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm_lr = lr * (step + 1.0) / (warmup + 1.0)
        p = jnp.mod(jnp.maximum(step - warmup, 0.0), cycle) / cycle
        ann = min_lr + 0.5 * (lr - min_lr) * (1.0 + jnp.cos(jnp.pi * p))
        return jnp.where(step < warmup, warm_lr, ann).astype(jnp.float32)

    return schedule


@register_scheduler("ExponentialDecayAnnealing")
def exponential_decay(max_steps, lr=1e-3, decay_rate=0.9, decay_steps=1000, warmup_steps=None, warmup_ratio=None, min_lr=0.0, **_):
    warmup = _warmup_steps(max_steps, warmup_steps, warmup_ratio)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm_lr = lr * (step + 1.0) / (warmup + 1.0)
        decay = lr * decay_rate ** ((step - warmup) / decay_steps)
        out = jnp.where(step < warmup, warm_lr, jnp.maximum(decay, min_lr))
        return out.astype(jnp.float32)

    return schedule


# Common aliases used in reference configs
AVAILABLE_SCHEDULERS["WarmupLinear"] = AVAILABLE_SCHEDULERS["WarmupAnnealing"]
AVAILABLE_SCHEDULERS["CosineAnnealingParams"] = AVAILABLE_SCHEDULERS["CosineAnnealing"]


@register_scheduler("SquareRootConstantPolicy")
def square_root_constant_policy(max_steps=None, lr=1e-3, constant_steps=None,
                                constant_ratio=None, min_lr=0.0, **_):
    """lr = 1/sqrt(constant_steps) while step < constant_steps, then
    1/sqrt(step) (reference lr_scheduler.py:93 — T5-style inverse-sqrt
    with a flat head; `lr` scales the curve)."""
    if constant_steps is None:
        constant_steps = (constant_ratio or 0.0) * (max_steps or 0)
    c = float(max(constant_steps, 1))

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        val = lr * jnp.where(step < c, 1.0 / jnp.sqrt(c),
                             1.0 / jnp.sqrt(jnp.maximum(step, 1.0)))
        return jnp.maximum(val, min_lr).astype(jnp.float32)

    return schedule


def _warmup_hold_anneal(lr, max_steps, warmup, hold, min_lr, anneal_fn):
    """warmup → hold at lr → anneal_fn(progress∈[0,1]) three-phase shape."""
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = lr * (step + 1.0) / (warmup + 1.0)
        p = jnp.clip((step - hold) / jnp.maximum(max_steps - hold, 1.0), 0.0, 1.0)
        ann = anneal_fn(p)
        out = jnp.where(step < warmup, warm, jnp.where(step < hold, lr, ann))
        return jnp.maximum(out, min_lr).astype(jnp.float32)

    return schedule


@register_scheduler("WarmupHoldAnnealOneMinusSquareRoot")
def warmup_hold_anneal_one_minus_sqrt(
        max_steps, lr=1e-3, warmup_steps=None, warmup_ratio=None,
        hold_steps=None, hold_ratio=None, min_lr=0.0, **_):
    """Warmup → hold → lr·(1−sqrt(progress)) (reference :230; the
    MiniCPM/WSD-family decay, arXiv 2408.11029)."""
    warmup = _warmup_steps(max_steps, warmup_steps, warmup_ratio)
    hold = warmup + _hold_steps(max_steps, hold_steps, hold_ratio)
    return _warmup_hold_anneal(
        lr, max_steps, warmup, hold, min_lr, lambda p: lr * (1.0 - jnp.sqrt(p)))


@register_scheduler("WarmupHoldAnnealLinear")
def warmup_hold_anneal_linear(
        max_steps, lr=1e-3, warmup_steps=None, warmup_ratio=None,
        hold_steps=None, hold_ratio=None, min_lr=0.0, **_):
    """Warmup → hold → linear decay to min_lr (reference :253; the
    warmup-stable-decay / WSD schedule, arXiv 2404.06395)."""
    warmup = _warmup_steps(max_steps, warmup_steps, warmup_ratio)
    hold = warmup + _hold_steps(max_steps, hold_steps, hold_ratio)
    return _warmup_hold_anneal(
        lr, max_steps, warmup, hold, min_lr,
        lambda p: lr - (lr - min_lr) * p)


# modern alias: warmup-stable-decay
register_scheduler("WSD")(warmup_hold_anneal_linear)
