"""Learning-rate schedules (reference models/schedules.py:17-150) as pure
``step -> lr`` functions pluggable into optax.

The reference calls scheduler.step() once at compile time and once per
optimizer update, so update i (0-based) runs at s = i + 1; we reproduce that
with (count + 1).
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax.numpy as jnp


Schedule = Callable


def constant_lr(lr_value: float) -> Schedule:
    def fn(count):
        return jnp.asarray(lr_value, jnp.float32)
    return fn


def constant_with_decay_lr(lr_values: Sequence[float], decay_steps: Sequence[int]) -> Schedule:
    values = jnp.asarray(lr_values, jnp.float32)
    bounds = jnp.asarray(decay_steps)

    def fn(count):
        # model_step > decay_steps[i] selects lr_values[i+1]
        idx = jnp.sum(count > bounds)
        return values[idx]
    return fn


def transformer_lr(dim_model: int, warmup_steps: int, k: float) -> Schedule:
    def fn(count):
        s = count + 1.0
        return k * dim_model ** -0.5 * jnp.minimum(s ** -0.5, s * warmup_steps ** -1.5)
    return fn


def exp_decay_transformer_lr(
    warmup_steps: int, lr_max: float, alpha: float, end_step: int
) -> Schedule:
    def fn(count):
        s = count + 1.0
        warm = s / warmup_steps * lr_max
        decay = lr_max * alpha ** ((s - warmup_steps) / (end_step - warmup_steps))
        return jnp.minimum(warm, decay)
    return fn


def cosine_annealing_lr(
    warmup_steps: int, lr_max: float, lr_min: float, end_step: int
) -> Schedule:
    def fn(count):
        s = count + 1.0
        warm = s / warmup_steps * lr_max
        cos = (lr_max - lr_min) * 0.5 * (
            1.0 + jnp.cos(math.pi * (s - warmup_steps) / (end_step - warmup_steps))
        ) + lr_min
        return jnp.where(s <= warmup_steps, warm, cos)
    return fn


def from_training_params(p: dict) -> Schedule:
    """Build the schedule from reference-schema training_params."""
    name = p["lr_schedule"]
    if name == "Constant":
        return constant_lr(p["lr_value"])
    if name == "ConstantWithDecay":
        return constant_with_decay_lr(p["lr_values"], p["decay_steps"])
    if name == "Transformer":
        return transformer_lr(p["schedule_dim"], p["warmup_steps"], p["K"])
    if name == "ExpDecayTransformer":
        lr_max = p.get("lr_max") or (
            p["K"] * p["schedule_dim"] ** -0.5 * p["warmup_steps"] ** -0.5
        )
        return exp_decay_transformer_lr(p["warmup_steps"], lr_max, p["alpha"], p["end_step"])
    if name == "Cosine":
        lr_max = p.get("lr_max") or (
            p["K"] * p["schedule_dim"] ** -0.5 * p["warmup_steps"] ** -0.5
        )
        return cosine_annealing_lr(p["warmup_steps"], lr_max, p["lr_min"], p["end_step"])
    raise ValueError(f"unknown lr_schedule {name}")
