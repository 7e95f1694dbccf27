"""Learning-rate schedules as optax-compatible callables.

Reference parity (``tensorflow_asr/optimizers/schedules.py:19-103``):
  - ``TransformerSchedule`` (Noam): scale · d^-0.5 · min(step^-0.5, step·warmup^-1.5)
    clamped to [min_lr, max_lr]; string expressions like "0.05/(144**0.5)"
    are evaluated (numeric-only namespace)
  - ``CyclicTransformerSchedule``: triangular cycling around the sqrt decay
"""

from __future__ import annotations

import math
from typing import Optional, Union

import jax.numpy as jnp


def _eval_lr(v: Union[str, float, None]) -> Optional[float]:
    if v is None:
        return None
    if isinstance(v, str):
        # numeric-only expression evaluation (e.g. "0.05/(144**0.5)")
        return float(eval(v, {"__builtins__": {}}, {"math": math}))  # noqa: S307
    return float(v)


class TransformerSchedule:
    def __init__(self, dmodel, scale=1.0, warmup_steps=4000, max_lr=None, min_lr=None):
        self.dmodel = float(dmodel)
        self.scale = float(scale)
        self.warmup_steps = float(warmup_steps)
        self.max_lr = _eval_lr(max_lr)
        self.min_lr = _eval_lr(min_lr)

    def __call__(self, step):
        step = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
        lr = (self.dmodel**-0.5) * jnp.minimum(step**-0.5, step * (self.warmup_steps**-1.5))
        lr = self.scale * lr
        if self.max_lr is not None:
            lr = jnp.minimum(self.max_lr, lr)
        if self.min_lr is not None:
            lr = jnp.maximum(self.min_lr, lr)
        return lr


class CyclicTransformerSchedule:
    def __init__(self, dmodel, step_size, max_lr, warmup_steps=4000):
        self.dmodel = float(dmodel)
        self.warmup_steps = float(warmup_steps)
        self.max_lr = _eval_lr(max_lr)
        self.step_size = float(step_size)

    def __call__(self, step):
        step = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
        warmup = step * (self.warmup_steps**-1.5)
        lr = 2.0 * jax_rsqrt(step)
        lr = jax_rsqrt(self.dmodel) * jnp.minimum(lr, warmup)
        lr = jnp.minimum(self.max_lr, lr)
        cycle = jnp.floor(1 + step / (2 * self.step_size))
        x = jnp.abs(step / self.step_size - 2 * cycle + 1)
        lr = lr * (0.5 + jnp.maximum(0.0, x))
        return jnp.minimum(self.max_lr, jnp.minimum(lr, warmup))


def jax_rsqrt(x):
    return jnp.asarray(x, jnp.float32) ** -0.5


SCHEDULES = {
    "TransformerSchedule": TransformerSchedule,
    "tensorflow_asr.optimizers.schedules>TransformerSchedule": TransformerSchedule,
    "tensorflowasr_tpu.optimizers.schedules>TransformerSchedule": TransformerSchedule,
    "CyclicTransformerSchedule": CyclicTransformerSchedule,
    "tensorflow_asr.optimizers.schedules>CyclicTransformerSchedule": CyclicTransformerSchedule,
    "tensorflowasr_tpu.optimizers.schedules>CyclicTransformerSchedule": CyclicTransformerSchedule,
}


def build_schedule(config: Union[dict, float, str]):
    """LR config (constant or {class_name, config}) → optax schedule callable."""
    if isinstance(config, (int, float)):
        return float(config)
    if isinstance(config, str):
        return _eval_lr(config)
    cls = SCHEDULES[config["class_name"]]
    return cls(**config.get("config", {}))
