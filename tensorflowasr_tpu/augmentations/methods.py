"""Augmentation methods: SpecAugment (freq/time masking) + GaussNoise.

Functional equivalents of the reference methods
(``tensorflow_asr/augmentations/methods/specaugment.py:42-137``,
``gaussnoise.py:19-37``). Each method augments ONE example
``(x, length, key) → (x, length)``; the registry vmaps over the batch with
split PRNG keys — the TPU-native replacement for the reference's per-example
``tf.map_fn``.
"""

from __future__ import annotations

import dataclasses
from typing import Union

import jax
import jax.numpy as jnp

MASK_VALUES = ("mean", "min", "max", "zero")


def _get_mask_value(x: jax.Array, mask_value: Union[str, float]) -> jax.Array:
    if isinstance(mask_value, (int, float)):
        return jnp.asarray(mask_value, x.dtype)
    if mask_value == "mean":
        return jnp.mean(x)
    if mask_value == "min":
        return jnp.min(x)
    if mask_value == "max":
        return jnp.max(x)
    return jnp.asarray(0, x.dtype)


class AugmentationMethod:
    """Per-example augmentation. Subclasses implement ``augment``."""

    def __init__(self, prob: float = 1.0):
        self.prob = prob

    def augment(self, x: jax.Array, length: jax.Array, key: jax.Array):
        raise NotImplementedError


class FreqMasking(AugmentationMethod):
    """Mask up to ``mask_factor`` frequency bins, ``num_masks`` times."""

    def __init__(self, num_masks: int = 1, mask_factor: int = 27, prob: float = 1.0, mask_value="zero"):
        super().__init__(prob=prob)
        self.num_masks = num_masks
        self.mask_factor = int(mask_factor)
        self.mask_value = mask_value
        if self.mask_value not in MASK_VALUES and not isinstance(self.mask_value, (int, float)):
            raise ValueError(f"mask_value must be in {MASK_VALUES} or a number")

    def augment(self, x: jax.Array, length: jax.Array, key: jax.Array):
        # x: [T, F] (or [T, F, 1])
        freq_len = x.shape[1]
        mval = _get_mask_value(x, self.mask_value)
        indices = jnp.arange(freq_len).reshape((1, -1) + (1,) * (x.ndim - 2))
        for i in range(self.num_masks):
            kp, kf, k0, key = jax.random.split(key, 4)
            do_apply = (jax.random.uniform(kp) <= self.prob).astype(jnp.int32)
            f = jax.random.randint(kf, (), 0, max(self.mask_factor, 1))
            f = do_apply * jnp.minimum(f, freq_len)
            f0 = do_apply * jax.random.randint(k0, (), 0, jnp.maximum(freq_len - f, 1))
            cond = (indices >= f0) & (indices < f0 + f)
            x = jnp.where(cond, mval, x)
        return x, length


class TimeMasking(AugmentationMethod):
    """Mask up to ``p_upperbound·length`` frames, ``num_masks`` times."""

    def __init__(self, num_masks: int = 1, mask_factor: int = 100, p_upperbound: float = 1.0, prob: float = 1.0, mask_value="zero"):
        super().__init__(prob=prob)
        self.num_masks = num_masks
        self.mask_factor = int(mask_factor)  # kept for config parity; bound comes from p_upperbound
        self.p_upperbound = p_upperbound
        self.mask_value = mask_value
        if self.mask_value not in MASK_VALUES and not isinstance(self.mask_value, (int, float)):
            raise ValueError(f"mask_value must be in {MASK_VALUES} or a number")

    def augment(self, x: jax.Array, length: jax.Array, key: jax.Array):
        # x: [T, F] (or [T, F, 1])
        max_len = x.shape[0]
        mval = _get_mask_value(x, self.mask_value)
        indices = jnp.arange(max_len).reshape((-1,) + (1,) * (x.ndim - 1))
        bound = jnp.floor(jnp.asarray(length, jnp.float32) * self.p_upperbound).astype(jnp.int32)
        for i in range(self.num_masks):
            kp, kt, k0, key = jax.random.split(key, 4)
            do_apply = (jax.random.uniform(kp) <= self.prob).astype(jnp.int32)
            t = jax.random.randint(kt, (), 0, jnp.maximum(bound, 1))
            t = do_apply * jnp.minimum(t, jnp.asarray(length, jnp.int32))
            t0 = do_apply * jax.random.randint(k0, (), 0, jnp.maximum(jnp.asarray(length, jnp.int32) - t, 1))
            cond = (indices >= t0) & (indices < t0 + t)
            x = jnp.where(cond, mval, x)
        return x, length


class GaussNoise(AugmentationMethod):
    """Additive gaussian signal noise masked to the valid length."""

    def __init__(self, mean: float = 0.0, stddev: float = 0.075, prob: float = 0.5):
        super().__init__(prob=prob)
        self.mean = mean
        self.stddev = stddev

    def augment(self, x: jax.Array, length: jax.Array, key: jax.Array):
        # x: [N] raw signal
        kp, kn = jax.random.split(key)
        do_apply = (jax.random.uniform(kp) <= self.prob).astype(x.dtype)
        noise = self.mean + self.stddev * jax.random.normal(kn, x.shape, x.dtype)
        valid = (jnp.arange(x.shape[0]) < jnp.asarray(length, jnp.int32)).astype(x.dtype)
        return x + noise * valid * do_apply, length
