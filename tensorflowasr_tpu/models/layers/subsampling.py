"""Time subsampling stacks: TimeReduction, Conv1d/Conv2d/Vgg subsampling.

Reference parity (``tensorflow_asr/models/layers/subsampling.py``):
  - ``TimeReduction`` (:25-53): pad time to a multiple of ``factor`` then
    stack ``factor`` adjacent frames into the feature dim;
    lengths → ceil(len/factor)
  - ``Conv2dSubsampling``/``Conv1dSubsampling`` (:163-349): conv stacks with
    per-layer stride/padding/norm/activation; length math via
    ``conv_output_length``; 2D variant merges (freq × channels) at the end
  - ``VggSubsampling`` (:57-159): conv-conv-maxpool ×2

All take ``(x, lengths)`` and return ``(x, lengths)``; each exposes
``time_reduction_factor``.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from tensorflowasr_tpu.models.layers.convolution import Conv1D, Conv2D
from tensorflowasr_tpu.models.layers.general import Norm, get_activation
from tensorflowasr_tpu.utils import math_util


class TimeReduction(nn.Module):
    factor: int

    @property
    def time_reduction_factor(self) -> int:
        return self.factor

    @nn.compact
    def __call__(self, x: jax.Array, lengths: jax.Array):
        b, t, d = x.shape
        pad = (-t) % self.factor
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        x = x.reshape(b, (t + pad) // self.factor, d * self.factor)
        lengths = math_util.get_reduced_length(jnp.asarray(lengths, jnp.int32), self.factor)
        return x, lengths


class Conv2dSubsampling(nn.Module):
    """Conv2D stack over [B, T, F, C]; output merged to [B, T', F'·C']."""

    filters: Sequence[int]
    strides: Sequence[Sequence[int]] = ((2, 1), (2, 1))
    kernels: Sequence[Sequence[int]] = ((3, 3), (3, 3))
    paddings: Sequence[str] = ("causal", "causal")
    norms: Sequence[str] = ("none", "none")
    activations: Sequence[str] = ("relu", "relu")
    dtype: Any = jnp.float32

    @property
    def time_reduction_factor(self) -> int:
        out = 1
        for s in self.strides:
            out *= s[0]
        return out

    @nn.compact
    def __call__(self, x: jax.Array, lengths: jax.Array, train: bool = False):
        assert len(self.filters) == len(self.strides) == len(self.kernels) == len(self.paddings) == len(self.norms) == len(self.activations)
        for i in range(len(self.filters)):
            x = Conv2D(
                filters=self.filters[i],
                kernel_size=self.kernels[i],
                strides=self.strides[i],
                padding=self.paddings[i],
                dtype=self.dtype,
                name=f"conv_{i}",
            )(x)
            x = Norm(kind=self.norms[i], dtype=self.dtype, name=f"norm_{i}")(x, train=train)
            x = get_activation(self.activations[i])(x)
            lengths = math_util.conv_output_length(
                jnp.asarray(lengths, jnp.int32), self.kernels[i][0], padding=self.paddings[i], stride=self.strides[i][0]
            )
        x = math_util.merge_two_last_dims(x)
        return x, lengths

    def output_length(self, length):
        for i in range(len(self.filters)):
            length = math_util.conv_output_length(length, self.kernels[i][0], padding=self.paddings[i], stride=self.strides[i][0])
        return length


class Conv1dSubsampling(nn.Module):
    """Conv1D stack over [B, T, F·C] (input [B, T, F, C] merged first)."""

    filters: Sequence[int]
    strides: Sequence[int] = (2, 2)
    kernels: Sequence[int] = (3, 3)
    paddings: Sequence[str] = ("causal", "causal")
    norms: Sequence[str] = ("none", "none")
    activations: Sequence[str] = ("relu", "relu")
    dtype: Any = jnp.float32

    @property
    def time_reduction_factor(self) -> int:
        out = 1
        for s in self.strides:
            out *= s
        return out

    @nn.compact
    def __call__(self, x: jax.Array, lengths: jax.Array, train: bool = False):
        if x.ndim == 4:
            x = math_util.merge_two_last_dims(x)
        for i in range(len(self.filters)):
            x = Conv1D(
                filters=self.filters[i],
                kernel_size=self.kernels[i],
                strides=self.strides[i],
                padding=self.paddings[i],
                dtype=self.dtype,
                name=f"conv_{i}",
            )(x)
            x = Norm(kind=self.norms[i], dtype=self.dtype, name=f"norm_{i}")(x, train=train)
            x = get_activation(self.activations[i])(x)
            lengths = math_util.conv_output_length(
                jnp.asarray(lengths, jnp.int32), self.kernels[i], padding=self.paddings[i], stride=self.strides[i]
            )
        return x, lengths

    def output_length(self, length):
        for i in range(len(self.filters)):
            length = math_util.conv_output_length(length, self.kernels[i], padding=self.paddings[i], stride=self.strides[i])
        return length


class VggSubsampling(nn.Module):
    """conv-conv-maxpool ×2 over [B, T, F, C] → [B, T', F'·C']."""

    filters: Sequence[int] = (32, 64)
    kernel_size: int = 3
    pool_size: int = 2
    strides: int = 2
    padding: str = "same"
    activation: str = "relu"
    dtype: Any = jnp.float32

    @property
    def time_reduction_factor(self) -> int:
        return self.strides * self.strides

    @nn.compact
    def __call__(self, x: jax.Array, lengths: jax.Array, train: bool = False):
        act = get_activation(self.activation)
        for blk, f in enumerate(self.filters):
            for ci in range(2):
                x = Conv2D(filters=f, kernel_size=(self.kernel_size, self.kernel_size), padding=self.padding, dtype=self.dtype, name=f"conv_{blk}_{ci}")(x)
                x = act(x)
            x = nn.max_pool(x, window_shape=(self.pool_size, self.pool_size), strides=(self.strides, self.strides), padding="SAME")
            lengths = math_util.conv_output_length(jnp.asarray(lengths, jnp.int32), self.pool_size, padding="same", stride=self.strides)
        x = math_util.merge_two_last_dims(x)
        return x, lengths

    def output_length(self, length):
        for _ in self.filters:
            length = math_util.conv_output_length(length, self.pool_size, padding="same", stride=self.strides)
        return length
