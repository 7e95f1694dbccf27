"""ContextNet encoder (Han et al. 2020): SE-conv blocks.

Structure parity with the reference
(``tensorflow_asr/models/encoders/contextnet.py``): C0..C22 blocks of
separable convs + synced BatchNorm + silu (ConvModule :40), squeeze-excite
with length-masked global average pooling (SEModule :111), a conv residual
branch (ConvBlock :174), and the α width multiplier (ContextNetEncoder :277).
Stateless streaming ``call_next`` (causal padding keeps chunks composable).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from tensorflowasr_tpu.models.layers.convolution import SeparableConv1D
from tensorflowasr_tpu.models.layers.general import get_activation, sequence_mask
from tensorflowasr_tpu.utils import math_util


class ConvModule(nn.Module):
    kernel_size: int = 3
    strides: int = 1
    filters: int = 256
    activation: str = "silu"
    padding: str = "causal"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, lengths: jax.Array, train: bool = False):
        x = SeparableConv1D(
            filters=self.filters, kernel_size=self.kernel_size, strides=self.strides, padding=self.padding, dtype=self.dtype, name="conv"
        )(x)
        lengths = math_util.conv_output_length(jnp.asarray(lengths, jnp.int32), self.kernel_size, padding=self.padding, stride=self.strides)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99, epsilon=1e-3, dtype=self.dtype, param_dtype=jnp.float32, name="bn")(x)
        x = get_activation(self.activation)(x)
        return x, lengths


class SEModule(nn.Module):
    """Squeeze-and-excite: masked global average pool → FC/8 → FC → sigmoid scale."""

    kernel_size: int = 3
    strides: int = 1
    filters: int = 256
    activation: str = "silu"
    padding: str = "causal"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, lengths: jax.Array, train: bool = False):
        x, lengths = ConvModule(
            kernel_size=self.kernel_size, strides=self.strides, filters=self.filters, activation=self.activation, padding=self.padding,
            dtype=self.dtype, name="conv_module",
        )(x, lengths, train=train)
        mask = sequence_mask(lengths, x.shape[1]).astype(x.dtype)  # [B, T]
        denom = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
        se = jnp.sum(x * mask[..., None], axis=1) / denom  # [B, E] length-masked mean
        se = nn.Dense(self.filters // 8, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(se)
        se = get_activation(self.activation)(se)
        se = nn.Dense(self.filters, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(se)
        se = nn.sigmoid(se)
        return x * se[:, None, :], lengths


class ConvBlock(nn.Module):
    nlayers: int = 3
    kernel_size: int = 3
    filters: int = 256
    strides: int = 1
    residual: bool = True
    activation: str = "silu"
    alpha: float = 1.0
    padding: str = "causal"
    dtype: Any = jnp.float32

    @property
    def time_reduction_factor(self) -> int:
        return self.strides

    @property
    def dmodel(self) -> int:
        return int(self.filters * self.alpha)

    @nn.compact
    def __call__(self, x: jax.Array, lengths: jax.Array, train: bool = False):
        filters = self.dmodel
        in_x, in_lengths = x, lengths
        for i in range(self.nlayers - 1):
            x, lengths = ConvModule(
                kernel_size=self.kernel_size, strides=1, filters=filters, activation=self.activation, padding=self.padding,
                dtype=self.dtype, name=f"conv_module_{i}",
            )(x, lengths, train=train)
        x, lengths = ConvModule(
            kernel_size=self.kernel_size, strides=self.strides, filters=filters, activation=self.activation, padding=self.padding,
            dtype=self.dtype, name=f"conv_module_{self.nlayers - 1}",
        )(x, lengths, train=train)
        x, lengths = SEModule(
            kernel_size=self.kernel_size, strides=1, filters=filters, activation=self.activation, padding=self.padding,
            dtype=self.dtype, name="se",
        )(x, lengths, train=train)
        if self.residual:
            res, _ = ConvModule(
                kernel_size=self.kernel_size, strides=self.strides, filters=filters, activation="linear", padding=self.padding,
                dtype=self.dtype, name="residual",
            )(in_x, in_lengths, train=train)
            x = x + res
        x = get_activation(self.activation)(x)
        return x, lengths


class ContextNetEncoder(nn.Module):
    """``__call__(features [B,T,F(,C)], lengths)`` → ``(enc, lengths, None)``."""

    blocks: Sequence[dict] = ()
    alpha: float = 1.0
    dtype: Any = jnp.float32

    @property
    def time_reduction_factor(self) -> int:
        out = 1
        for b in self.blocks:
            out *= b.get("strides", 1)
        return out

    @property
    def dmodel(self) -> int:
        return int(self.blocks[-1].get("filters", 256) * self.alpha)

    @nn.nowrap
    def output_length(self, length):
        for b in self.blocks:
            length = math_util.conv_output_length(length, b.get("kernel_size", 3), padding=b.get("padding", "causal"), stride=b.get("strides", 1))
        return length

    @nn.nowrap
    def init_state(self, batch: int):
        return None

    @nn.compact
    def __call__(self, features: jax.Array, features_length: jax.Array, initial_state=None, train: bool = False):
        if features.ndim == 4:
            features = math_util.merge_two_last_dims(features)
        x, lengths = features, jnp.asarray(features_length, jnp.int32)
        for i, cfg in enumerate(self.blocks):
            x, lengths = ConvBlock(
                nlayers=cfg.get("nlayers", 3),
                kernel_size=cfg.get("kernel_size", 3),
                filters=cfg.get("filters", 256),
                strides=cfg.get("strides", 1),
                residual=cfg.get("residual", True),
                activation=cfg.get("activation", "silu"),
                alpha=self.alpha,
                padding=cfg.get("padding", "causal"),
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, lengths, train=train)
        return x, lengths, None
