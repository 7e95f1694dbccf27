"""Jasper encoder (Li et al. 2019): deep 1D conv blocks with dense residuals.

Structure parity with the reference (``tensorflow_asr/models/encoders/jasper.py``):
JasperSubBlock = conv1d + synced BN + relu + dropout (:26), residual variant
adds pointwise-conv'd skip connections from all previous block outputs
("dense" mode, :112-163), JasperBlock = nsubblocks with the residual applied
at the last one (:165), encoder = first stride-2 block → B blocks → two
additional blocks (second one dilated) (:230-359).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from tensorflowasr_tpu.models.layers.convolution import Conv1D
from tensorflowasr_tpu.models.layers.general import get_activation, mask_sequence
from tensorflowasr_tpu.utils import math_util


class JasperSubBlock(nn.Module):
    channels: int = 256
    kernels: int = 11
    strides: int = 1
    dropout: float = 0.1
    padding: str = "causal"
    dilation: int = 1
    dtype: Any = jnp.float32

    @property
    def reduction_factor(self) -> int:
        return self.strides

    @nn.compact
    def __call__(self, x: jax.Array, residuals: Sequence[jax.Array] = (), train: bool = False) -> jax.Array:
        x = Conv1D(
            filters=self.channels, kernel_size=self.kernels, strides=self.strides, padding=self.padding, dilation=self.dilation,
            dtype=self.dtype, name="conv1d",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99, epsilon=1e-3, dtype=self.dtype, param_dtype=jnp.float32, name="bn")(x)
        # residuals (already pointwise-projected + BN'd) join before activation
        for r in residuals:
            x = x + r
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class JasperResidual(nn.Module):
    channels: int = 256
    padding: str = "causal"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = Conv1D(filters=self.channels, kernel_size=1, padding=self.padding, dtype=self.dtype, name="pointwise_conv1d")(x)
        return nn.BatchNorm(use_running_average=not train, momentum=0.99, epsilon=1e-3, dtype=self.dtype, param_dtype=jnp.float32, name="bn")(x)


class JasperBlock(nn.Module):
    nsubblocks: int = 3
    channels: int = 256
    kernels: int = 11
    dropout: float = 0.1
    padding: str = "causal"
    dense: bool = False
    nresiduals: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, block_inputs: Sequence[jax.Array], train: bool = False):
        """block_inputs: outputs of all previous blocks (dense mode) or just
        the current input. Returns (output, updated block_inputs list)."""
        inputs = x
        for i in range(self.nsubblocks - 1):
            x = JasperSubBlock(
                channels=self.channels, kernels=self.kernels, dropout=self.dropout, padding=self.padding, dtype=self.dtype, name=f"subordinate_{i}"
            )(x, train=train)
        # last subblock receives the residual connections
        residuals = []
        for i in range(self.nresiduals):
            residuals.append(
                JasperResidual(channels=self.channels, padding=self.padding, dtype=self.dtype, name=f"residual_{i}")(block_inputs[i], train=train)
            )
        x = JasperSubBlock(
            channels=self.channels, kernels=self.kernels, dropout=self.dropout, padding=self.padding, dtype=self.dtype,
            name=f"subordinate_{self.nsubblocks - 1}",
        )(x, residuals=residuals, train=train)
        if self.dense:
            new_inputs = list(block_inputs) + [x]
        else:
            new_inputs = [x]
        return x, new_inputs


class JasperEncoder(nn.Module):
    dense: bool = False
    padding: str = "causal"
    first_additional_block_channels: int = 256
    first_additional_block_kernels: int = 11
    first_additional_block_strides: int = 2
    first_additional_block_dilation: int = 1
    first_additional_block_dropout: float = 0.2
    nsubblocks: int = 5
    block_channels: Sequence[int] = (256, 384, 512, 640, 768)
    block_kernels: Sequence[int] = (11, 13, 17, 21, 25)
    block_dropout: Sequence[float] = (0.2, 0.2, 0.2, 0.3, 0.3)
    second_additional_block_channels: int = 896
    second_additional_block_kernels: int = 1
    second_additional_block_strides: int = 1
    second_additional_block_dilation: int = 2
    second_additional_block_dropout: float = 0.4
    third_additional_block_channels: int = 1024
    third_additional_block_kernels: int = 1
    third_additional_block_strides: int = 1
    third_additional_block_dilation: int = 1
    third_additional_block_dropout: float = 0.4
    dtype: Any = jnp.float32

    @property
    def time_reduction_factor(self) -> int:
        return self.first_additional_block_strides * self.second_additional_block_strides * self.third_additional_block_strides

    @nn.nowrap
    def output_length(self, length):
        return math_util.get_reduced_length(length, self.time_reduction_factor)

    @nn.nowrap
    def init_state(self, batch: int):
        return None

    @nn.compact
    def __call__(self, features: jax.Array, features_length: jax.Array, initial_state=None, train: bool = False):
        if features.ndim == 4:
            features = math_util.merge_two_last_dims(features)
        x = JasperSubBlock(
            channels=self.first_additional_block_channels,
            kernels=self.first_additional_block_kernels,
            strides=self.first_additional_block_strides,
            dropout=self.first_additional_block_dropout,
            padding=self.padding,
            dilation=self.first_additional_block_dilation,
            dtype=self.dtype,
            name="first_block",
        )(features, train=train)

        block_inputs = [x]
        for i in range(len(self.block_channels)):
            x, block_inputs = JasperBlock(
                nsubblocks=self.nsubblocks,
                channels=self.block_channels[i],
                kernels=self.block_kernels[i],
                dropout=self.block_dropout[i],
                padding=self.padding,
                dense=self.dense,
                nresiduals=(i + 1) if self.dense else 1,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, block_inputs, train=train)

        x = JasperSubBlock(
            channels=self.second_additional_block_channels,
            kernels=self.second_additional_block_kernels,
            strides=self.second_additional_block_strides,
            dropout=self.second_additional_block_dropout,
            padding=self.padding,
            dilation=self.second_additional_block_dilation,
            dtype=self.dtype,
            name="second_block",
        )(x, train=train)
        x = JasperSubBlock(
            channels=self.third_additional_block_channels,
            kernels=self.third_additional_block_kernels,
            strides=self.third_additional_block_strides,
            dropout=self.third_additional_block_dropout,
            padding=self.padding,
            dilation=self.third_additional_block_dilation,
            dtype=self.dtype,
            name="third_block",
        )(x, train=train)

        lengths = math_util.get_reduced_length(jnp.asarray(features_length, jnp.int32), self.time_reduction_factor)
        x = mask_sequence(x, lengths)
        return x, lengths, None
