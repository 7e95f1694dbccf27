"""DeepSpeech2 encoder: conv stack → (bi)RNN stack (+RowConv) → FC stack.

Structure parity with the reference
(``tensorflow_asr/models/encoders/deepspeech2.py``): RowConv1D lookahead
(:25), ConvBlock with conv1d/conv2d type + synced BN (:69), RnnBlock with
bidirectional option and rowconv for unidirectional (:197), FcBlock (:344),
DeepSpeech2Encoder (:416). Streaming ``call_next`` carries per-layer RNN
states (unidirectional configs only, as in the reference).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from tensorflowasr_tpu.models.layers.convolution import Conv1D, Conv2D, DepthwiseConv1D
from tensorflowasr_tpu.models.layers.general import get_activation, mask_sequence
from tensorflowasr_tpu.models.layers.rnn import RNN
from tensorflowasr_tpu.utils import math_util


class RowConv1D(nn.Module):
    """Depthwise lookahead conv (future_width frames) + BN + activation."""

    future_width: int = 2
    activation: str = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = DepthwiseConv1D(kernel_size=self.future_width * 2 + 1, padding="causal", use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99, epsilon=1e-3, dtype=self.dtype, param_dtype=jnp.float32, name="bn")(x)
        return get_activation(self.activation)(x)


class ConvBlock(nn.Module):
    conv_type: str = "conv2d"
    kernels: Sequence[int] = (11, 41)
    strides: Sequence[int] = (2, 2)
    filters: int = 32
    padding: str = "same"
    activation: str = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, lengths: jax.Array, train: bool = False):
        if self.conv_type == "conv2d":
            x = Conv2D(filters=self.filters, kernel_size=tuple(self.kernels), strides=tuple(self.strides), padding=self.padding, dtype=self.dtype, name="conv2d")(x)
            k0, s0 = self.kernels[0], self.strides[0]
        else:
            x = Conv1D(filters=self.filters, kernel_size=self.kernels[0] if isinstance(self.kernels, (list, tuple)) else self.kernels,
                       strides=self.strides[0] if isinstance(self.strides, (list, tuple)) else self.strides, padding=self.padding,
                       dtype=self.dtype, name="conv1d")(x)
            k0 = self.kernels[0] if isinstance(self.kernels, (list, tuple)) else self.kernels
            s0 = self.strides[0] if isinstance(self.strides, (list, tuple)) else self.strides
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99, epsilon=1e-3, dtype=self.dtype, param_dtype=jnp.float32, name="bn")(x)
        x = get_activation(self.activation)(x)
        lengths = math_util.conv_output_length(jnp.asarray(lengths, jnp.int32), k0, padding=self.padding, stride=s0)
        return x, lengths


class DeepSpeech2Encoder(nn.Module):
    conv_type: str = "conv2d"
    conv_kernels: Sequence[Sequence[int]] = ((11, 41), (11, 21), (11, 21))
    conv_strides: Sequence[Sequence[int]] = ((2, 2), (1, 2), (1, 2))
    conv_filters: Sequence[int] = (32, 32, 96)
    conv_padding: str = "same"
    conv_activation: str = "relu"
    rnn_nlayers: int = 5
    rnn_type: str = "lstm"
    rnn_units: int = 1024
    rnn_bidirectional: bool = True
    rnn_unroll: bool = False
    rnn_rowconv: int = 0
    rnn_rowconv_activation: str = "relu"
    rnn_dropout: float = 0.1
    fc_nlayers: int = 0
    fc_units: int = 1024
    fc_activation: str = "relu"
    fc_dropout: float = 0.1
    dtype: Any = jnp.float32

    @property
    def time_reduction_factor(self) -> int:
        out = 1
        for s in self.conv_strides:
            out *= s[0] if isinstance(s, (list, tuple)) else s
        return out

    @nn.nowrap
    def output_length(self, length):
        for i in range(len(self.conv_filters)):
            k = self.conv_kernels[i][0] if isinstance(self.conv_kernels[i], (list, tuple)) else self.conv_kernels[i]
            s = self.conv_strides[i][0] if isinstance(self.conv_strides[i], (list, tuple)) else self.conv_strides[i]
            length = math_util.conv_output_length(length, k, padding=self.conv_padding, stride=s)
        return length

    def setup(self):
        self._rnns = [
            RNN(units=self.rnn_units, rnn_type=self.rnn_type, bidirectional=self.rnn_bidirectional, dtype=self.dtype, name=f"rnn_{i}")
            for i in range(self.rnn_nlayers)
        ]

    @nn.nowrap
    def init_state(self, batch: int):
        if self.rnn_bidirectional:
            return None
        # zeros matching each cell's carry structure
        def zeros_carry():
            if self.rnn_type == "lstm":
                return (jnp.zeros((batch, self.rnn_units)), jnp.zeros((batch, self.rnn_units)))
            if self.rnn_type == "gru":
                return jnp.zeros((batch, self.rnn_units))
            return (jnp.zeros((batch, self.rnn_units)),)

        return [zeros_carry() for _ in range(self.rnn_nlayers)]

    @nn.compact
    def __call__(self, features: jax.Array, features_length: jax.Array, initial_state: Optional[list] = None, train: bool = False):
        x, lengths = features, jnp.asarray(features_length, jnp.int32)
        if self.conv_type == "conv2d" and x.ndim == 3:
            x = x[..., None]
        if self.conv_type == "conv1d" and x.ndim == 4:
            x = math_util.merge_two_last_dims(x)
        for i in range(len(self.conv_filters)):
            x, lengths = ConvBlock(
                conv_type=self.conv_type,
                kernels=self.conv_kernels[i],
                strides=self.conv_strides[i],
                filters=self.conv_filters[i],
                padding=self.conv_padding,
                activation=self.conv_activation,
                dtype=self.dtype,
                name=f"conv_block_{i}",
            )(x, lengths, train=train)
        if x.ndim == 4:
            x = math_util.merge_two_last_dims(x)

        new_states = [] if initial_state is not None else None
        for i, rnn in enumerate(self._rnns):
            init = None if initial_state is None else initial_state[i]
            x, st = rnn(x, lengths, initial_state=init)
            if self.rnn_rowconv > 0 and not self.rnn_bidirectional:
                x = RowConv1D(future_width=self.rnn_rowconv, activation=self.rnn_rowconv_activation, dtype=self.dtype, name=f"rowconv_{i}")(
                    x, train=train
                )
            x = nn.Dropout(self.rnn_dropout, deterministic=not train)(x)
            if new_states is not None:
                new_states.append(st)

        for i in range(self.fc_nlayers):
            x = nn.Dense(self.fc_units, dtype=self.dtype, param_dtype=jnp.float32, name=f"fc_{i}")(x)
            x = get_activation(self.fc_activation)(x)
            x = nn.Dropout(self.fc_dropout, deterministic=not train)(x)

        x = mask_sequence(x, lengths)
        return x, lengths, new_states
