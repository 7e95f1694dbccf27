"""RNN-Transducer encoder: stacked LSTM blocks with time reduction.

Structure parity with the reference (``tensorflow_asr/models/encoders/rnnt.py``):
each block = TimeReduction (pre or post) + RNN + optional LayerNorm +
projection (:27-126); the encoder stacks ``nlayers`` blocks (:131-224).
Streaming ``call_next`` carries per-block RNN states.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from tensorflowasr_tpu.models.layers.general import mask_sequence
from tensorflowasr_tpu.models.layers.rnn import RNN
from tensorflowasr_tpu.models.layers.subsampling import TimeReduction
from tensorflowasr_tpu.utils import math_util


class RnnTransducerBlock(nn.Module):
    reduction_position: str = "pre"
    reduction_factor: int = 0
    dmodel: int = 640
    rnn_type: str = "lstm"
    rnn_units: int = 2048
    rnn_unroll: bool = False
    layer_norm: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        assert self.reduction_position in ("pre", "post")
        self.rnn = RNN(units=self.rnn_units, rnn_type=self.rnn_type, unroll=8 if self.rnn_unroll else 1, dtype=self.dtype)
        if self.reduction_factor > 0:
            self.reduction = TimeReduction(self.reduction_factor)
        if self.layer_norm:
            self.ln = nn.LayerNorm(epsilon=1e-3, dtype=self.dtype, param_dtype=jnp.float32)
        self.projection = nn.Dense(self.dmodel, dtype=self.dtype, param_dtype=jnp.float32)

    def __call__(self, x: jax.Array, lengths: jax.Array, initial_state=None, train: bool = False):
        if self.reduction_position == "pre" and self.reduction_factor > 0:
            x, lengths = self.reduction(x, lengths)
        x, new_state = self.rnn(x, lengths, initial_state=initial_state)
        if self.layer_norm:
            x = self.ln(x)
        x = self.projection(x)
        if self.reduction_position == "post" and self.reduction_factor > 0:
            x, lengths = self.reduction(x, lengths)
        return x, lengths, new_state


class RnnTransducerEncoder(nn.Module):
    reduction_positions: Sequence[str] = ("pre",) * 8
    reduction_factors: Sequence[int] = (6, 0, 0, 0, 0, 0, 0, 0)
    dmodel: int = 640
    nlayers: int = 8
    rnn_type: str = "lstm"
    rnn_units: int = 2048
    rnn_unroll: bool = False
    layer_norm: bool = True
    dtype: Any = jnp.float32

    @property
    def time_reduction_factor(self) -> int:
        out = 1
        for f in self.reduction_factors:
            out *= max(f, 1)
        return out

    @nn.nowrap
    def output_length(self, length):
        return math_util.get_reduced_length(length, self.time_reduction_factor)

    def setup(self):
        assert len(self.reduction_positions) == len(self.reduction_factors) == self.nlayers
        self.blocks = [
            RnnTransducerBlock(
                reduction_position=self.reduction_positions[i],
                reduction_factor=self.reduction_factors[i],
                dmodel=self.dmodel,
                rnn_type=self.rnn_type,
                rnn_units=self.rnn_units,
                rnn_unroll=self.rnn_unroll,
                layer_norm=self.layer_norm,
                dtype=self.dtype,
                name=f"block_{i}",
            )
            for i in range(self.nlayers)
        ]

    @nn.nowrap
    def init_state(self, batch: int):
        def zeros_carry():
            if self.rnn_type == "lstm":
                return (jnp.zeros((batch, self.rnn_units)), jnp.zeros((batch, self.rnn_units)))
            if self.rnn_type == "gru":
                return jnp.zeros((batch, self.rnn_units))
            return (jnp.zeros((batch, self.rnn_units)),)

        return [zeros_carry() for _ in range(self.nlayers)]

    def __call__(self, features: jax.Array, features_length: jax.Array, initial_state: Optional[list] = None, train: bool = False):
        x = features
        if x.ndim == 4:
            x = math_util.merge_two_last_dims(x)
        lengths = jnp.asarray(features_length, jnp.int32)
        new_states = [] if initial_state is not None else None
        for i, block in enumerate(self.blocks):
            init = None if initial_state is None else initial_state[i]
            x, lengths, st = block(x, lengths, initial_state=init, train=train)
            if new_states is not None:
                new_states.append(st)
        x = mask_sequence(x, lengths)
        return x, lengths, new_states
