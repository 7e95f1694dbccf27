"""Recurrent layers: LSTM / GRU / SimpleRNN over ``lax.scan``.

Replaces the reference's Keras RNN factory (``utils/layer_util.py:21-39``)
with flax cells compiled to XLA while loops. Supports:
  - length-aware scanning (padded steps don't corrupt the final state)
  - bidirectional concat (DeepSpeech2)
  - explicit state pass-through + a ``step`` single-timestep path for
    streaming ``call_next`` and the transducer decode loop
  - ``unroll`` to trade compile time for TPU loop overhead
"""

from __future__ import annotations

import os
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

RNN_TYPES = ("lstm", "gru", "rnn")


def _use_fused_lstm(b: int, t: int, h: int) -> bool:
    """Fused whole-sequence LSTM kernel dispatch (TFASR_RNN_IMPL=auto|pallas|xla).

    Measured PARITY, not a win (v5e, prednet shape B=16 T=129 H=320,
    fwd+bwd: kernel 5.1-5.6 ms vs scan 5.0-5.7 ms) — the sequential chain
    is bound by MXU pass latency of the tiny-M recurrent matmul, a floor
    both implementations share; see docs/design/fused_lstm.md. ``auto``
    therefore keeps XLA's scan (no Mosaic risk); the kernel stays available
    as ``TFASR_RNN_IMPL=pallas``."""
    impl = os.environ.get("TFASR_RNN_IMPL", "auto").lower()
    if impl != "pallas":
        return False
    from tensorflowasr_tpu.ops.pallas.lstm_kernel import lstm_shapes_supported

    return lstm_shapes_supported(b, t, h)


class SimpleRNNCell(nn.RNNCellBase):
    """Elman RNN cell (tanh), matching keras SimpleRNN semantics."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, carry, x):
        (h,) = carry
        dense = lambda name: nn.Dense(self.features, dtype=self.dtype, param_dtype=jnp.float32, name=name)
        new_h = jnp.tanh(dense("i")(x) + dense("h")(h))
        return (new_h,), new_h

    @nn.nowrap
    def initialize_carry(self, rng, input_shape):
        batch = input_shape[:-1]
        return (jnp.zeros(batch + (self.features,), self.dtype),)

    @property
    def num_feature_axes(self) -> int:
        return 1


def _make_cell(rnn_type: str, units: int, dtype) -> nn.RNNCellBase:
    if rnn_type == "lstm":
        return nn.OptimizedLSTMCell(features=units, dtype=dtype, param_dtype=jnp.float32)
    if rnn_type == "gru":
        return nn.GRUCell(features=units, dtype=dtype, param_dtype=jnp.float32)
    if rnn_type == "rnn":
        return SimpleRNNCell(features=units, dtype=dtype)
    raise ValueError(f"rnn_type must be in {RNN_TYPES}")


class RNN(nn.Module):
    """Unidirectional or bidirectional recurrent layer.

    ``__call__(x [B,T,D], lengths, initial_state) → (y [B,T,U(·2)], final_state)``
    ``step(x_t [B,D], state) → (y [B,U], state)`` — streaming/decode path
    (unidirectional only).
    """

    units: int
    rnn_type: str = "lstm"
    bidirectional: bool = False
    unroll: int = 1
    dtype: Any = jnp.float32

    def setup(self):
        self.cell = _make_cell(self.rnn_type, self.units, self.dtype)
        self.rnn = nn.RNN(self.cell, unroll=self.unroll, name="fwd")
        if self.bidirectional:
            self.cell_bwd = _make_cell(self.rnn_type, self.units, self.dtype)
            self.rnn_bwd = nn.RNN(self.cell_bwd, unroll=self.unroll, name="bwd")

    def init_state(self, batch: int):
        carry = self.cell.initialize_carry(jax.random.PRNGKey(0), (batch, 1))
        if self.bidirectional:
            carry_bwd = self.cell_bwd.initialize_carry(jax.random.PRNGKey(0), (batch, 1))
            return (carry, carry_bwd)
        return carry

    def __call__(self, x: jax.Array, lengths: Optional[jax.Array] = None, initial_state=None):
        seq_lengths = None if lengths is None else jnp.asarray(lengths, jnp.int32)
        if not self.bidirectional and self.rnn_type == "lstm" and _use_fused_lstm(x.shape[0], x.shape[1], self.units):
            # fused Pallas path: whole time loop in one kernel. The cell is
            # still called once at init so the param tree is identical to the
            # lax.scan path (checkpoint/converter compatible).
            from tensorflowasr_tpu.ops.pallas.lstm_kernel import lstm_layer_fused

            if self.is_initializing():
                carry0 = self.cell.initialize_carry(jax.random.PRNGKey(0), x[:, 0].shape)
                self.cell(carry0, x[:, 0])
            cell_params = self.get_variable("params", "cell")
            if initial_state is None:
                zero = jnp.zeros((x.shape[0], self.units), self.dtype)
                initial_state = (zero, zero)
            c0, h0 = initial_state
            return lstm_layer_fused(x, cell_params, h0, c0, seq_lengths, dtype=self.dtype)
        if self.bidirectional:
            init_f, init_b = initial_state if initial_state is not None else (None, None)
            carry_f, y_f = self.rnn(x, initial_carry=init_f, seq_lengths=seq_lengths, return_carry=True)
            carry_b, y_b = self.rnn_bwd(x, initial_carry=init_b, seq_lengths=seq_lengths, return_carry=True, reverse=True, keep_order=True)
            return jnp.concatenate([y_f, y_b], axis=-1), (carry_f, carry_b)
        carry, y = self.rnn(x, initial_carry=initial_state, seq_lengths=seq_lengths, return_carry=True)
        return y, carry

    def step(self, x_t: jax.Array, state):
        assert not self.bidirectional, "streaming step is unidirectional only"
        new_state, y = self.cell(state, x_t)
        return y, new_state
