"""Sinusoidal positional encodings: absolute + Transformer-XL relative.

Reference parity (``tensorflow_asr/models/layers/positional_encoding.py``):
  - absolute PE, interleaved (sin/cos alternating) or concat form (:31-52)
  - relative PE computed over **reversed** positions — length ``2T+M-1``
    non-causal (positions T+M-1 … -(T-1)) or ``T+M`` causal — with a
    per-example roll keyed on true lengths so relative distance 0 lands at
    the right slot for every sequence in the padded batch (:114-174)

The per-example roll replaces the reference's ``tf.map_fn`` with a vmapped
``jnp.roll`` — identical math, batched on the VPU.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def compute_sinusoid_position_encoding(position: jax.Array, dmodel: int, interleave: bool = False, dtype=jnp.float32) -> jax.Array:
    """positions [L] → PE [L, dmodel]."""
    position = position.astype(jnp.float32)
    min_freq = 1.0 / 10000.0
    if interleave:
        timescales = jnp.power(min_freq, (2.0 * (jnp.arange(dmodel) // 2)) / dmodel)
        angles = position[:, None] * timescales[None, :]
        cos_mask = (jnp.arange(dmodel) % 2).astype(jnp.float32)
        sin_mask = 1.0 - cos_mask
        pe = jnp.sin(angles) * sin_mask + jnp.cos(angles) * cos_mask
    else:
        timescales = jnp.power(min_freq, jnp.arange(0, dmodel, 2, dtype=jnp.float32) / dmodel)
        angles = position[:, None] * timescales[None, :]
        pe = jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=-1)
    return pe.astype(dtype)


class SinusoidalPositionalEncoding(nn.Module):
    """Adds absolute PE (masked to valid frames). Returns (outputs, pe)."""

    dropout: float = 0.0
    scale: Optional[float] = None
    interleave: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, outputs: jax.Array, outputs_length: jax.Array, train: bool = False):
        if self.scale is not None:
            outputs = outputs * jnp.asarray(self.scale, outputs.dtype)
        _, length, dmodel = outputs.shape
        pe = compute_sinusoid_position_encoding(jnp.arange(length), dmodel, self.interleave, outputs.dtype)
        pe = jnp.broadcast_to(pe[None], outputs.shape)
        valid = (jnp.arange(length)[None, :] < jnp.asarray(outputs_length, jnp.int32)[:, None]).astype(pe.dtype)
        pe = pe * valid[:, :, None]
        pe = nn.Dropout(self.dropout, deterministic=not train)(pe)
        return outputs + pe, pe


class RelativeSinusoidalPositionalEncoding(nn.Module):
    """Relative PE for Transformer-XL attention. Returns (outputs, relpe).

    relpe shape: [B, 2T+M-1, D] (non-causal) or [B, T+M, D] (causal).
    """

    dropout: float = 0.0
    scale: Optional[float] = None
    interleave: bool = False
    memory_length: Optional[int] = None
    causal: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, outputs: jax.Array, outputs_length: jax.Array, train: bool = False):
        if self.scale is not None:
            outputs = outputs * jnp.asarray(self.scale, outputs.dtype)
        _, length, dmodel = outputs.shape
        m = self.memory_length or 0
        # reversed positions: left part (length+M-1 … 1), right part (0 … -(length-1))
        position = jnp.arange(length + m - 1, -length, -1)
        pe = compute_sinusoid_position_encoding(position, dmodel, self.interleave, outputs.dtype)  # [2T+M-1, D]

        out_len = (length + m) if self.causal else (2 * length + m - 1)
        lengths = jnp.asarray(outputs_length, jnp.int32)

        def roll_one(ln):
            rolled = jnp.roll(pe, shift=-(length - ln), axis=0)[:out_len]
            valid_n = (ln + m) if self.causal else (2 * ln + m - 1)
            mask = (jnp.arange(out_len) < valid_n).astype(pe.dtype)
            return rolled * mask[:, None]

        relpe = jax.vmap(roll_one)(lengths)  # [B, out_len, D]
        relpe = nn.Dropout(self.dropout, deterministic=not train)(relpe)
        return outputs, relpe
