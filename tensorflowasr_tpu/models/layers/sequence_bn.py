"""Sequence-wise batch normalization (Laurent et al. 2016, DeepSpeech2 paper):
statistics over (batch × time) jointly, as in the reference
``models/layers/sequence_wise_bn.py:20``. Stateless (no running averages —
the reference computes moments on every call too).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class SequenceBatchNorm(nn.Module):
    time_major: bool = False
    epsilon: float = 1e-3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, lengths: Optional[jax.Array] = None) -> jax.Array:
        c = x.shape[-1]
        beta = self.param("beta", nn.initializers.zeros, (c,), jnp.float32)
        gamma = self.param("gamma", nn.initializers.ones, (c,), jnp.float32)
        axes = (0, 1)
        if lengths is not None:
            # length-masked moments: padded frames don't pollute statistics
            t_axis = 0 if self.time_major else 1
            maxlen = x.shape[t_axis]
            mask = jnp.arange(maxlen)[None, :] < jnp.asarray(lengths, jnp.int32)[:, None]
            if self.time_major:
                mask = mask.T
            m = mask[..., None].astype(x.dtype)
            denom = jnp.maximum(jnp.sum(m, axis=axes), 1.0)
            mean = jnp.sum(x * m, axis=axes) / denom
            var = jnp.sum(((x - mean) ** 2) * m, axis=axes) / denom
        else:
            mean = jnp.mean(x, axis=axes)
            var = jnp.var(x, axis=axes)
        inv = jax.lax.rsqrt(var + self.epsilon)
        return (x - mean) * inv * gamma.astype(x.dtype) + beta.astype(x.dtype)
