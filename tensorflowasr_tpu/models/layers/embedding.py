"""Label embeddings for the transducer prediction network.

Reference parity (``tensorflow_asr/models/layers/embedding.py``):
  - ``Embedding`` (:20-58): table lookup with padded positions zeroed;
    single-step path is just a gather of one token
  - ``OneHotBlank`` (:62-93): one-hot where the blank row is all-zeros
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class Embedding(nn.Module):
    vocab_size: int
    embed_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array, lengths: jax.Array | None = None) -> jax.Array:
        emb = nn.Embed(self.vocab_size, self.embed_dim, dtype=self.dtype, param_dtype=jnp.float32, name="embeddings")
        out = emb(jnp.asarray(tokens, jnp.int32))
        if lengths is not None:
            valid = jnp.arange(tokens.shape[1])[None, :] < jnp.asarray(lengths, jnp.int32)[:, None]
            out = out * valid[..., None].astype(out.dtype)
        return out


class OneHotBlank(nn.Module):
    """One-hot encoding with the blank token mapped to the zero vector."""

    vocab_size: int
    blank: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array, lengths: jax.Array | None = None) -> jax.Array:
        tokens = jnp.asarray(tokens, jnp.int32)
        out = jax.nn.one_hot(tokens, self.vocab_size, dtype=self.dtype)
        out = jnp.where((tokens == self.blank)[..., None], jnp.zeros_like(out), out)
        if lengths is not None:
            valid = jnp.arange(tokens.shape[1])[None, :] < jnp.asarray(lengths, jnp.int32)[:, None]
            out = out * valid[..., None].astype(out.dtype)
        return out
