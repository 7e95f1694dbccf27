"""Small shared layer utilities: activations, norms, masking helpers.

Counterpart of the reference's ``models/layers/general.py`` wrappers and the
norm choices used across subsampling/encoder blocks. BatchNorm under jit
with a sharded batch is globally synchronized automatically (GSPMD inserts
the cross-replica reduction), matching the reference's ``synchronized=True``.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

ACTIVATIONS: dict[str, Callable] = {
    "linear": lambda x: x,
    "relu": nn.relu,
    "relu6": nn.relu6,
    "gelu": nn.gelu,
    "swish": nn.swish,
    "silu": nn.swish,
    "tanh": jnp.tanh,
    "sigmoid": nn.sigmoid,
    "elu": nn.elu,
    "leaky_relu": nn.leaky_relu,
    "softmax": nn.softmax,
    "none": lambda x: x,
}


def get_activation(name: Optional[str]) -> Callable:
    if name is None:
        return ACTIVATIONS["linear"]
    if callable(name):
        return name
    try:
        return ACTIVATIONS[name.lower()]
    except KeyError as e:
        raise KeyError(f"Unknown activation {name!r}; available: {sorted(ACTIVATIONS)}") from e


class Norm(nn.Module):
    """Config-selected normalization: "batch" | "layer" | "none"."""

    kind: str = "none"
    dtype: Any = jnp.float32
    momentum: float = 0.99
    epsilon: float = 1e-3  # keras defaults

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.kind == "batch":
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=self.momentum,
                epsilon=self.epsilon,
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )(x)
        if self.kind == "layer":
            return nn.LayerNorm(epsilon=1e-3, dtype=self.dtype, param_dtype=jnp.float32)(x)
        if self.kind in ("none", None):
            return x
        raise ValueError(f"Unknown norm kind {self.kind!r}")


def sequence_mask(lengths: jax.Array, maxlen: int) -> jax.Array:
    return jnp.arange(maxlen)[None, :] < jnp.asarray(lengths, jnp.int32)[:, None]


def mask_sequence(x: jax.Array, lengths: jax.Array) -> jax.Array:
    """Zero features at padded time positions. x: [B, T, ...]."""
    m = sequence_mask(lengths, x.shape[1])
    return x * m.reshape(m.shape + (1,) * (x.ndim - 2)).astype(x.dtype)
