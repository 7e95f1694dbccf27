"""Gated Linear Unit (reference ``models/activations/glu.py:20-32``):
split last dim in half, gate the first half with sigmoid of the second.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class GLU(nn.Module):
    axis: int = -1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        a, b = jnp.split(x, 2, axis=self.axis)
        return a * nn.sigmoid(b)
