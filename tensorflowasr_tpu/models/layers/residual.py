"""Weighted residual connection (reference ``models/layers/residual.py:22-65``).

``factor`` is a constant or a trainable scalar ("trainable") multiplying the
branch output before the skip add.
"""

from __future__ import annotations

from typing import Any, Union

import flax.linen as nn
import jax
import jax.numpy as jnp


class Residual(nn.Module):
    factor: Union[float, str] = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, skip: jax.Array, branch: jax.Array) -> jax.Array:
        if self.factor == "trainable":
            f = self.param("factor", nn.initializers.ones, (), jnp.float32).astype(branch.dtype)
        else:
            f = jnp.asarray(float(self.factor), branch.dtype)
        return skip + f * branch
