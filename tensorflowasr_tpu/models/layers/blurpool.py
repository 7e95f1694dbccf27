"""Anti-aliased (blur) pooling, Zhang 2019 "Making Convolutions Shift-Invariant
Again" (reference ``models/layers/blurpool.py:23,80``): strided convolution
with a fixed binomial low-pass kernel.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_BINOMIAL = {
    1: [1.0],
    2: [1.0, 1.0],
    3: [1.0, 2.0, 1.0],
    4: [1.0, 3.0, 3.0, 1.0],
    5: [1.0, 4.0, 6.0, 4.0, 1.0],
    6: [1.0, 5.0, 10.0, 10.0, 5.0, 1.0],
    7: [1.0, 6.0, 15.0, 20.0, 15.0, 6.0, 1.0],
}


class BlurPool1D(nn.Module):
    kernel_size: int = 3
    strides: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # [B, T, C]
        k = np.asarray(_BINOMIAL[self.kernel_size])
        k = (k / k.sum()).astype(np.float32)
        c = x.shape[-1]
        kernel = jnp.asarray(k, self.dtype)[:, None, None] * jnp.eye(c, dtype=self.dtype)[None]  # [K, C, C]
        pad = (self.kernel_size - 1) // 2
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel,
            window_strides=(self.strides,),
            padding=[(pad, self.kernel_size - 1 - pad)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )


class BlurPool2D(nn.Module):
    kernel_size: int = 3
    strides: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # [B, H, W, C]
        k1 = np.asarray(_BINOMIAL[self.kernel_size])
        k2 = np.outer(k1, k1)
        k2 = (k2 / k2.sum()).astype(np.float32)
        c = x.shape[-1]
        kernel = jnp.asarray(k2, self.dtype)[:, :, None, None] * jnp.eye(c, dtype=self.dtype)[None, None]
        pad = (self.kernel_size - 1) // 2
        pads = [(pad, self.kernel_size - 1 - pad)] * 2
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel,
            window_strides=(self.strides, self.strides),
            padding=pads,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
