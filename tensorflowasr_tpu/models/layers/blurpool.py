"""Anti-aliased (blur) pooling, Zhang 2019 "Making Convolutions Shift-Invariant
Again" (reference ``models/layers/blurpool.py:23,80``): strided convolution
with a fixed binomial low-pass kernel.

Parity notes vs the reference:
  - padding mode (default "reflect") and the floor/ceil split of the k-1
    pad amounts match the reference exactly (blurpool.py:40-47)
  - defaults kernel_size=4, strides=2 match (blurpool.py:27-29)
  - the blur is applied PER CHANNEL (depthwise), as in the upstream
    antialiased-cnns it cites; the reference's TF port drops the
    ``groups=channels`` argument and therefore sums all input channels into
    every output channel (blurpool.py:75-79) — an acknowledged port bug we
    do not reproduce. For in_channels == 1 the two coincide exactly
    (golden-tested in tests/test_layers.py).
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


def _pad_amounts(kernel_size: int) -> tuple[int, int]:
    # reference: left = floor((k-1)/2), right = ceil((k-1)/2)
    return (kernel_size - 1) // 2, int(np.ceil((kernel_size - 1) / 2))


class BlurPool1D(nn.Module):
    kernel_size: int = 4
    strides: int = 2
    padding: str = "reflect"  # "reflect" | "symmetric" | "constant" | "valid"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # [B, T, C]
        k = np.asarray(_BINOMIAL[self.kernel_size])
        k = (k / k.sum()).astype(np.float32)
        c = x.shape[-1]
        kernel = jnp.asarray(k, self.dtype)[:, None, None] * jnp.eye(c, dtype=self.dtype)[None]  # [K, C, C]
        lo, hi = _pad_amounts(self.kernel_size)
        x = x.astype(self.dtype)
        if self.padding != "valid":
            x = jnp.pad(x, [(0, 0), (lo, hi), (0, 0)], mode=self.padding)
        return jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(self.strides,),
            padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
        )


class BlurPool2D(nn.Module):
    kernel_size: int = 4
    strides: int = 2
    padding: str = "reflect"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # [B, H, W, C]
        k1 = np.asarray(_BINOMIAL[self.kernel_size])
        k2 = np.outer(k1, k1)
        k2 = (k2 / k2.sum()).astype(np.float32)
        c = x.shape[-1]
        kernel = jnp.asarray(k2, self.dtype)[:, :, None, None] * jnp.eye(c, dtype=self.dtype)[None, None]
        lo, hi = _pad_amounts(self.kernel_size)
        x = x.astype(self.dtype)
        if self.padding != "valid":
            x = jnp.pad(x, [(0, 0), (lo, hi), (lo, hi), (0, 0)], mode=self.padding)
        return jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(self.strides, self.strides),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
