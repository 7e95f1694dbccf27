"""Convolution layers with "causal" padding support.

Reference parity (``tensorflow_asr/models/layers/convolution.py:25-37``):
``causal`` padding left-pads EVERY spatial axis by ``dilation·(k−1)`` —
for Conv2D that includes the frequency axis (``width_pad`` in the
reference), not just time. Thin wrappers over ``flax.linen.Conv`` keeping
params f32 and compute in ``dtype``.
"""

from __future__ import annotations

from typing import Any, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp


def _norm_padding(padding: Union[str, Sequence], kernel_size: Sequence[int], dilation: Sequence[int], causal_axes: Sequence[int] = ()):
    """Map "causal" to explicit per-axis left pads; pass through others.

    Reference semantics (convolution.py:25-37): causal left-pads ALL
    spatial axes — time AND frequency for rank 2 (``causal_axes`` is kept
    for signature stability but every axis pads left).
    """
    if isinstance(padding, str) and padding.lower() == "causal":
        pads = []
        for i, k in enumerate(kernel_size):
            d = dilation[i] if i < len(dilation) else 1
            pads.append((d * (k - 1), 0))
        return pads
    return padding.upper() if isinstance(padding, str) else padding


class Conv1D(nn.Module):
    filters: int
    kernel_size: int
    strides: int = 1
    padding: Union[str, Sequence] = "same"
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # [B, T, C]
        pad = _norm_padding(self.padding, (self.kernel_size,), (self.dilation,), causal_axes=(0,))
        return nn.Conv(
            features=self.filters,
            kernel_size=(self.kernel_size,),
            strides=(self.strides,),
            padding=pad,
            kernel_dilation=(self.dilation,),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class Conv2D(nn.Module):
    filters: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: Union[str, Sequence] = "same"
    dilation: Sequence[int] = (1, 1)
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # [B, T, F, C]
        pad = _norm_padding(self.padding, tuple(self.kernel_size), tuple(self.dilation), causal_axes=(0,))
        return nn.Conv(
            features=self.filters,
            kernel_size=tuple(self.kernel_size),
            strides=tuple(self.strides),
            padding=pad,
            kernel_dilation=tuple(self.dilation),
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class DepthwiseConv1D(nn.Module):
    kernel_size: int
    strides: int = 1
    padding: Union[str, Sequence] = "same"
    dilation: int = 1
    depth_multiplier: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # [B, T, C]
        c = x.shape[-1]
        pad = _norm_padding(self.padding, (self.kernel_size,), (self.dilation,), causal_axes=(0,))
        return nn.Conv(
            features=c * self.depth_multiplier,
            kernel_size=(self.kernel_size,),
            strides=(self.strides,),
            padding=pad,
            kernel_dilation=(self.dilation,),
            feature_group_count=c,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class DepthwiseConv2D(nn.Module):
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: Union[str, Sequence] = "same"
    dilation: Sequence[int] = (1, 1)
    depth_multiplier: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # [B, T, F, C]
        c = x.shape[-1]
        pad = _norm_padding(self.padding, tuple(self.kernel_size), tuple(self.dilation), causal_axes=(0,))
        return nn.Conv(
            features=c * self.depth_multiplier,
            kernel_size=tuple(self.kernel_size),
            strides=tuple(self.strides),
            padding=pad,
            kernel_dilation=tuple(self.dilation),
            feature_group_count=c,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class SeparableConv1D(nn.Module):
    filters: int
    kernel_size: int
    strides: int = 1
    padding: Union[str, Sequence] = "same"
    dilation: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = DepthwiseConv1D(
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            dilation=self.dilation,
            use_bias=False,
            dtype=self.dtype,
            name="depthwise",
        )(x)
        x = nn.Conv(
            features=self.filters,
            kernel_size=(1,),
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="pointwise",
        )(x)
        return x
