"""Convolution layers with "causal" padding support.

Reference parity (``tensorflow_asr/models/layers/convolution.py:25-37``):
``causal`` padding left-pads EVERY spatial axis by ``dilation·(k−1)`` —
for Conv2D that includes the frequency axis (``width_pad`` in the
reference), not just time. Thin wrappers over ``flax.linen.Conv`` keeping
params f32 and compute in ``dtype``.

Strided Conv2D additionally has a gather-free im2col path (OPT-IN, a
recorded negative result): XLA's TPU lowering of small-channel strided
convs runs ~5× over analytic on the subsampling stack (measured 8.7 ms for
~1.7 ms of math at bs16×16 s, where conv_0 has C_in=1), so kt·kf strided
SLICES + one MXU GEMM — the trick that cut the frontend's framing
13.3→6.0 ms (e193fa1) — looked promising. Measured on v5e it is 6.9×
WORSE (subsample stack 68.7 vs 10.0 ms): unlike the frontend, whose slices
keep a large lane dim, these patch tensors have tiny minor dims (9 for
conv_0) that tile-pad to 128 lanes, and the sublane-strided slices/their
pad-dilate VJPs become relayout copies. XLA's native conv stays default
(TFASR_CONV2D_IMPL=xla|auto); im2col remains for non-TPU experiments.
"""

from __future__ import annotations

import os
from typing import Any, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp


def _use_im2col_conv2d(padding) -> bool:
    """im2col Conv2D dispatch (TFASR_CONV2D_IMPL=auto|im2col|xla). Measured
    6.9× SLOWER than XLA's native conv on v5e (see module docstring), so
    ``auto`` keeps the conv; ``im2col`` opts in (exact up to reassociation,
    tests/test_layers.py). String paddings other than "causal" always keep
    flax's conv."""
    if os.environ.get("TFASR_CONV2D_IMPL", "auto").lower() != "im2col":
        return False
    return not (isinstance(padding, str) and padding.lower() not in ("causal",))


def _conv2d_im2col(x: jax.Array, kernel: jax.Array, bias, strides, pads, dtype) -> jax.Array:
    """[B, T, F, C] → [B, T', F', O] via kt·kf strided slices + one GEMM.

    ``pads``: explicit ((t0, t1), (f0, f1)); slice order (i-major, then j,
    then c) matches ``kernel.reshape(kt·kf·C, O)`` for flax's [kt, kf, C, O]
    kernel layout, so results equal ``nn.Conv`` up to float reassociation.
    """
    kt, kf, c, o = kernel.shape
    st, sf = strides
    xp = jnp.pad(x, ((0, 0), pads[0], pads[1], (0, 0)))
    b, tp, fp, _ = xp.shape
    t_out = (tp - kt) // st + 1
    f_out = (fp - kf) // sf + 1
    cols = [
        jax.lax.slice(xp, (0, i, j, 0), (b, i + st * (t_out - 1) + 1, j + sf * (f_out - 1) + 1, c), (1, st, sf, 1))
        for i in range(kt)
        for j in range(kf)
    ]
    patches = jnp.concatenate(cols, axis=-1).astype(dtype)  # [B, T', F', kt·kf·C]
    y = jax.lax.dot_general(
        patches.reshape(b * t_out * f_out, kt * kf * c),
        kernel.reshape(kt * kf * c, o).astype(dtype),
        (((1,), (0,)), ((), ())),
    )
    if bias is not None:
        y = y + bias.astype(dtype)
    return y.reshape(b, t_out, f_out, o)


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
        conv = nn.Conv(
            features=self.filters,
            kernel_size=tuple(self.kernel_size),
            strides=tuple(self.strides),
            padding=pad,
            kernel_dilation=tuple(self.dilation),
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )
        if self.is_initializing() or tuple(self.dilation) != (1, 1) or not _use_im2col_conv2d(self.padding):
            return conv(x)
        # im2col fast path on the SAME param tree (conv registered at init)
        params = self.get_variable("params", "Conv_0")
        return _conv2d_im2col(
            x.astype(self.dtype),
            params["kernel"],
            params["bias"] if self.use_bias else None,
            tuple(self.strides),
            tuple(pad),
            self.dtype,
        )


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
