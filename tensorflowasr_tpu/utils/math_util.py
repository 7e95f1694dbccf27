"""Pure math helpers shared across the framework.

JAX-native equivalents of the reference's ``tensorflow_asr/utils/math_util.py``
(length arithmetic, masked fills, stable log-space ops) plus TPU-alignment
helpers. All functions are jit-safe (static where shapes must be static).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


# ----------------------------- static arithmetic ----------------------------- #


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, multiple: int) -> int:
    return cdiv(x, multiple) * multiple


def log10(x):
    return jnp.log(x) / jnp.log(10.0)


def get_nframes(nsamples, frame_length: int, frame_step: int, pad_end: bool = True, use_librosa_like_stft: bool = False, nfft: int | None = None):
    """Number of STFT frames produced for ``nsamples`` samples.

    Matches reference ``FeatureExtraction.get_nframes``
    (models/layers/feature_extraction.py:305-313): with ``pad_end`` the count
    is ``ceil(n / step)``; otherwise ``1 + (n - window) // step`` where window
    is ``nfft`` for librosa-style STFT and ``frame_length`` otherwise.
    Works on ints and traced integer arrays.
    """
    if use_librosa_like_stft:
        window = nfft if nfft is not None else frame_length
    else:
        window = frame_length
    if pad_end:
        return -(-nsamples // frame_step)
    return 1 + (nsamples - window) // frame_step


def conv_output_length(input_length, filter_size: int, padding: str, stride: int, dilation: int = 1):
    """Output length of a conv over ``input_length`` steps.

    Same contract as reference ``math_util.conv_output_length``
    (utils/math_util.py:282-305). ``padding`` in {"same", "valid", "full",
    "causal"}.
    """
    if input_length is None:
        return None
    assert padding in {"same", "valid", "full", "causal"}
    dilated_filter_size = filter_size + (filter_size - 1) * (dilation - 1)
    if padding in ("same", "causal"):
        output_length = input_length
    elif padding == "valid":
        output_length = input_length - dilated_filter_size + 1
    else:  # full
        output_length = input_length + dilated_filter_size - 1
    return (output_length + stride - 1) // stride


def legacy_get_reduced_length(length, reduction_factor: int):
    """ceil(length / reduction_factor) for time-reduction layers."""
    if length is None:
        return None
    return -(-length // reduction_factor)


def get_reduced_length(length, reduction_factor: int):
    return legacy_get_reduced_length(length, reduction_factor)


def nearest_power_of_2(x: int) -> int:
    return 2 ** math.ceil(math.log2(x)) if x > 0 else 1


# ------------------------------- masking ops -------------------------------- #


def sequence_mask(lengths, maxlen: int, dtype=jnp.bool_):
    """[..., maxlen] mask, True where position < length."""
    positions = jnp.arange(maxlen, dtype=jnp.int32)
    mask = positions[None, :] < jnp.asarray(lengths, jnp.int32).reshape(-1, 1)
    mask = mask.reshape((*jnp.shape(lengths), maxlen))
    return mask.astype(dtype)


def masked_fill(tensor, mask, value=0.0):
    """Fill positions where mask is False with ``value``.

    Reference parity: ``math_util.masked_fill`` (mask True = keep).
    """
    return jnp.where(mask, tensor, jnp.asarray(value, tensor.dtype))


def apply_mask(tensor, mask, axes: Sequence[int] | None = None):
    """Zero out padded positions. ``mask`` is broadcast along feature dims."""
    if mask is None:
        return tensor
    m = mask
    while m.ndim < tensor.ndim:
        m = m[..., None]
    return tensor * m.astype(tensor.dtype)


def merge_two_last_dims(x):
    shape = x.shape
    return x.reshape((*shape[:-2], shape[-2] * shape[-1]))


def merge_two_first_dims(x):
    shape = x.shape
    return x.reshape((shape[0] * shape[1], *shape[2:]))


# ----------------------------- log-space helpers ----------------------------- #

LOG_0 = -1e30  # practical -inf that survives bf16->f32 casts without NaN


def log_plus(a, b):
    """Stable log(exp(a)+exp(b)) treating LOG_0 as -inf."""
    m = jnp.maximum(a, b)
    return m + jnp.log1p(jnp.exp(-jnp.abs(a - b)))


def logsumexp(x, axis=-1, keepdims=False):
    return jax.nn.logsumexp(x, axis=axis, keepdims=keepdims)


# ------------------------------ misc numerics ------------------------------- #


def add_gauss_noise(key, tensors, stddev: float = 0.075):
    """Additive gaussian noise to a pytree (gradient-noise regularizer).

    Reference parity: ``math_util.add_gauss_noise`` (utils/math_util.py:367).
    """
    leaves, treedef = jax.tree_util.tree_flatten(tensors)
    keys = jax.random.split(key, len(leaves))
    noised = [l + stddev * jax.random.normal(k, l.shape, l.dtype) for l, k in zip(leaves, keys)]
    return jax.tree_util.tree_unflatten(treedef, noised)


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def find_max_length_jit_safe(lengths):
    return jnp.max(lengths)


def pad_to_multiple(x, axis: int, multiple: int, value=0.0):
    """Pad ``axis`` of x up to the next multiple (TPU lane/sublane alignment)."""
    size = x.shape[axis]
    target = round_up(size, multiple)
    if target == size:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - size)
    return jnp.pad(x, pads, constant_values=value)
