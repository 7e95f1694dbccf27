"""Pallas fused log-mel frontend: framing → window → DFT → power → mel → log
in a single TPU kernel.

The BASELINE north-star frontend: instead of XLA's rfft (which runs on the
scalar/vector units), the DFT is expressed as two matmuls against fixed
cos/sin bases — [F, nfft] @ [nfft, nbins] lands on the MXU — and the whole
chain (Hann window, |·|², mel projection, log) stays fused in VMEM with the
framed signal never materialized in HBM.

Matches ``ops.frontend.log_mel_spectrogram`` with pad_end framing (golden
test: tests/test_pallas_kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tensorflowasr_tpu.ops import frontend as frontend_ops
from tensorflowasr_tpu.utils.math_util import round_up


@functools.lru_cache(maxsize=None)
def _dft_bases(frame_length: int, nfft: int):
    """Windowed DFT bases: [fl_pad, nbins_pad] cos and -sin, with the Hann
    window folded in. Rows beyond frame_length are zero, so frames may carry
    fl_pad raw samples (the excess contributes nothing)."""
    nbins = nfft // 2 + 1
    nbins_pad = round_up(nbins, 128)
    fl_pad = round_up(frame_length, 128)
    n = np.arange(fl_pad)[:, None]
    k = np.arange(nbins_pad)[None, :]
    ang = 2.0 * np.pi * n * np.minimum(k, nbins - 1) / nfft
    window = np.zeros(fl_pad)
    window[:frame_length] = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(frame_length) / frame_length)
    cos_b = (np.cos(ang) * window[:, None]).astype(np.float32)
    sin_b = (-np.sin(ang) * window[:, None]).astype(np.float32)
    cos_b[:, nbins:] = 0.0
    sin_b[:, nbins:] = 0.0
    return cos_b, sin_b


def _frontend_kernel(frames_ref, cos_ref, sin_ref, mel_ref, out_ref, *, epsilon):
    """One frame-tile grid cell: fused window·DFT → power → mel → log.

    frames_ref: [tile_frames, fl_pad] raw frames (window folded into bases)
    cos/sin: [fl_pad, nbins_pad] windowed DFT bases (zero rows past fl)
    mel_ref: [nbins_pad, nmel_pad]
    out_ref: [tile_frames, nmel_pad]
    """
    frames = frames_ref[:, :]
    re = jnp.dot(frames, cos_ref[:, :], preferred_element_type=jnp.float32)
    im = jnp.dot(frames, sin_ref[:, :], preferred_element_type=jnp.float32)
    power = re * re + im * im
    mel = jnp.dot(power, mel_ref[:, :], preferred_element_type=jnp.float32)
    out_ref[:, :] = jnp.log(mel + epsilon)


def log_mel_spectrogram_pallas(
    signal: jax.Array,
    config: frontend_ops.FrontendConfig,
    frames_per_tile: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """[B, N] → [B, T, num_feature_bins] log-mel, fused in one kernel.

    pad_end framing parity with ``frontend.stft_magnitude_squared``.
    """
    assert not config.use_librosa_like_stft, "librosa-style framing not fused yet"
    interpret = interpret or jax.default_backend() == "cpu"  # Pallas TPU kernels need interpret mode off-TPU
    b, n = signal.shape
    fl, fs, nfft = config.frame_length, config.frame_step, config.fft_length
    fl_pad = round_up(fl, 128)
    nframes = -(-n // fs)  # pad_end
    nbins = nfft // 2 + 1
    nbins_pad = round_up(nbins, 128)
    nmel = config.num_feature_bins
    nmel_pad = round_up(nmel, 128)

    total_frames = b * nframes
    tiles = -(-total_frames // frames_per_tile)
    frames_pad = tiles * frames_per_tile
    # im2col framing in XLA (Mosaic can't dynamic-slice along lanes) via the
    # gather-free strided-slice framing in ops.frontend; the kernel then
    # fuses windowed-DFT → power → mel → log with one HBM read of the frames
    # and one write of the features. Frames carry fl_pad raw samples — the
    # basis rows past frame_length are zero, so the excess contributes
    # nothing.
    frames = frontend_ops.frame_signal(signal.astype(jnp.float32), fl_pad, fs, pad_end=True)
    frames = frames[:, :nframes].reshape(total_frames, fl_pad)
    frames = jnp.pad(frames, ((0, frames_pad - total_frames), (0, 0)))

    cos_b, sin_b = _dft_bases(fl, nfft)
    mel = frontend_ops.linear_to_mel_weight_matrix(nmel, nbins, config.sample_rate, config.lower_edge_hertz, config.upper_edge_hertz)
    mel_pad = np.zeros((nbins_pad, nmel_pad), np.float32)
    mel_pad[:nbins, :nmel] = mel

    kernel = functools.partial(_frontend_kernel, epsilon=float(config.epsilon))
    out = pl.pallas_call(
        kernel,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((frames_per_tile, fl_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((fl_pad, nbins_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((fl_pad, nbins_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nbins_pad, nmel_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((frames_per_tile, nmel_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((frames_pad, nmel_pad), jnp.float32),
        interpret=interpret,
    )(frames, jnp.asarray(cos_b), jnp.asarray(sin_b), jnp.asarray(mel_pad))
    return out[:total_frames].reshape(b, nframes, nmel_pad)[:, :, :nmel]
