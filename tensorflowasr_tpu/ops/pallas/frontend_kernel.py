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


def _precision():
    """In-kernel f32 matmuls default to ONE bf16 MXU pass (CLAUDE.md) —
    silent rounding of the raw audio samples. The DFT/mel dots are tiny
    next to the encoder, so exactness is cheap: HIGHEST (6 passes) by
    default, TFASR_FRONTEND_PREC=high|default to trade it for speed."""
    import os

    name = os.environ.get("TFASR_FRONTEND_PREC", "highest").lower()
    return {
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT,
    }[name]


def _frontend_kernel(frames_ref, cos_ref, sin_ref, mel_ref, out_ref, *, epsilon):
    """One frame-tile grid cell: fused window·DFT → power → mel → log.

    frames_ref: [tile_frames, fl_pad] raw frames (window folded into bases)
    cos/sin: [fl_pad, nbins_pad] windowed DFT bases (zero rows past fl)
    mel_ref: [nbins_pad, nmel_pad]
    out_ref: [tile_frames, nmel_pad]
    """
    prec = _precision()
    frames = frames_ref[:, :]
    re = jnp.dot(frames, cos_ref[:, :], preferred_element_type=jnp.float32, precision=prec)
    im = jnp.dot(frames, sin_ref[:, :], preferred_element_type=jnp.float32, precision=prec)
    power = re * re + im * im
    mel = jnp.dot(power, mel_ref[:, :], preferred_element_type=jnp.float32, precision=prec)
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


# ------------------------- v2: in-kernel framing ------------------------- #


@functools.lru_cache(maxsize=None)
def _dft_basis_rows(frame_length: int, frame_step: int, nfft: int):
    """Row-block windowed DFT basis for in-kernel framing.

    The signal reshaped to stride rows [T', fs] puts frame offset
    ``j = k·fs + lane`` of frame ``t`` at ``rows[t + k, lane]``, so the DFT
    is ``Σ_k rows[t+k] @ basis[k·fs:(k+1)·fs]`` with basis row ``j``
    carrying the Hann-windowed cos/-sin coefficients (zero for j ≥ fl).
    cos and sin ride one combined [KROWS·fs, 2·nbins_pad] matrix so each
    row-block costs a single MXU dot.
    """
    nbins = nfft // 2 + 1
    nbins_pad = round_up(nbins, 128)
    krows = -(-frame_length // frame_step)
    rows = krows * frame_step
    n = np.arange(rows)[:, None]
    k = np.arange(nbins_pad)[None, :]
    ang = 2.0 * np.pi * n * np.minimum(k, nbins - 1) / nfft
    window = np.zeros(rows)
    window[:frame_length] = 0.5 - 0.5 * np.cos(
        2.0 * np.pi * np.arange(frame_length) / frame_length
    )
    cos_b = (np.cos(ang) * window[:, None]).astype(np.float32)
    sin_b = (-np.sin(ang) * window[:, None]).astype(np.float32)
    cos_b[:, nbins:] = 0.0
    sin_b[:, nbins:] = 0.0
    return np.concatenate([cos_b, sin_b], axis=1)  # [KROWS*fs, 2*nbins_pad]


def _frontend_v2_kernel(rows_ref, basis_ref, mel_ref, out_ref, *, epsilon, krows, fs, nbins_pad, ft):
    """One (batch, frame-tile) grid cell with framing done IN VMEM.

    rows_ref: [1, R, fs] the whole per-batch stride-row signal (block index
       is constant across the inner grid dim, so Mosaic copies it once per
       batch); frame t's samples k·fs+lane live at rows[t+k, lane].
    basis_ref: [krows*fs, 2*nbins_pad] combined windowed cos|sin basis.
    out_ref: [1, ft, nmel_pad]
    """
    prec = _precision()
    f0 = pl.program_id(1) * ft
    # One aligned superset load (f0 = i·ft is provably a sublane multiple;
    # f0+k for k>0 is not — Mosaic rejects unprovable dynamic sublane
    # starts), then the k-shifted row views are static slices of the value.
    blk_full = rows_ref[0, pl.ds(f0, ft + 8), :]  # [ft+8, fs]
    acc = jnp.zeros((ft, 2 * nbins_pad), jnp.float32)
    for k in range(krows):
        blk = jax.lax.slice_in_dim(blk_full, k, k + ft, axis=0)  # [ft, fs]
        acc = acc + jax.lax.dot_general(
            blk,
            basis_ref[k * fs : (k + 1) * fs, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )
    re = acc[:, :nbins_pad]
    im = acc[:, nbins_pad:]
    power = re * re + im * im
    mel = jnp.dot(power, mel_ref[:, :], preferred_element_type=jnp.float32, precision=prec)
    out_ref[0] = jnp.log(mel + epsilon)


def log_mel_spectrogram_pallas_v2(
    signal: jax.Array,
    config: frontend_ops.FrontendConfig,
    frames_per_tile: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """[B, N] → [B, T, num_feature_bins] log-mel with framing fused in-kernel.

    v1 materializes [B·T, fl_pad] frames in HBM (a ~3.2× blow-up of the
    signal at the canonical 25 ms/10 ms config: every sample lands in
    fl_pad/fs frames) before the kernel reads them back. v2's only HBM
    traffic is the raw signal once: XLA reshapes [B, N] → [B, N/fs, fs]
    stride rows (layout-free), the kernel keeps the per-batch rows resident
    in VMEM across its frame tiles and assembles each frame as ceil(fl/fs)
    sublane-shifted row blocks contracted straight against windowed DFT
    basis slices. pad_end framing parity with v1/XLA.
    """
    assert not config.use_librosa_like_stft, "librosa-style framing not fused yet"
    interpret = interpret or jax.default_backend() == "cpu"
    b, n = signal.shape
    fl, fs, nfft = config.frame_length, config.frame_step, config.fft_length
    if not v2_shapes_supported(n, fl, fs):
        return log_mel_spectrogram_pallas(signal, config, interpret=interpret)
    nframes = -(-n // fs)  # pad_end
    nbins = nfft // 2 + 1
    nbins_pad = round_up(nbins, 128)
    nmel = config.num_feature_bins
    nmel_pad = round_up(nmel, 128)
    krows = -(-fl // fs)

    ft = min(frames_per_tile, round_up(nframes, 8))
    tiles = -(-nframes // ft)
    rows_needed = tiles * ft + 8  # the kernel's aligned superset load is ft+8 rows
    sig = signal.astype(jnp.float32)
    sig = jnp.pad(sig, ((0, 0), (0, rows_needed * fs - n)))
    rows = sig.reshape(b, rows_needed, fs)

    basis = _dft_basis_rows(fl, fs, nfft)
    mel = frontend_ops.linear_to_mel_weight_matrix(
        nmel, nbins, config.sample_rate, config.lower_edge_hertz, config.upper_edge_hertz
    )
    mel_pad = np.zeros((nbins_pad, nmel_pad), np.float32)
    mel_pad[:nbins, :nmel] = mel

    kernel = functools.partial(
        _frontend_v2_kernel,
        epsilon=float(config.epsilon),
        krows=krows,
        fs=fs,
        nbins_pad=nbins_pad,
        ft=ft,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, tiles),
        in_specs=[
            pl.BlockSpec((1, rows_needed, fs), lambda bb, i: (bb, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((krows * fs, 2 * nbins_pad), lambda bb, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nbins_pad, nmel_pad), lambda bb, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ft, nmel_pad), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, tiles * ft, nmel_pad), jnp.float32),
        interpret=interpret,
        compiler_params=_V2_VMEM_LIMIT,
    )(rows, jnp.asarray(basis), jnp.asarray(mel_pad))
    return out[:, :nframes, :nmel]


_V2_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def v2_shapes_supported(n: int, fl: int, fs: int) -> bool:
    """fs must be sublane-aligned (the in-kernel row slices start at
    f0+k, any alignment, but basis slices sit at k·fs) and the per-batch
    stride rows must fit VMEM next to basis + accumulators."""
    if fs % 8 != 0 or fl <= 0 or fs <= 0:
        return False
    if -(-fl // fs) > 8:  # k-shifted views live inside one ft+8 superset load
        return False
    nframes = -(-n // fs)
    rows_bytes = (nframes + 16) * fs * 4
    return rows_bytes <= 64 * 1024 * 1024
