"""Audio feature frontend: STFT → {spectrogram, log-mel, MFCC, log-gammatone}.

Pure-JAX, jit/vmap-safe, static-shape equivalent of the reference's in-model
``FeatureExtraction`` layer (tensorflow_asr/models/layers/feature_extraction.py):

- framing + Hann window + rfft with ``pad_end`` (tf.signal.stft parity, :192-212)
- optional librosa-style centered window over nfft-long frames
- HTK mel filterbank (tf.signal.linear_to_mel_weight_matrix parity, :220-231)
- MFCC via orthogonally-scaled DCT-II (tf.signal.mfccs_from_log_mel_spectrograms)
- ERB-space gammatone filterbank (features/gammatone.py)
- signal normalization, preemphasis (:164-175), z-score/min-max feature
  normalization (:179-190), frame-count arithmetic (:305-313)

The frontend runs inside the model so the exported function goes raw
audio → transcript. Everything here is batched [B, nsamples] → [B, T, F].
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowasr_tpu.utils import math_util


# ------------------------------- windows/framing ------------------------------ #


def hann_window(length: int, dtype=jnp.float32) -> jax.Array:
    """Periodic Hann window (tf.signal.hann_window(periodic=True) parity)."""
    n = np.arange(length)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / length)
    return jnp.asarray(w, dtype)


def frame_signal(signal: jax.Array, frame_length: int, frame_step: int, pad_end: bool = True) -> jax.Array:
    """Frame [B, N] → [B, T, frame_length] (tf.signal.frame parity).

    With ``pad_end`` the signal is zero-padded so every window of the
    ``ceil(N/step)`` frames is complete.
    """
    b, n = signal.shape
    if pad_end:
        nframes = math_util.cdiv(n, frame_step)
        target = (nframes - 1) * frame_step + frame_length
        if target > n:
            signal = jnp.pad(signal, ((0, 0), (0, target - n)))
    else:
        nframes = max(0, 1 + (n - frame_length) // frame_step)
    if nframes == 0:
        return jnp.zeros((b, 0, frame_length), signal.dtype)

    # Gather-free framing. XLA gathers with [T, L] index arrays run
    # pathologically on this TPU compiler (CLAUDE.md; measured 13 ms of the
    # bs16 train step). Instead slice the signal into gcd(step, length)
    # chunks and build each frame from L/c strided slices — dense copies XLA
    # lowers natively.
    c = math.gcd(frame_step, frame_length)
    if c >= 8:
        k, s = frame_length // c, frame_step // c
        need = (nframes - 1) * frame_step + frame_length
        if signal.shape[1] < need:
            signal = jnp.pad(signal, ((0, 0), (0, need - signal.shape[1])))
        nchunks = signal.shape[1] // c
        chunks = signal[:, : nchunks * c].reshape(b, nchunks, c)
        parts = [chunks[:, j : j + s * (nframes - 1) + 1 : s] for j in range(k)]
        return jnp.stack(parts, axis=2).reshape(b, nframes, frame_length)

    starts = jnp.arange(nframes) * frame_step
    idx = starts[:, None] + jnp.arange(frame_length)[None, :]  # [T, L]
    return signal[:, idx]  # [B, T, L]


# ----------------------------- filterbank matrices ---------------------------- #


def _hertz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)


@functools.lru_cache(maxsize=None)
def linear_to_mel_weight_matrix(
    num_mel_bins: int = 80,
    num_spectrogram_bins: int = 257,
    sample_rate: int = 16000,
    lower_edge_hertz: float = 0.0,
    upper_edge_hertz: float = 8000.0,
) -> np.ndarray:
    """HTK mel filterbank, tf.signal.linear_to_mel_weight_matrix parity.

    Returns float32 [num_spectrogram_bins, num_mel_bins]; the DC FFT bin row
    is zero (tf excludes it the same way).
    """
    bands_to_zero = 1
    nyquist = sample_rate / 2.0
    freqs = np.linspace(0.0, nyquist, num_spectrogram_bins)[bands_to_zero:]
    spectrogram_bins_mel = _hertz_to_mel(freqs)[:, None]  # [S-1, 1]

    edges = np.linspace(_hertz_to_mel(lower_edge_hertz), _hertz_to_mel(upper_edge_hertz), num_mel_bins + 2)
    lower, center, upper = edges[:-2][None, :], edges[1:-1][None, :], edges[2:][None, :]

    lower_slopes = (spectrogram_bins_mel - lower) / (center - lower)
    upper_slopes = (upper - spectrogram_bins_mel) / (upper - center)
    weights = np.maximum(0.0, np.minimum(lower_slopes, upper_slopes))
    return np.pad(weights, [[bands_to_zero, 0], [0, 0]]).astype(np.float32)


def _erb_space(low_freq: float, high_freq: float, n: int) -> np.ndarray:
    """Center frequencies on an ERB scale (Glasberg & Moore)."""
    ear_q = 9.26449
    min_bw = 24.7
    return -ear_q * min_bw + np.exp(np.arange(1, n + 1) * (-np.log(high_freq + ear_q * min_bw) + np.log(low_freq + ear_q * min_bw)) / n) * (
        high_freq + ear_q * min_bw
    )


@functools.lru_cache(maxsize=None)
def gammatone_fft_weights(
    nfft: int,
    sample_rate: int,
    num_bins: int,
    width: float = 1.0,
    fmin: float = 0.0,
    fmax: float = 8000.0,
    maxlen: Optional[int] = None,
) -> np.ndarray:
    """ERB-space gammatone filterbank applied in the FFT domain.

    Exact Patterson-Holdsworth/Slaney filterbank (Apple TR #35; the math the
    reference ``features/gammatone.fft_weights`` implements, features/
    gammatone.py:28): 4th-order gammatone magnitude response at FFT bin
    frequencies built from the ERB filter coefficients, normalized by the
    analytic filter gain. Returns float32 [maxlen(=nfft//2+1), num_bins]
    with columns ordered low→high center frequency.
    """
    ear_q = 9.26449  # Glasberg & Moore
    min_bw = 24.7

    if maxlen is None:
        maxlen = nfft // 2 + 1
    maxlen = int(maxlen)
    n_bins = nfft // 2 + 1

    cf = _erb_space(float(fmin), float(fmax), num_bins)[::-1]  # low→high
    t = 1.0 / sample_rate
    erb = width * ((cf / ear_q) + min_bw)
    b = 1.019 * 2.0 * np.pi * erb

    arg = 2.0 * cf * np.pi * t
    vec = np.exp(2j * arg)

    a0 = t
    a2 = 0.0
    b0 = 1.0
    b1 = -2.0 * np.cos(arg) / np.exp(b * t)
    b2 = np.exp(-2.0 * b * t)

    rt_pos = np.sqrt(3.0 + 2.0**1.5)
    rt_neg = np.sqrt(3.0 - 2.0**1.5)

    common = -t * np.exp(-b * t)
    k11 = np.cos(arg) + rt_pos * np.sin(arg)
    k12 = np.cos(arg) - rt_pos * np.sin(arg)
    k13 = np.cos(arg) + rt_neg * np.sin(arg)
    k14 = np.cos(arg) - rt_neg * np.sin(arg)

    a11 = common * k11
    a12 = common * k12
    a13 = common * k13
    a14 = common * k14

    exp_bt = np.exp(b * t)
    gain_num = (
        (-2.0 * vec * t + 2.0 * np.exp(1j * arg) / exp_bt * t * k12)
        * (-2.0 * vec * t + 2.0 * np.exp(1j * arg) / exp_bt * t * k11)
        * (-2.0 * vec * t + 2.0 * np.exp(1j * arg) / exp_bt * t * k14)
        * (-2.0 * vec * t + 2.0 * np.exp(1j * arg) / exp_bt * t * k13)
    )
    gain_den = (-2.0 / np.exp(2.0 * b * t) - 2.0 * vec + 2.0 * (1.0 + vec) / exp_bt) ** 4
    gain = np.abs(gain_num / gain_den)

    ucirc = np.exp(1j * 2.0 * np.pi * np.arange(n_bins) / nfft)[None, :]  # [1, S]
    pole = (np.sqrt(b2) * np.exp(1j * arg))[:, None]

    weights = (
        np.abs(ucirc + a11[:, None] * sample_rate)
        * np.abs(ucirc + a12[:, None] * sample_rate)
        * np.abs(ucirc + a13[:, None] * sample_rate)
        * np.abs(ucirc + a14[:, None] * sample_rate)
        * np.abs(sample_rate * (pole - ucirc) * (np.conj(pole) - ucirc)) ** (-4.0)
        / gain[:, None]
    )
    del a0, a2, b0, b1  # (documented coefficients of the TR#35 filter stages)
    weights = weights[:, :maxlen]
    return np.ascontiguousarray(weights.T).astype(np.float32)


# --------------------------------- dct / mfcc --------------------------------- #


def dct_type2_ortho_scaled(x: jax.Array, dtype=None) -> jax.Array:
    """tf.signal.mfccs_from_log_mel_spectrograms parity.

    DCT-II computed along the last axis, scaled by ``rsqrt(2N)`` where N is
    the number of mel bins (tf's mfcc scaling).
    """
    n = x.shape[-1]
    # DCT-II via matmul: small N (80) — a [N, N] matmul maps onto the MXU
    k = np.arange(n)
    mat = 2.0 * np.cos(np.pi * (2.0 * k[:, None] + 1.0) * k[None, :] / (2.0 * n))
    mat = jnp.asarray(mat * (1.0 / np.sqrt(2.0 * n)), x.dtype if dtype is None else dtype)
    return jnp.matmul(x, mat)


# ------------------------------- config + apply ------------------------------- #

FEATURE_TYPES = ("spectrogram", "log_mel_spectrogram", "mfcc", "log_gammatone_spectrogram")


@dataclasses.dataclass(frozen=True)
class FrontendConfig:
    sample_rate: int = 16000
    frame_ms: int = 25
    stride_ms: int = 10
    num_feature_bins: int = 80
    feature_type: str = "log_mel_spectrogram"
    preemphasis: float = 0.97
    pad_end: bool = True
    use_librosa_like_stft: bool = False
    epsilon: float = 1e-6
    lower_edge_hertz: float = 0.0
    upper_edge_hertz: float = 8000.0
    log_base: str = "e"
    nfft: Optional[int] = 512
    normalize_signal: bool = False
    normalize_zscore: bool = False
    normalize_min_max: bool = False
    padding: int = 0

    def __post_init__(self):
        assert self.feature_type in FEATURE_TYPES, f"feature_type must be in {FEATURE_TYPES}"
        assert self.log_base in ("10", "e")
        assert 1e-9 < self.epsilon <= 0.001

    @property
    def frame_length(self) -> int:
        return int(round(self.sample_rate * self.frame_ms / 1000.0))

    @property
    def frame_step(self) -> int:
        return int(round(self.sample_rate * self.stride_ms / 1000.0))

    @property
    def fft_length(self) -> int:
        return self.frame_length if self.nfft is None else self.nfft

    def get_nframes(self, nsamples):
        return math_util.get_nframes(
            nsamples,
            self.frame_length,
            self.frame_step,
            pad_end=self.pad_end,
            use_librosa_like_stft=self.use_librosa_like_stft,
            nfft=self.fft_length,
        )

    def get_signal_chunk_size_and_step(self, nframes: int) -> tuple[int, int]:
        """Chunk math for exact streaming STFT equivalence (reference :141-162)."""
        chunk_size = (nframes - 1) * self.frame_step + self.frame_length
        chunk_step = nframes * self.frame_step
        return chunk_size, chunk_step


def _logarithm(s: jax.Array, config: FrontendConfig) -> jax.Array:
    s = s + jnp.asarray(config.epsilon, s.dtype)
    if config.log_base == "10":
        return math_util.log10(s)
    return jnp.log(s)


def stft_magnitude_squared(signal: jax.Array, config: FrontendConfig) -> jax.Array:
    """|STFT|² of [B, N] → [B, T, nfft//2+1], computed in float32."""
    orig_dtype = signal.dtype
    if orig_dtype in (jnp.float16, jnp.bfloat16):
        signal = signal.astype(jnp.float32)
    nfft = config.fft_length
    if config.use_librosa_like_stft:
        window = hann_window(config.frame_length)
        left = (nfft - config.frame_length) // 2
        right = nfft - config.frame_length - left
        window = jnp.pad(window, (left, right))
        frames = frame_signal(signal, nfft, config.frame_step, config.pad_end)
        frames = frames * window
    else:
        window = hann_window(config.frame_length)
        frames = frame_signal(signal, config.frame_length, config.frame_step, config.pad_end)
        frames = frames * window
        if nfft > config.frame_length:
            frames = jnp.pad(frames, ((0, 0), (0, 0), (0, nfft - config.frame_length)))
    spec = jnp.abs(jnp.fft.rfft(frames, n=nfft, axis=-1)) ** 2
    return spec.astype(orig_dtype) if orig_dtype in (jnp.float16, jnp.bfloat16) else spec


def normalize_signal(signal: jax.Array, config: FrontendConfig) -> jax.Array:
    if not config.normalize_signal:
        return signal
    gain = 1.0 / (jnp.max(jnp.abs(signal), axis=1, keepdims=True) + config.epsilon)
    return signal * gain


def preemphasis_signal(signal: jax.Array, config: FrontendConfig) -> jax.Array:
    if not config.preemphasis or config.preemphasis <= 0.0:
        return signal
    s0 = signal[:, :1]
    s1 = signal[:, 1:] - config.preemphasis * signal[:, :-1]
    return jnp.concatenate([s0, s1], axis=-1)


def normalize_audio_features(features: jax.Array, config: FrontendConfig) -> jax.Array:
    if config.normalize_zscore:
        mean = jnp.mean(features, axis=1, keepdims=True)
        std = jnp.sqrt(jnp.var(features, axis=1, keepdims=True) + config.epsilon)
        return (features - mean) / std
    if config.normalize_min_max:
        if config.feature_type.startswith("log_") or config.feature_type == "spectrogram":
            min_value = _logarithm(jnp.asarray(0.0, features.dtype), config)
        else:
            min_value = jnp.min(features, axis=1, keepdims=True)
        return (features - min_value) / (jnp.max(features, axis=1, keepdims=True) - min_value)
    return features


def log_mel_spectrogram(signal: jax.Array, config: FrontendConfig) -> jax.Array:
    s = stft_magnitude_squared(signal, config)
    mel = linear_to_mel_weight_matrix(
        num_mel_bins=config.num_feature_bins,
        num_spectrogram_bins=s.shape[-1],
        sample_rate=config.sample_rate,
        lower_edge_hertz=config.lower_edge_hertz,
        upper_edge_hertz=config.upper_edge_hertz,
    )
    return _logarithm(jnp.matmul(s, jnp.asarray(mel, s.dtype)), config)


def spectrogram(signal: jax.Array, config: FrontendConfig) -> jax.Array:
    return _logarithm(stft_magnitude_squared(signal, config), config)[:, :, : config.num_feature_bins]


def mfcc(signal: jax.Array, config: FrontendConfig) -> jax.Array:
    return dct_type2_ortho_scaled(log_mel_spectrogram(signal, config))


def log_gammatone_spectrogram(signal: jax.Array, config: FrontendConfig) -> jax.Array:
    s = stft_magnitude_squared(signal, config)
    gtone = gammatone_fft_weights(
        config.fft_length,
        config.sample_rate,
        config.num_feature_bins,
        width=1.0,
        fmin=config.lower_edge_hertz,
        fmax=config.upper_edge_hertz,
        maxlen=config.fft_length // 2 + 1,
    )
    return _logarithm(jnp.matmul(s, jnp.asarray(gtone, s.dtype)), config)


def extract_features(signal: jax.Array, signal_length: jax.Array, config: FrontendConfig) -> tuple[jax.Array, jax.Array]:
    """Full frontend: [B, N] raw audio → ([B, T, F], [B] frame lengths).

    Matches reference ``FeatureExtraction.call`` (:255-303) minus
    augmentation, which is applied by the caller (training only).
    """
    if config.padding > 0:
        signal = jnp.pad(signal, ((0, 0), (0, config.padding)))
    signal = normalize_signal(signal, config)
    signal = preemphasis_signal(signal, config)

    if config.feature_type == "spectrogram":
        features = spectrogram(signal, config)
    elif config.feature_type == "mfcc":
        features = mfcc(signal, config)
    elif config.feature_type == "log_gammatone_spectrogram":
        features = log_gammatone_spectrogram(signal, config)
    else:
        features = log_mel_spectrogram(signal, config)

    features = normalize_audio_features(features, config)
    features_length = config.get_nframes(jnp.asarray(signal_length, jnp.int32))
    return features, features_length
