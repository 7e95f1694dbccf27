"""In-model feature extraction layer (frontend + train-time augmentation).

Mirrors the reference's ``FeatureExtraction`` Keras layer
(``models/layers/feature_extraction.py:33,255-303``): the frontend runs
inside the model so the exported inference function is raw audio → text.
Augmentation (signal stage before the frontend, feature stage after) only
runs when ``train=True`` and draws randomness from the flax
``"augment"`` RNG stream.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from tensorflowasr_tpu.augmentations import Augmentation
from tensorflowasr_tpu.ops import frontend


def _use_pallas_frontend(cfg, backend: str | None = None) -> bool:
    """Fused frontend kernel dispatch (TFASR_FRONTEND_IMPL=auto|pallas|xla).

    ``auto`` (default) picks the Pallas kernel on accelerators (measured
    6.9 vs 8.0 ms fwd at the bs16 bench shape, docs/design/step_profile_r4.md)
    and keeps XLA on CPU, where the kernel would run in interpret mode.
    The kernel hardcodes pad-end framing and natural log; other configs
    always take the XLA path (ADVICE r3)."""
    import os

    impl = os.environ.get("TFASR_FRONTEND_IMPL", "auto").lower()
    if impl == "xla":
        return False
    supported = (
        cfg.feature_type == "log_mel_spectrogram"
        and not cfg.use_librosa_like_stft
        and cfg.pad_end
        and cfg.log_base == "e"
    )
    if impl == "pallas":
        return supported
    backend = backend if backend is not None else jax.default_backend()
    # explicit TPU allowlist (ADVICE r4): an unexpected non-TPU accelerator
    # backend falls back to XLA rather than an untested Mosaic lowering
    return supported and backend in ("tpu", "axon")


class FeatureExtraction(nn.Module):
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
    nfft: int = 512
    normalize_signal: bool = False
    normalize_zscore: bool = False
    normalize_min_max: bool = False
    padding: int = 0
    augmentation_config: dict | None = None
    dtype: Any = jnp.float32

    @property
    def config(self) -> frontend.FrontendConfig:
        return frontend.FrontendConfig(
            sample_rate=self.sample_rate,
            frame_ms=self.frame_ms,
            stride_ms=self.stride_ms,
            num_feature_bins=self.num_feature_bins,
            feature_type=self.feature_type,
            preemphasis=self.preemphasis,
            pad_end=self.pad_end,
            use_librosa_like_stft=self.use_librosa_like_stft,
            epsilon=self.epsilon,
            lower_edge_hertz=self.lower_edge_hertz,
            upper_edge_hertz=self.upper_edge_hertz,
            log_base=self.log_base,
            nfft=self.nfft,
            normalize_signal=self.normalize_signal,
            normalize_zscore=self.normalize_zscore,
            normalize_min_max=self.normalize_min_max,
            padding=self.padding,
        )

    @property
    def time_reduction_factor(self) -> int:
        return 1

    def get_nframes(self, nsamples):
        return self.config.get_nframes(nsamples)

    @nn.compact
    def __call__(self, signals: jax.Array, signals_length: jax.Array, train: bool = False):
        """[B, N] raw audio → ([B, T, F] features in self.dtype, [B] lengths)."""
        aug = Augmentation(self.augmentation_config)
        cfg = self.config

        if train and (aug.signal_augmentations or aug.feature_augmentations):
            key = self.make_rng("augment")
            k_sig, k_feat = jax.random.split(key)
        else:
            k_sig = k_feat = None

        if train and aug.signal_augmentations:
            signals, signals_length = aug.signal_augment(signals, signals_length, k_sig)

        if _use_pallas_frontend(cfg):
            # Signal-stage prep (padding/normalize/preemphasis) is one cheap
            # elementwise pass over [B, N] in XLA; the kernel fuses framing →
            # windowed DFT (MXU matmuls) → power → mel → log. Feature-stage
            # normalization applies after, matching extract_features order.
            import os

            from tensorflowasr_tpu.ops.pallas import frontend_kernel

            # v2 fuses the framing in-kernel (no [B·T, fl] HBM frames);
            # v1 is the r4 default pending the v2 on-chip measurement.
            kernel_fn = (
                frontend_kernel.log_mel_spectrogram_pallas_v2
                if os.environ.get("TFASR_FRONTEND_KERNEL", "v1").lower() == "v2"
                else frontend_kernel.log_mel_spectrogram_pallas
            )
            sig = signals
            if cfg.padding > 0:
                sig = jnp.pad(sig, ((0, 0), (0, cfg.padding)))
            sig = frontend.normalize_signal(sig, cfg)
            sig = frontend.preemphasis_signal(sig, cfg)
            features = kernel_fn(sig, cfg)
            features = frontend.normalize_audio_features(features, cfg)
            features_length = cfg.get_nframes(jnp.asarray(signals_length, jnp.int32))
        else:
            features, features_length = frontend.extract_features(signals, signals_length, cfg)

        if train and aug.feature_augmentations:
            features, features_length = aug.feature_augment(features, features_length, k_feat)

        return features.astype(self.dtype), features_length
