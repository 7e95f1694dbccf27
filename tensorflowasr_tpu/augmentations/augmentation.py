"""Config-keyed augmentation registry, applied batched via vmap.

Reference parity: ``Augmentation`` (augmentations/augmentation.py:21-90) —
``signal_augment`` runs on raw audio before the frontend, ``feature_augment``
on spectrogram features after; both only during training. Per-example
randomness comes from split PRNG keys + vmap instead of tf.map_fn.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from tensorflowasr_tpu.augmentations.methods import AugmentationMethod, FreqMasking, GaussNoise, TimeMasking

AUGMENTATIONS = {
    "gauss_noise": GaussNoise,
    "freq_masking": FreqMasking,
    "time_masking": TimeMasking,
}


class Augmentation:
    def __init__(self, config: dict | None = None):
        _config = dict(config or {})
        self.signal_augmentations = self.parse(_config.pop("signal_augment", {}) or {})
        self.feature_augmentations = self.parse(_config.pop("feature_augment", {}) or {})

    @staticmethod
    def parse(config: dict) -> List[AugmentationMethod]:
        augmentations = []
        for key, value in sorted(config.items(), key=lambda kv: kv[0]):
            if key not in AUGMENTATIONS:
                raise KeyError(f"No augmentation named: {key}\nAvailable: {list(AUGMENTATIONS)}")
            augmentations.append(AUGMENTATIONS[key](**(value or {})))
        return augmentations

    def _augment_batch(self, inputs, inputs_length, key, augmentations: List[AugmentationMethod]):
        if not augmentations:
            return inputs, inputs_length

        def per_example(x, length, k):
            keys = jax.random.split(k, len(augmentations))
            for au, kk in zip(augmentations, keys):
                x, length = au.augment(x, length, kk)
            return x, length

        batch = inputs.shape[0]
        keys = jax.random.split(key, batch)
        return jax.vmap(per_example)(inputs, inputs_length, keys)

    def signal_augment(self, inputs, inputs_length, key):
        """[B, N] raw signals → augmented, same shapes."""
        return self._augment_batch(inputs, inputs_length, key, self.signal_augmentations)

    def feature_augment(self, inputs, inputs_length, key):
        """[B, T, F] features → augmented, same shapes."""
        return self._augment_batch(inputs, inputs_length, key, self.feature_augmentations)
