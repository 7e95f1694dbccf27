"""SpecAugment / GaussNoise behavior tests."""

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowasr_tpu.augmentations import Augmentation


def test_freq_masking_masks_a_band():
    aug = Augmentation({"feature_augment": {"freq_masking": {"num_masks": 2, "mask_factor": 10}}})
    x = jnp.ones((2, 50, 80))
    lens = jnp.asarray([50, 30])
    y, ylens = aug.feature_augment(x, lens, jax.random.PRNGKey(0))
    assert y.shape == x.shape
    np.testing.assert_array_equal(np.asarray(ylens), np.asarray(lens))
    # some bins masked to zero, full columns along time
    zeros = np.asarray(y[0] == 0.0)
    masked_bins = zeros.all(axis=0)
    assert masked_bins.sum() > 0
    assert masked_bins.sum() <= 20  # at most num_masks * mask_factor


def test_time_masking_respects_p_upperbound():
    aug = Augmentation({"feature_augment": {"time_masking": {"num_masks": 1, "p_upperbound": 0.1}}})
    x = jnp.ones((1, 100, 8))
    y, _ = aug.feature_augment(x, jnp.asarray([100]), jax.random.PRNGKey(1))
    masked_frames = np.asarray(y[0] == 0.0).all(axis=1)
    assert masked_frames.sum() <= 10


def test_time_masking_stays_within_valid_region():
    aug = Augmentation({"feature_augment": {"time_masking": {"num_masks": 4, "p_upperbound": 1.0}}})
    x = jnp.ones((1, 100, 8))
    for seed in range(5):
        y, _ = aug.feature_augment(x, jnp.asarray([40]), jax.random.PRNGKey(seed))
        masked_frames = np.flatnonzero(np.asarray(y[0] == 0.0).all(axis=1))
        if masked_frames.size:
            assert masked_frames.max() < 40


def test_gauss_noise_only_valid_region():
    aug = Augmentation({"signal_augment": {"gauss_noise": {"stddev": 0.1, "prob": 1.0}}})
    x = jnp.zeros((1, 100))
    y, _ = aug.signal_augment(x, jnp.asarray([50]), jax.random.PRNGKey(0))
    y = np.asarray(y)
    assert np.abs(y[0, :50]).sum() > 0
    np.testing.assert_array_equal(y[0, 50:], 0.0)


def test_mask_value_mean():
    aug = Augmentation({"feature_augment": {"freq_masking": {"num_masks": 1, "mask_factor": 80, "mask_value": "mean"}}})
    x = jnp.tile(jnp.arange(80.0)[None, None, :], (1, 10, 1))
    y, _ = aug.feature_augment(x, jnp.asarray([10]), jax.random.PRNGKey(3))
    y = np.asarray(y)
    masked = np.isclose(y[0], x.mean()).all(axis=0)
    assert masked.sum() > 0


def test_noop_when_no_config():
    aug = Augmentation({})
    x = jnp.ones((2, 10, 4))
    y, _ = aug.feature_augment(x, jnp.asarray([10, 10]), jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_augment_under_jit():
    aug = Augmentation({"feature_augment": {"freq_masking": {}, "time_masking": {}}})
    fn = jax.jit(lambda x, l, k: aug.feature_augment(x, l, k))
    y, _ = fn(jnp.ones((2, 50, 80)), jnp.asarray([50, 25]), jax.random.PRNGKey(0))
    assert y.shape == (2, 50, 80)
