"""Frontend golden tests vs tf.signal (TF used for test oracles only)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflowasr_tpu.ops import frontend

tf = pytest.importorskip("tensorflow")


@pytest.fixture(scope="module")
def audio():
    rng = np.random.default_rng(0)
    t = np.arange(16000 * 2) / 16000.0
    sig = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.standard_normal(len(t))
    return sig.astype(np.float32)[None, :]  # [1, 32000]


CFG = frontend.FrontendConfig()


def test_hann_window_matches_tf():
    ours = np.asarray(frontend.hann_window(400))
    theirs = tf.signal.hann_window(400, periodic=True).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_frame_signal_matches_tf(audio):
    ours = np.asarray(frontend.frame_signal(jnp.asarray(audio), 400, 160, pad_end=True))
    theirs = tf.signal.frame(audio, 400, 160, pad_end=True).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-7)
    ours2 = np.asarray(frontend.frame_signal(jnp.asarray(audio), 400, 160, pad_end=False))
    theirs2 = tf.signal.frame(audio, 400, 160, pad_end=False).numpy()
    np.testing.assert_allclose(ours2, theirs2, atol=1e-7)


def test_stft_matches_tf(audio):
    ours = np.asarray(frontend.stft_magnitude_squared(jnp.asarray(audio), CFG))
    theirs = tf.square(tf.abs(tf.signal.stft(audio, frame_length=400, frame_step=160, fft_length=512, pad_end=True))).numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_mel_matrix_matches_tf():
    ours = frontend.linear_to_mel_weight_matrix(80, 257, 16000, 0.0, 8000.0)
    theirs = tf.signal.linear_to_mel_weight_matrix(80, 257, 16000, 0.0, 8000.0).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_log_mel_matches_tf(audio):
    ours = np.asarray(frontend.log_mel_spectrogram(jnp.asarray(audio), CFG))
    s = tf.square(tf.abs(tf.signal.stft(audio, 400, 160, 512, pad_end=True)))
    mel = tf.signal.linear_to_mel_weight_matrix(80, 257, 16000, 0.0, 8000.0)
    theirs = tf.math.log(tf.matmul(s, mel) + 1e-6).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-3)


def test_mfcc_matches_tf(audio):
    cfg = frontend.FrontendConfig(feature_type="mfcc")
    ours = np.asarray(frontend.mfcc(jnp.asarray(audio), cfg))
    s = tf.square(tf.abs(tf.signal.stft(audio, 400, 160, 512, pad_end=True)))
    mel = tf.signal.linear_to_mel_weight_matrix(80, 257, 16000, 0.0, 8000.0)
    logmel = tf.math.log(tf.matmul(s, mel) + 1e-6)
    theirs = tf.signal.mfccs_from_log_mel_spectrograms(logmel).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-3)


def test_extract_features_shapes_and_lengths(audio):
    feats, lens = frontend.extract_features(jnp.asarray(audio), jnp.asarray([32000]), CFG)
    assert feats.shape == (1, 200, 80)
    assert int(lens[0]) == 200
    # partial length → fewer frames
    _, lens2 = frontend.extract_features(jnp.asarray(audio), jnp.asarray([16000]), CFG)
    assert int(lens2[0]) == 100


def test_extract_features_jit_and_preemph(audio):
    cfg = frontend.FrontendConfig(normalize_signal=True, preemphasis=0.97)
    fn = jax.jit(lambda s, l: frontend.extract_features(s, l, cfg))
    feats, lens = fn(jnp.asarray(audio), jnp.asarray([32000]))
    assert feats.shape == (1, 200, 80)
    assert np.isfinite(np.asarray(feats)).all()


def test_librosa_like_stft_framecount(audio):
    cfg = frontend.FrontendConfig(use_librosa_like_stft=True)
    feats, lens = frontend.extract_features(jnp.asarray(audio), jnp.asarray([32000]), cfg)
    assert feats.shape[1] == cfg.get_nframes(32000)


def test_gammatone_shape_and_finite(audio):
    cfg = frontend.FrontendConfig(feature_type="log_gammatone_spectrogram")
    feats, _ = frontend.extract_features(jnp.asarray(audio), jnp.asarray([32000]), cfg)
    assert feats.shape == (1, 200, 80)
    assert np.isfinite(np.asarray(feats)).all()


def test_zscore_normalization(audio):
    cfg = frontend.FrontendConfig(normalize_zscore=True)
    feats, _ = frontend.extract_features(jnp.asarray(audio), jnp.asarray([32000]), cfg)
    f = np.asarray(feats)
    np.testing.assert_allclose(f.mean(axis=1), 0.0, atol=1e-3)
    np.testing.assert_allclose(f.std(axis=1), 1.0, atol=1e-2)


def test_chunk_math():
    cfg = frontend.FrontendConfig()
    size, step = cfg.get_signal_chunk_size_and_step(16)
    assert size == 15 * 160 + 400
    assert step == 16 * 160


def test_bfloat16_input(audio):
    feats, _ = frontend.extract_features(jnp.asarray(audio, jnp.bfloat16), jnp.asarray([32000]), CFG)
    assert feats.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(feats, np.float32)).all()


@pytest.mark.skipif(not os.path.exists("/root/reference/tensorflow_asr/features/gammatone.py"), reason="reference unavailable")
def test_gammatone_matches_reference_module():
    """Load the reference gammatone module standalone (stub harness) and
    compare filterbanks — ours implements the same Slaney TR#35 math."""
    import importlib.util
    import sys
    import types

    import tensorflow as tf_real

    stub = types.ModuleType("tensorflow_asr")
    stub.tf = tf_real
    shape_stub = types.ModuleType("tensorflow_asr.utils.shape_util")
    shape_stub.shape_list = lambda x, out_type=None: x.shape.as_list()
    utils_stub = types.ModuleType("tensorflow_asr.utils")
    utils_stub.shape_util = shape_stub
    saved = {k: sys.modules.get(k) for k in ("tensorflow_asr", "tensorflow_asr.utils", "tensorflow_asr.utils.shape_util")}
    sys.modules.update({"tensorflow_asr": stub, "tensorflow_asr.utils": utils_stub, "tensorflow_asr.utils.shape_util": shape_stub})
    try:
        spec = importlib.util.spec_from_file_location("ref_gammatone", "/root/reference/tensorflow_asr/features/gammatone.py")
        ref = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref)
        theirs = ref.fft_weights(512, 16000, 80, width=1.0, fmin=0, fmax=8000, maxlen=257).numpy()
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    ours = frontend.gammatone_fft_weights(512, 16000, 80, width=1.0, fmin=0.0, fmax=8000.0, maxlen=257)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-3)
