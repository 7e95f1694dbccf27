"""Native C++ FLAC decoder: bit-exactness vs the pure-Python decoder."""

import os

import numpy as np
import pytest

from tensorflowasr_tpu import native
from tensorflowasr_tpu.data import audio

REF_FLAC = "/root/reference/tests/test.flac"

pytestmark = pytest.mark.skipif(native.lib() is None, reason="no C++ toolchain")


@pytest.mark.skipif(not os.path.exists(REF_FLAC), reason="fixture unavailable")
def test_native_matches_python_on_libflac_file():
    xn, rn = native.read_flac_native(REF_FLAC)
    xp, rp = audio.read_flac(REF_FLAC)
    assert rn == rp == 16000
    np.testing.assert_array_equal(xn, xp)


def test_native_roundtrip_own_encoder(tmp_path):
    rng = np.random.default_rng(0)
    sig = (rng.standard_normal(12000) * 0.3).clip(-1, 1).astype(np.float32)
    p = str(tmp_path / "x.flac")
    audio.write_flac(p, sig, 16000, block_size=2048)
    xn, rate = native.read_flac_native(p)
    expected = np.clip(np.round(sig * 32768), -32768, 32767) / 32768.0
    np.testing.assert_array_equal(xn, expected.astype(np.float32))


def test_read_audio_prefers_native(tmp_path, monkeypatch):
    sig = (0.5 * np.sin(2 * np.pi * 440 * np.arange(8000) / 16000)).astype(np.float32)
    p = str(tmp_path / "y.flac")
    audio.write_flac(p, sig, 16000)
    x = audio.read_audio(p)
    assert x.shape == (8000,)
    assert np.isfinite(x).all()


def test_stereo_flac_both_decoders(tmp_path):
    rng = np.random.default_rng(0)
    sig = np.stack(
        [0.4 * np.sin(2 * np.pi * 440 * np.arange(8000) / 16000), (rng.standard_normal(8000) * 0.2).clip(-1, 1)], axis=1
    ).astype(np.float32)
    p = str(tmp_path / "st.flac")
    audio.write_flac(p, sig, 16000)
    expected = (np.clip(np.round(sig * 32768), -32768, 32767) / 32768.0).astype(np.float32)
    xp, _ = audio.read_flac(p)
    np.testing.assert_array_equal(xp, expected)
    xn, _ = native.read_flac_native(p)
    np.testing.assert_array_equal(xn, expected)
