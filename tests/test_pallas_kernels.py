"""Pallas CTC/RNN-T kernels (interpret mode on CPU) vs the XLA references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflowasr_tpu.ops.ctc_loss import ctc_loss
from tensorflowasr_tpu.ops.pallas.ctc_kernel import ctc_loss_pallas
from tensorflowasr_tpu.ops.pallas.rnnt_kernel import rnnt_loss_pallas
from tensorflowasr_tpu.ops.rnnt_loss import rnnt_loss


def _rnnt_case(rng, B=3, T=12, U=4, V=8):
    logits = rng.standard_normal((B, T, U + 1, V)).astype(np.float32)
    labels = rng.integers(1, V, (B, U)).astype(np.int32)
    tl = np.asarray([T, T - 2, T - 5], np.int32)[:B]
    ul = np.asarray([U, U - 1, U - 2], np.int32)[:B]
    labels = labels * (np.arange(U)[None, :] < ul[:, None])
    return jnp.asarray(logits), tl, jnp.asarray(labels), ul


def _ctc_case(rng, B=3, T=20, U=5, V=10):
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    labels = rng.integers(1, V, (B, U)).astype(np.int32)
    tl = np.asarray([T, T - 3, T - 7], np.int32)[:B]
    ul = np.asarray([U, U - 1, U - 2], np.int32)[:B]
    labels = labels * (np.arange(U)[None, :] < ul[:, None])
    return jnp.asarray(logits), tl, jnp.asarray(labels), ul


def test_rnnt_pallas_matches_reference(rng):
    logits, tl, labels, ul = _rnnt_case(rng)
    ref = rnnt_loss(logits, tl, labels, ul)
    pal = rnnt_loss_pallas(logits, tl, labels, ul, interpret=True)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_rnnt_pallas_grad_matches(rng):
    logits, tl, labels, ul = _rnnt_case(rng)
    g_ref = jax.grad(lambda lg: jnp.mean(rnnt_loss(lg, tl, labels, ul)))(logits)
    g_pal = jax.grad(lambda lg: jnp.mean(rnnt_loss_pallas(lg, tl, labels, ul, interpret=True)))(logits)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref), rtol=1e-4, atol=1e-5)


def test_rnnt_pallas_repeated_labels(rng):
    # repeated labels exercise the emit path without the dedup CTC needs
    logits, tl, _, ul = _rnnt_case(rng, B=2, T=10, U=4)
    labels = jnp.asarray([[3, 3, 3, 3], [2, 2, 1, 0]], jnp.int32)
    ul = np.asarray([4, 3], np.int32)
    ref = rnnt_loss(logits[:2], tl[:2], labels, ul)
    pal = rnnt_loss_pallas(logits[:2], tl[:2], labels, ul, interpret=True)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_rnnt_pallas_bf16_input(rng):
    logits, tl, labels, ul = _rnnt_case(rng)
    out32 = rnnt_loss_pallas(logits, tl, labels, ul, interpret=True)
    out16 = rnnt_loss_pallas(logits.astype(jnp.bfloat16), tl, labels, ul, interpret=True)
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32), rtol=0.05, atol=0.5)
    g = jax.grad(lambda lg: jnp.mean(rnnt_loss_pallas(lg, tl, labels, ul, interpret=True)))(logits.astype(jnp.bfloat16))
    assert g.dtype == jnp.bfloat16


def test_ctc_pallas_matches_reference(rng):
    logits, tl, labels, ul = _ctc_case(rng)
    ref = ctc_loss(logits, tl, labels, ul)
    pal = ctc_loss_pallas(logits, tl, labels, ul, interpret=True)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_ctc_pallas_grad_matches(rng):
    logits, tl, labels, ul = _ctc_case(rng)
    g_ref = jax.grad(lambda lg: jnp.mean(ctc_loss(lg, tl, labels, ul)))(logits)
    g_pal = jax.grad(lambda lg: jnp.mean(ctc_loss_pallas(lg, tl, labels, ul, interpret=True)))(logits)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref), rtol=1e-4, atol=1e-5)


def test_ctc_pallas_repeated_labels(rng):
    # adjacent repeats disable the skip transition — the classic CTC subtlety
    logits, tl, _, ul = _ctc_case(rng, B=2, T=20, U=5)
    labels = jnp.asarray([[3, 3, 4, 4, 3], [2, 2, 2, 0, 0]], jnp.int32)
    ul = np.asarray([5, 3], np.int32)
    ref = ctc_loss(logits[:2], tl[:2], labels, ul)
    pal = ctc_loss_pallas(logits[:2], tl[:2], labels, ul, interpret=True)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), rtol=1e-5, atol=1e-5)
    g_ref = jax.grad(lambda lg: jnp.mean(ctc_loss(lg, tl[:2], labels, ul)))(logits[:2])
    g_pal = jax.grad(lambda lg: jnp.mean(ctc_loss_pallas(lg, tl[:2], labels, ul, interpret=True)))(logits[:2])
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref), rtol=1e-4, atol=1e-5)


def test_loss_dispatch_env(monkeypatch):
    from tensorflowasr_tpu.ops import losses

    monkeypatch.setenv("TFASR_LOSS_IMPL", "xla")
    assert losses.get_ctc_loss_fn().__name__ == "ctc_loss_masked_mean"
    assert losses.get_rnnt_loss_fn().__name__ == "rnnt_loss_masked_mean"
    monkeypatch.setenv("TFASR_LOSS_IMPL", "pallas")
    assert losses.get_ctc_loss_fn().__name__ == "ctc_loss_pallas_masked_mean"
    assert losses.get_rnnt_loss_fn().__name__ == "rnnt_loss_pallas_masked_mean"
    monkeypatch.setenv("TFASR_LOSS_IMPL", "auto")
    assert losses.get_rnnt_loss_fn().__name__ == "rnnt_loss_pallas_masked_mean"
    # the former shape guard is gone: the 384-lane hang region is padded
    # away inside the kernel, so every shape routes to pallas
    assert losses._rnnt_pallas_safe(jnp.zeros((4, 400, 201, 8)))


def test_padded_lanes_skips_384_bucket():
    from tensorflowasr_tpu.ops.pallas.rnnt_kernel import _padded_lanes

    assert _padded_lanes(1) == 128
    assert _padded_lanes(129) == 256
    assert _padded_lanes(257) == 512  # 384 bucket rounds up (axon hang region)
    assert _padded_lanes(384) == 512
    assert _padded_lanes(385) == 512
    assert _padded_lanes(513) == 640


def test_frontend_pallas_matches_xla(rng):
    from tensorflowasr_tpu.ops import frontend
    from tensorflowasr_tpu.ops.pallas.frontend_kernel import log_mel_spectrogram_pallas

    cfg = frontend.FrontendConfig()
    sig = jnp.asarray(rng.standard_normal((2, 16000)) * 0.3, jnp.float32)
    ref = frontend.log_mel_spectrogram(sig, cfg)
    pal = log_mel_spectrogram_pallas(sig, cfg, interpret=True)
    assert pal.shape == ref.shape
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=1e-3)


def test_frontend_pallas_partial_frame_padding(rng):
    from tensorflowasr_tpu.ops import frontend
    from tensorflowasr_tpu.ops.pallas.frontend_kernel import log_mel_spectrogram_pallas

    cfg = frontend.FrontendConfig()
    sig = jnp.asarray(rng.standard_normal((1, 16123)) * 0.3, jnp.float32)  # non-multiple of step
    ref = frontend.log_mel_spectrogram(sig, cfg)
    pal = log_mel_spectrogram_pallas(sig, cfg, interpret=True)
    assert pal.shape == ref.shape
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=1e-3)


@pytest.mark.parametrize("shape", [(2, 16000), (1, 16123), (3, 4000), (1, 2560)])
def test_frontend_pallas_v2_matches_xla(rng, shape):
    """v2 (in-kernel framing) parity with the XLA reference across even,
    partial-frame, short, and single-tile signal lengths."""
    from tensorflowasr_tpu.ops import frontend
    from tensorflowasr_tpu.ops.pallas.frontend_kernel import log_mel_spectrogram_pallas_v2

    cfg = frontend.FrontendConfig()
    sig = jnp.asarray(rng.standard_normal(shape) * 0.3, jnp.float32)
    ref = frontend.log_mel_spectrogram(sig, cfg)
    pal = log_mel_spectrogram_pallas_v2(sig, cfg, interpret=True)
    assert pal.shape == ref.shape
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=1e-3)


def test_frontend_v2_shape_gate():
    """Unsupported configs fall back to v1 (still correct, never crash)."""
    from tensorflowasr_tpu.ops.pallas.frontend_kernel import v2_shapes_supported

    assert v2_shapes_supported(256000, 400, 160)
    assert not v2_shapes_supported(256000, 400, 100)  # fs not sublane-aligned
    assert not v2_shapes_supported(2 ** 31, 400, 160)  # rows exceed VMEM
