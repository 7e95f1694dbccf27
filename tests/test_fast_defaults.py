"""Defaults-are-fast regression: at the flagship bench shapes every fused
Pallas path must be SELECTED under the default (``auto``) dispatch.

Round 3's perf work (fused rel-attention kernel B, fused FF, fused conv,
flash-RNN-T fused joint+loss) is wired through shape gates and env toggles
(``TFASR_{ATTN,FF,CONV,LOSS}_IMPL``). A silent fallback — e.g. a padding
change landing a lane dim in the bisected 384-lane axon hang bucket, which
the FF/conv gates refuse — would erase the measured wins (bs16 step
121→~63 ms) without any test going red. These assertions are pure shape
math, CPU-checkable.

Flagship shape = the bench.py / __graft_entry__ Conformer-S transducer:
B=16, 16 s audio → T=400 post-subsampling frames, D=144, H=4, FF=4D=576,
conv kernel 31 causal, U+1=129, V=256, rel positions R=2T-1=799.
"""

import pytest

B, T, D, FF, V = 16, 400, 144, 4 * 144, 256
S = T  # no streaming memory in the flagship config
R = 2 * T - 1  # non-causal relative positions
CONV_K, CONV_PAD = 31, "causal"


@pytest.fixture(autouse=True)
def _default_env(monkeypatch):
    """The defaults under test are what a user gets with NO env overrides."""
    for var in ("TFASR_ATTN_IMPL", "TFASR_FF_IMPL", "TFASR_CONV_IMPL", "TFASR_LOSS_IMPL", "TFASR_RNN_IMPL", "TFASR_FRONTEND_IMPL"):
        monkeypatch.delenv(var, raising=False)


def test_rel_attention_fused_selected_at_flagship_shape():
    from tensorflowasr_tpu.models.layers.attention import _use_rel_fused_attention

    assert _use_rel_fused_attention(T, S, R), "kernel B (fused rel attention) must be default at bench shape"


def test_vanilla_attention_fused_selected_at_flagship_shape():
    from tensorflowasr_tpu.models.layers.attention import _use_fused_attention

    assert _use_fused_attention(T, S)


def test_ff_fused_selected_at_flagship_shape():
    from tensorflowasr_tpu.models.encoders.conformer import _use_fused_ff

    assert _use_fused_ff(B * T, D, FF), "fused FF module must be default at bench shape"


def test_conv_fused_selected_at_flagship_shape():
    from tensorflowasr_tpu.models.encoders.conformer import _use_fused_conv

    assert _use_fused_conv(T, D, CONV_K, CONV_PAD), "fused conv module must be default at bench shape"


def test_flagship_dims_avoid_384_lane_bucket():
    """D=144 pads to 256 lanes and FF=576 to 640 — neither may drift into
    the 384-lane (3-tile) bucket the gates refuse (rnnt_kernel bisect)."""
    from tensorflowasr_tpu.utils.math_util import round_up

    assert round_up(D, 128) != 384
    assert round_up(FF, 128) != 384
    # and the gates DO refuse the bucket (the fallback the bisect mandates)
    from tensorflowasr_tpu.models.encoders.conformer import _use_fused_conv, _use_fused_ff

    assert not _use_fused_ff(B * T, 384, FF)
    assert not _use_fused_conv(T, 384, CONV_K, CONV_PAD)


def test_fused_joint_loss_selected_for_flagship_model():
    """TFASR_LOSS_IMPL unset (auto) + the flagship joint config → the
    flash-RNN-T fused joint+loss kernel (the 2.0× round-3 win) is chosen."""
    import os

    from __graft_entry__ import _conformer_small
    from tensorflowasr_tpu.training.trainer import _fused_joint_supported

    model = _conformer_small()
    assert _fused_joint_supported(model)
    assert os.environ.get("TFASR_LOSS_IMPL", "auto").lower() in ("auto", "fused-joint")


def test_lstm_default_is_scan_and_fused_is_optin():
    """The fused whole-sequence LSTM kernel measured PARITY with XLA's scan
    (both are MXU-pass-latency-bound at B=16; docs/design/fused_lstm.md),
    so ``auto`` must keep the scan and ``pallas`` must opt in — with H=320
    padding rounded past the bisected 384-lane hang bucket."""
    import os

    from tensorflowasr_tpu.models.layers.rnn import _use_fused_lstm
    from tensorflowasr_tpu.ops.pallas.lstm_kernel import _padded_h

    assert not _use_fused_lstm(B, 129, 320), "auto must keep XLA scan (measured parity)"
    os.environ["TFASR_RNN_IMPL"] = "pallas"
    try:
        assert _use_fused_lstm(B, 129, 320), "pallas opt-in must support the prednet shape"
    finally:
        del os.environ["TFASR_RNN_IMPL"]
    assert _padded_h(320) == 512


def test_pallas_frontend_selected_on_accelerator():
    """``auto`` must route the flagship frontend config (log-mel, pad-end,
    natural log) to the Pallas kernel on non-CPU backends (6.9 vs 8.0 ms),
    and keep XLA on CPU and for unsupported configs."""
    import dataclasses

    from tensorflowasr_tpu.models.layers.feature_extraction import _use_pallas_frontend
    from tensorflowasr_tpu.ops.frontend import FrontendConfig

    cfg = FrontendConfig()
    assert _use_pallas_frontend(cfg, backend="tpu")
    assert not _use_pallas_frontend(cfg, backend="cpu")
    assert not _use_pallas_frontend(dataclasses.replace(cfg, pad_end=False), backend="tpu")
    assert not _use_pallas_frontend(dataclasses.replace(cfg, log_base="10"), backend="tpu")


def test_streaming_chunk_shape_also_fused():
    """The streaming bench shape (chunk 16, history 64 → S=T+memory) must
    not silently fall back either."""
    from tensorflowasr_tpu.models.layers.attention import _use_rel_fused_attention

    t, s = 16, 16 + 64
    assert _use_rel_fused_attention(t, s, s + t - 1) or _use_rel_fused_attention(t, s, 2 * t - 1 + 64)
