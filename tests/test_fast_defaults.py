"""Defaults-are-fast regression: at the flagship bench shapes the ``auto``
dispatch MUST select every fused Pallas path.

The round-3 perf work (fused rel-attention kernel B, fused FF, fused conv,
flash-RNN-T fused joint+loss) is wired behind shape gates and env toggles; a
silent fallback (e.g. a padding change landing a lane dim in the refused
384-lane axon-hang bucket) would erase the wins with no red test. These are
pure shape-math predicates, checkable on CPU with no compilation.

Flagship shapes = bench.py Conformer-S train bench: 16 s audio → T=1600
frames → T=400 post-subsampling; S=T (no memory); non-causal rel R=2T-1;
D=144, FF hidden 4D=576, conv kernel 31 causal; U+1=129, V=256; bs 4..64.
"""

import importlib

import pytest

# bench flagship dims
T = 400  # 16 s, 10 ms hop, /4 subsampling
D = 144
F = 4 * D
KERNEL = 31
VOCAB = 256


def _clean_env(monkeypatch):
    for var in ("TFASR_ATTN_IMPL", "TFASR_FF_IMPL", "TFASR_CONV_IMPL", "TFASR_LOSS_IMPL"):
        monkeypatch.delenv(var, raising=False)


def test_auto_selects_fused_rel_attention(monkeypatch):
    _clean_env(monkeypatch)
    from tensorflowasr_tpu.models.layers import attention

    # kernel B (fully-fused rel attention) at bench shapes, causal (R=T)
    # and non-causal (R=2T-1) variants
    assert attention._use_rel_fused_attention(T, T, 2 * T - 1)
    assert attention._use_rel_fused_attention(T, T, T)
    # vanilla MHA kernel A
    assert attention._use_fused_attention(T, T)
    # decode-time single-frame shapes may fall back — not asserted here


def test_auto_selects_fused_ff_and_conv(monkeypatch):
    _clean_env(monkeypatch)
    from tensorflowasr_tpu.models.encoders import conformer

    for bs in (4, 8, 16, 32, 64):
        assert conformer._use_fused_ff(bs * T, D, F), f"FF fell back at bs={bs}"
    assert conformer._use_fused_conv(T, D, KERNEL, "causal")
    assert conformer._use_fused_conv(T, D, KERNEL, "same")


def test_auto_selects_fused_joint_loss(monkeypatch):
    _clean_env(monkeypatch)
    from tensorflowasr_tpu.training import trainer as trainer_mod
    from __graft_entry__ import _conformer_small

    model = _conformer_small(vocab_size=VOCAB, num_blocks=16, dmodel=D)
    assert trainer_mod._fused_joint_supported(model)


def test_384_lane_bucket_still_refused(monkeypatch):
    """The axon 384-lane hang bucket must keep falling back to XLA: these
    predicates returning True again would reintroduce the bisected TPU
    worker hang (scripts_dev/rnnt_bisect.py, CLAUDE.md kernel rules)."""
    _clean_env(monkeypatch)
    from tensorflowasr_tpu.ops.pallas.conv_kernel import conv_shapes_supported
    from tensorflowasr_tpu.ops.pallas.ff_kernel import ff_shapes_supported

    assert not ff_shapes_supported(6400, 384, F)
    assert not ff_shapes_supported(6400, D, 384)
    assert not conv_shapes_supported(T, 384, KERNEL, "causal")


def test_explicit_xla_override_respected(monkeypatch):
    monkeypatch.setenv("TFASR_ATTN_IMPL", "xla")
    monkeypatch.setenv("TFASR_FF_IMPL", "xla")
    monkeypatch.setenv("TFASR_CONV_IMPL", "xla")
    from tensorflowasr_tpu.models.encoders import conformer
    from tensorflowasr_tpu.models.layers import attention

    assert not attention._use_rel_fused_attention(T, T, 2 * T - 1)
    assert not attention._use_fused_attention(T, T)
    assert not conformer._use_fused_ff(16 * T, D, F)
    assert not conformer._use_fused_conv(T, D, KERNEL, "causal")
