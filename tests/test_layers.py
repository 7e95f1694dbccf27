"""Layer library tests: masks (golden matrices), rel-shift, PE, convs, RNN."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflowasr_tpu.models.layers import attention as attn
from tensorflowasr_tpu.models.layers.convolution import Conv1D, Conv2D, DepthwiseConv1D
from tensorflowasr_tpu.models.layers.embedding import Embedding, OneHotBlank
from tensorflowasr_tpu.models.layers.feature_extraction import FeatureExtraction
from tensorflowasr_tpu.models.layers.glu import GLU
from tensorflowasr_tpu.models.layers.positional import (
    RelativeSinusoidalPositionalEncoding,
    SinusoidalPositionalEncoding,
    compute_sinusoid_position_encoding,
)
from tensorflowasr_tpu.models.layers.residual import Residual
from tensorflowasr_tpu.models.layers.rnn import RNN
from tensorflowasr_tpu.models.layers.subsampling import Conv1dSubsampling, Conv2dSubsampling, TimeReduction


# --------------------------- streaming mask goldens --------------------------- #
# Exact matrices from the reference behavior spec (tests/test_mask.py + the
# docstring example in multihead_attention.py:104-143), re-derived by hand.


def test_streaming_mask_chunk2_hist2():
    got = np.asarray(attn.compute_streaming_mask(2, 2, 8, 8)).astype(int)
    expect = np.asarray(
        [
            [1, 1, 0, 0, 0, 0, 0, 0],
            [1, 1, 0, 0, 0, 0, 0, 0],
            [1, 1, 1, 1, 0, 0, 0, 0],
            [1, 1, 1, 1, 0, 0, 0, 0],
            [0, 0, 1, 1, 1, 1, 0, 0],
            [0, 0, 1, 1, 1, 1, 0, 0],
            [0, 0, 0, 0, 1, 1, 1, 1],
            [0, 0, 0, 0, 1, 1, 1, 1],
        ]
    )
    np.testing.assert_array_equal(got, expect)


def test_streaming_mask_chunk3_hist3():
    got = np.asarray(attn.compute_streaming_mask(3, 3, 9, 9)).astype(int)
    expect = np.asarray(
        [
            [1, 1, 1, 0, 0, 0, 0, 0, 0],
            [1, 1, 1, 0, 0, 0, 0, 0, 0],
            [1, 1, 1, 0, 0, 0, 0, 0, 0],
            [1, 1, 1, 1, 1, 1, 0, 0, 0],
            [1, 1, 1, 1, 1, 1, 0, 0, 0],
            [1, 1, 1, 1, 1, 1, 0, 0, 0],
            [0, 0, 0, 1, 1, 1, 1, 1, 1],
            [0, 0, 0, 1, 1, 1, 1, 1, 1],
            [0, 0, 0, 1, 1, 1, 1, 1, 1],
        ]
    )
    np.testing.assert_array_equal(got, expect)


def test_streaming_mask_unlimited_history():
    got = np.asarray(attn.compute_streaming_mask(2, -1, 4, 4)).astype(int)
    expect = np.asarray([[1, 1, 0, 0], [1, 1, 0, 0], [1, 1, 1, 1], [1, 1, 1, 1]])
    np.testing.assert_array_equal(got, expect)


def test_causal_mask():
    got = np.asarray(attn.compute_causal_mask(3, 3)).astype(int)
    np.testing.assert_array_equal(got, [[1, 0, 0], [1, 1, 0], [1, 1, 1]])


# ------------------------------- rel_left_shift ------------------------------- #


def test_rel_left_shift_noncausal_matches_reference_behavior():
    # observed behavior of the reference implementation (its docstring is
    # stale): for T=3, R=2T-1=5, input rows [1..5],[6..10],[11..15] →
    # [[3,4,5],[7,8,9],[11,12,13]]: row t keeps columns (T-1-t)..(R-1-t)
    x = jnp.arange(1, 16, dtype=jnp.float32).reshape(1, 1, 3, 5)
    got = np.asarray(attn.rel_left_shift(x))[0, 0]
    np.testing.assert_array_equal(got, [[3, 4, 5], [7, 8, 9], [11, 12, 13]])


def test_rel_left_shift_full_equivalence():
    # brute-force check: score[t, s] must equal q_t · p_{rel}, rel = (t - s)
    # with positions ordered [T-1 ... -(T-1)] (non-causal, no memory)
    T, H = 4, 8
    rng = np.random.default_rng(0)
    q = rng.standard_normal((1, 1, T, H)).astype(np.float32)
    p = rng.standard_normal((1, 1, 2 * T - 1, H)).astype(np.float32)  # index r ↔ position T-1-r
    scores = jnp.einsum("bnth,bnrh->bntr", q, p)
    shifted = np.asarray(attn.rel_left_shift(scores))[0, 0]  # [T, T]
    for t in range(T):
        for s in range(T):
            rel = t - s  # query t attending key s
            r = (T - 1) - rel
            expect = q[0, 0, t] @ p[0, 0, r]
            np.testing.assert_allclose(shifted[t, s], expect, rtol=1e-5)


def test_rel_left_shift_causal():
    # causal: R = T positions [T-1 ... 0]; score[t, s] valid for s <= t
    T, H = 4, 8
    rng = np.random.default_rng(1)
    q = rng.standard_normal((1, 1, T, H)).astype(np.float32)
    p = rng.standard_normal((1, 1, T, H)).astype(np.float32)
    scores = jnp.einsum("bnth,bnrh->bntr", q, p)
    shifted = np.asarray(attn.rel_left_shift(scores, causal=True))[0, 0]
    for t in range(T):
        for s in range(t + 1):
            rel = t - s
            r = (T - 1) - rel
            expect = q[0, 0, t] @ p[0, 0, r]
            np.testing.assert_allclose(shifted[t, s], expect, rtol=1e-5)


# ------------------------------------ MHA ------------------------------------ #


def test_mha_masks_padded_kv():
    m = attn.MultiHeadAttention(num_heads=2, key_dim=8, output_dim=16)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 6, 16)), jnp.float32)
    mask = jnp.asarray([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]], bool)
    vars_ = m.init(jax.random.PRNGKey(0), x, x, query_mask=mask, kv_mask=mask)
    out1, _ = m.apply(vars_, x, x, query_mask=mask, kv_mask=mask)
    # perturb padded positions → valid outputs unchanged
    x2 = x.at[0, 4:].set(999.0)
    out2, _ = m.apply(vars_, x2, x2, query_mask=mask, kv_mask=mask)
    np.testing.assert_allclose(np.asarray(out1[0, :4]), np.asarray(out2[0, :4]), atol=1e-5)


def test_mha_memory_carries_kv():
    m = attn.MultiHeadAttention(num_heads=2, key_dim=8, output_dim=16, memory_length=4)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 6, 16)), jnp.float32)
    mem = m.init_memory(2, 16)
    assert mem["k"].shape == (2, 4, 16)
    vars_ = m.init(jax.random.PRNGKey(0), x, x, memory_state=mem)
    out, new_mem = m.apply(vars_, x, x, memory_state=mem)
    assert out.shape == (2, 6, 16)
    # new memory = last 4 input positions
    np.testing.assert_allclose(np.asarray(new_mem["k"]), np.asarray(x[:, -4:]), atol=1e-6)
    assert bool(new_mem["mask"].all())


def test_relative_mha_runs_with_relpe():
    T, D = 6, 16
    m = attn.MultiHeadRelativeAttention(num_heads=2, key_dim=8, output_dim=D, use_attention_bias=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, T, D)), jnp.float32)
    relpe = jnp.asarray(np.random.default_rng(1).standard_normal((2, 2 * T - 1, D)), jnp.float32)
    mask = jnp.asarray([[True] * 6, [True] * 4 + [False] * 2])
    vars_ = m.init(jax.random.PRNGKey(0), x, x, relpe=relpe, query_mask=mask, kv_mask=mask)
    out, _ = m.apply(vars_, x, x, relpe=relpe, query_mask=mask, kv_mask=mask)
    assert out.shape == (2, T, D)
    assert np.isfinite(np.asarray(out)).all()


# ------------------------------ positional encodings --------------------------- #


def test_sinusoid_pe_interleave_and_concat():
    pe_c = np.asarray(compute_sinusoid_position_encoding(jnp.arange(10), 8, interleave=False))
    pe_i = np.asarray(compute_sinusoid_position_encoding(jnp.arange(10), 8, interleave=True))
    assert pe_c.shape == pe_i.shape == (10, 8)
    # position 0: sin parts 0, cos parts 1
    np.testing.assert_allclose(pe_c[0, :4], 0.0, atol=1e-7)
    np.testing.assert_allclose(pe_c[0, 4:], 1.0, atol=1e-7)
    np.testing.assert_allclose(pe_i[0], [0, 1, 0, 1, 0, 1, 0, 1], atol=1e-7)


def test_relative_pe_shapes_and_roll():
    m = RelativeSinusoidalPositionalEncoding()
    x = jnp.zeros((2, 5, 8))
    lens = jnp.asarray([5, 3])
    (out, relpe), _ = m.init_with_output(jax.random.PRNGKey(0), x, lens)
    assert relpe.shape == (2, 9, 8)  # 2T-1
    # full-length example: positions [T-1..-(T-1)] with no roll; rel 0 at index T-1 → all-zero sin part?
    pe_full = np.asarray(compute_sinusoid_position_encoding(jnp.arange(4, -5, -1), 8))
    np.testing.assert_allclose(np.asarray(relpe[0]), pe_full, atol=1e-5)
    # short example: rolled by -(5-3)=-2 and masked to 2*3-1=5 valid rows
    np.testing.assert_allclose(np.asarray(relpe[1, 5:]), 0.0, atol=1e-7)
    pe_short = pe_full[2:7]
    np.testing.assert_allclose(np.asarray(relpe[1, :5]), pe_short, atol=1e-5)


def test_relative_pe_causal_shape():
    m = RelativeSinusoidalPositionalEncoding(causal=True, memory_length=3)
    x = jnp.zeros((1, 5, 8))
    (out, relpe), _ = m.init_with_output(jax.random.PRNGKey(0), x, jnp.asarray([5]))
    assert relpe.shape == (1, 8, 8)  # T + M


# ------------------------------- convs / subsampling --------------------------- #


def test_causal_conv1d_no_future_leak():
    m = Conv1D(filters=4, kernel_size=3, padding="causal")
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 10, 4)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    y1 = m.apply(v, x)
    x2 = x.at[0, 5:].set(123.0)
    y2 = m.apply(v, x2)
    np.testing.assert_allclose(np.asarray(y1[0, :5]), np.asarray(y2[0, :5]), atol=1e-5)


def test_depthwise_conv_shapes():
    m = DepthwiseConv1D(kernel_size=5, padding="causal")
    x = jnp.ones((2, 10, 8))
    y, _ = m.init_with_output(jax.random.PRNGKey(0), x)
    assert y.shape == (2, 10, 8)


@pytest.mark.parametrize("impl", ["im2col", "gemm", "rg"])
@pytest.mark.parametrize(
    "cin,cout,kernel,strides,padding",
    [
        (1, 8, (3, 3), (2, 2), "causal"),  # subsampling conv_0 shape class
        (8, 6, (3, 3), (2, 2), "causal"),  # conv_1 shape class
        (3, 5, (3, 2), (2, 1), "causal"),  # asymmetric kernel/strides
        (2, 4, (3, 3), (1, 1), [(1, 1), (1, 1)]),  # explicit pads, stride 1
        (1, 8, (2, 3), (2, 2), "causal"),  # even time kernel (rg n_rows=2)
        (1, 8, (3, 3), (2, 3), [(2, 1), (1, 1)]),  # explicit pads incl. right
    ],
)
def test_conv2d_fast_paths_match_flax_conv(cin, cout, kernel, strides, padding, impl, monkeypatch):
    """The im2col and gemm fast paths (strided slices + GEMMs) must value-
    and grad-match flax's conv on one shared param tree."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 13, 9, cin)), jnp.float32)
    m = Conv2D(filters=cout, kernel_size=kernel, strides=strides, padding=padding)
    monkeypatch.setenv("TFASR_CONV2D_IMPL", "xla")
    v = m.init(jax.random.PRNGKey(0), x)
    g = jax.grad(lambda v_, x_: jnp.sum(jnp.square(m.apply(v_, x_))), argnums=(0, 1))
    y_x = m.apply(v, x)
    gv_x, gx_x = g(v, x)
    monkeypatch.setenv("TFASR_CONV2D_IMPL", impl)
    y_p = m.apply(v, x)
    gv_p, gx_p = g(v, x)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x), rtol=1e-4, atol=1e-4)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4), gv_p, gv_x)


def test_conv2d_fast_paths_are_optin_not_default(monkeypatch):
    """im2col measured 6.9× slower than XLA's native conv on v5e (module
    docstring) — ``auto`` must keep the conv; im2col/gemm opt in for
    causal/explicit paddings only."""
    from tensorflowasr_tpu.models.layers.convolution import _conv2d_impl

    monkeypatch.delenv("TFASR_CONV2D_IMPL", raising=False)
    assert _conv2d_impl("causal") == "xla"
    for impl in ("im2col", "gemm"):
        monkeypatch.setenv("TFASR_CONV2D_IMPL", impl)
        assert _conv2d_impl("causal") == impl
        assert _conv2d_impl([(1, 0), (2, 0)]) == impl
        assert _conv2d_impl("same") == "xla"
        assert _conv2d_impl("valid") == "xla"


def test_time_reduction():
    m = TimeReduction(factor=2)
    x = jnp.arange(2 * 5 * 3, dtype=jnp.float32).reshape(2, 5, 3)
    (y, lens), _ = m.init_with_output(jax.random.PRNGKey(0), x, jnp.asarray([5, 4]))
    assert y.shape == (2, 3, 6)
    np.testing.assert_array_equal(np.asarray(lens), [3, 2])


def test_conv2d_subsampling_lengths():
    m = Conv2dSubsampling(filters=(8, 8), strides=((2, 1), (2, 1)), norms=("batch", "batch"))
    assert m.time_reduction_factor == 4
    x = jnp.ones((2, 20, 10, 1))
    vars_ = m.init(jax.random.PRNGKey(0), x, jnp.asarray([20, 11]))
    (y, lens) = m.apply(vars_, x, jnp.asarray([20, 11]))
    assert y.shape == (2, 5, 10 * 8)
    np.testing.assert_array_equal(np.asarray(lens), [5, 3])


def test_conv1d_subsampling():
    m = Conv1dSubsampling(filters=(16, 16))
    x = jnp.ones((2, 20, 10, 1))
    (y, lens), _ = m.init_with_output(jax.random.PRNGKey(0), x, jnp.asarray([20, 8]))
    assert y.shape == (2, 5, 16)
    np.testing.assert_array_equal(np.asarray(lens), [5, 2])


# ----------------------------------- misc ------------------------------------- #


def test_glu():
    m = GLU()
    x = jnp.concatenate([jnp.ones((1, 2, 4)), jnp.zeros((1, 2, 4))], axis=-1)
    y, _ = m.init_with_output(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(y), 0.5, atol=1e-6)


def test_residual_trainable():
    m = Residual(factor="trainable")
    y, v = m.init_with_output(jax.random.PRNGKey(0), jnp.ones((2, 3)), jnp.ones((2, 3)) * 2)
    np.testing.assert_allclose(np.asarray(y), 3.0)
    assert "factor" in v["params"]


def test_embedding_and_onehot_blank():
    e = Embedding(vocab_size=10, embed_dim=4)
    tokens = jnp.asarray([[1, 2, 0]], jnp.int32)
    y, _ = e.init_with_output(jax.random.PRNGKey(0), tokens, jnp.asarray([2]))
    np.testing.assert_allclose(np.asarray(y[0, 2]), 0.0)  # masked position
    o = OneHotBlank(vocab_size=5)
    y2, _ = o.init_with_output(jax.random.PRNGKey(0), jnp.asarray([[0, 3]], jnp.int32))
    np.testing.assert_allclose(np.asarray(y2[0, 0]), 0.0)
    np.testing.assert_allclose(np.asarray(y2[0, 1]), [0, 0, 0, 1, 0])


def test_rnn_lengths_and_state_passing():
    m = RNN(units=6, rnn_type="lstm")
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 4)), jnp.float32)
    lens = jnp.asarray([8, 3])
    v = m.init(jax.random.PRNGKey(0), x, lens)
    y, state = m.apply(v, x, lens)
    assert y.shape == (2, 8, 6)
    # final state of short example == state at t=3 of running prefix only
    y2, state2 = m.apply(v, x[:, :3], jnp.asarray([3, 3]))
    np.testing.assert_allclose(np.asarray(state[0][1]), np.asarray(state2[0][1]), atol=1e-5)
    # chunked processing with state pass-through == full pass
    y_a, st = m.apply(v, x[:, :4], jnp.asarray([4, 4]))
    y_b, _ = m.apply(v, x[:, 4:], jnp.asarray([4, 4]), initial_state=st)
    np.testing.assert_allclose(np.asarray(y[0]), np.asarray(jnp.concatenate([y_a, y_b], 1)[0]), atol=1e-4)


def test_rnn_bidirectional():
    m = RNN(units=5, rnn_type="gru", bidirectional=True)
    x = jnp.ones((2, 6, 3))
    (y, state), _ = m.init_with_output(jax.random.PRNGKey(0), x, jnp.asarray([6, 6]))
    assert y.shape == (2, 6, 10)


def test_rnn_step_matches_scan():
    m = RNN(units=4, rnn_type="lstm")
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 5, 3)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, jnp.asarray([5]))
    y_scan, _ = m.apply(v, x, jnp.asarray([5]))
    state = m.apply(v, 1, method=m.init_state)
    ys = []
    for t in range(5):
        y_t, state = m.apply(v, x[:, t], state, method=m.step)
        ys.append(y_t)
    y_step = jnp.stack(ys, axis=1)
    np.testing.assert_allclose(np.asarray(y_scan), np.asarray(y_step), atol=1e-5)


def test_feature_extraction_module_with_augment():
    m = FeatureExtraction(augmentation_config={"feature_augment": {"freq_masking": {"num_masks": 1}}})
    sig = jnp.asarray(np.random.default_rng(0).standard_normal((2, 3200)), jnp.float32)
    lens = jnp.asarray([3200, 1600])
    v = m.init({"params": jax.random.PRNGKey(0), "augment": jax.random.PRNGKey(1)}, sig, lens, train=True)
    feats, flens = m.apply(v, sig, lens, train=True, rngs={"augment": jax.random.PRNGKey(2)})
    assert feats.shape == (2, 20, 80)
    np.testing.assert_array_equal(np.asarray(flens), [20, 10])
    # eval path needs no rng
    feats_eval, _ = m.apply(v, sig, lens, train=False)
    assert np.isfinite(np.asarray(feats_eval)).all()


# --------------------- BlurPool / SequenceBatchNorm goldens --------------------- #

from tests import ref_oracle  # noqa: E402

_tfasr_ref = ref_oracle.import_reference()


@pytest.mark.skipif(_tfasr_ref is None, reason="reference oracle unavailable")
@pytest.mark.parametrize("kernel_size", [2, 3, 4, 5])
def test_blurpool1d_golden_vs_reference_single_channel(kernel_size):
    """For in_channels == 1 the reference's channel-summing conv coincides
    with the depthwise definition — outputs must match exactly
    (reference models/layers/blurpool.py:80-137: reflect pad + binomial)."""
    from tensorflowasr_tpu.models.layers.blurpool import BlurPool1D

    ref_cls = _tfasr_ref.models.layers.blurpool.BlurPool1D
    x = np.random.default_rng(0).standard_normal((2, 12, 1)).astype(np.float32)

    ref = ref_cls(filters=1, kernel_size=kernel_size, strides=2, padding="reflect")
    want = np.asarray(ref(x))

    m = BlurPool1D(kernel_size=kernel_size, strides=2, padding="reflect")
    got = np.asarray(m.apply({}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.skipif(_tfasr_ref is None, reason="reference oracle unavailable")
@pytest.mark.parametrize("kernel_size", [3, 4])
def test_blurpool2d_golden_vs_reference_single_channel(kernel_size):
    from tensorflowasr_tpu.models.layers.blurpool import BlurPool2D

    ref_cls = _tfasr_ref.models.layers.blurpool.BlurPool2D
    x = np.random.default_rng(1).standard_normal((2, 9, 11, 1)).astype(np.float32)

    ref = ref_cls(filters=1, kernel_size=kernel_size, strides=2, padding="reflect")
    want = np.asarray(ref(x))

    m = BlurPool2D(kernel_size=kernel_size, strides=2, padding="reflect")
    got = np.asarray(m.apply({}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_blurpool1d_multichannel_is_depthwise():
    """Channels never mix (the upstream antialiased-cnns semantics; the
    reference port sums channels — a documented deviation)."""
    from tensorflowasr_tpu.models.layers.blurpool import BlurPool1D

    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 10, 3)).astype(np.float32)
    m = BlurPool1D(kernel_size=4, strides=2)
    full = np.asarray(m.apply({}, jnp.asarray(x)))
    m1 = BlurPool1D(kernel_size=4, strides=2)
    for c in range(3):
        solo = np.asarray(m1.apply({}, jnp.asarray(x[..., c : c + 1])))
        np.testing.assert_allclose(full[..., c : c + 1], solo, atol=1e-6)


def test_sequence_batch_norm_golden_vs_reference_dense():
    """On fully-dense (no padding, no zero elements) input our masked
    moments equal the reference's count_nonzero-corrected moments
    (reference models/layers/sequence_wise_bn.py:55-73; the class itself no
    longer runs under current Keras — ``keras.backend.dtype`` was removed —
    so the golden is its formula: moments over (B,T), scaled by
    padded/nonzero counts, normalized with beta=0/gamma=1, eps=1e-7).
    On dense input the count correction is a no-op."""
    from tensorflowasr_tpu.models.layers.sequence_bn import SequenceBatchNorm

    rng = np.random.default_rng(3)
    x = (rng.standard_normal((3, 7, 5)) + 0.5).astype(np.float32)

    mean = x.mean(axis=(0, 1))
    var = x.var(axis=(0, 1))
    nonzero = np.count_nonzero(x, axis=(0, 1)).astype(np.float32)
    total = float(x.shape[0] * x.shape[1])
    mean = mean * total / nonzero
    var = var * total / nonzero
    want = (x - mean) / np.sqrt(var + 1e-7)

    m = SequenceBatchNorm(epsilon=1e-7)  # keras.backend.epsilon()
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(m.apply(v, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sequence_batch_norm_masked_ignores_padding():
    """Masked moments: normalizing a padded batch must equal normalizing
    the valid region alone."""
    from tensorflowasr_tpu.models.layers.sequence_bn import SequenceBatchNorm

    rng = np.random.default_rng(4)
    xv = rng.standard_normal((2, 5, 3)).astype(np.float32)
    xp = np.concatenate([xv, np.zeros((2, 4, 3), np.float32)], axis=1)

    m = SequenceBatchNorm()
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(xv))
    dense = np.asarray(m.apply(v, jnp.asarray(xv)))
    masked = np.asarray(m.apply(v, jnp.asarray(xp), lengths=jnp.asarray([5, 5])))
    np.testing.assert_allclose(masked[:, :5], dense, atol=1e-5)
