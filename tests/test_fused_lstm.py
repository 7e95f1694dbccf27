"""Fused whole-sequence LSTM kernel goldens (interpret mode on CPU).

Checks ops/pallas/lstm_kernel.py against the ``lax.scan`` path it replaces
(flax ``nn.RNN(OptimizedLSTMCell)``): outputs within lengths, final carry,
and gradients through a masked loss, across unaligned shapes, dtypes, and
initial-state passing. Also pins that both paths share one checkpoint tree
and that the flagship prediction-net shape stays dispatch-supported
(H=320 → 384-lane hang bucket must pad to 512).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflowasr_tpu.models.layers.rnn import RNN
from tensorflowasr_tpu.ops.pallas.lstm_kernel import _padded_h, lstm_shapes_supported


def _run(impl, monkeypatch, x, lengths, units, dtype=jnp.float32, initial_state=None):
    """Returns (params, fwd); the dispatch env var is (re)set inside ``fwd``
    because the toggle is read at apply time, not module-construction time."""
    monkeypatch.setenv("TFASR_RNN_IMPL", impl)
    m = RNN(units=units, rnn_type="lstm", dtype=dtype)
    params = m.init(jax.random.PRNGKey(0), x, lengths)

    def fwd(params, x, initial_state):
        monkeypatch.setenv("TFASR_RNN_IMPL", impl)
        return m.apply(params, x, lengths, initial_state)

    return params, fwd


@pytest.mark.parametrize(
    "b,t,e,h",
    [
        (3, 17, 12, 24),  # everything unaligned
        (8, 32, 64, 128),  # aligned
        (2, 129, 320, 320),  # prediction-net shape (384-lane bucket), small B
    ],
)
def test_fused_lstm_matches_scan(rng, monkeypatch, b, t, e, h):
    x = jnp.asarray(rng.standard_normal((b, t, e)), jnp.float32) * 0.5
    lengths = jnp.asarray(rng.integers(1, t + 1, size=(b,)), jnp.int32).at[0].set(t)

    params_x, fwd_x = _run("xla", monkeypatch, x, lengths, h)
    params_p, fwd_p = _run("pallas", monkeypatch, x, lengths, h)

    # identical checkpoint trees (same init → same params)
    jax.tree.map(lambda a, b_: np.testing.assert_array_equal(np.asarray(a), np.asarray(b_)), params_x, params_p)

    y_x, (c_x, h_x) = fwd_x(params_x, x, None)
    y_p, (c_p, h_p) = fwd_p(params_x, x, None)

    # outputs compared only within lengths: flax freezes the carry past
    # length while the fused kernel keeps running (both are masked downstream)
    mask = (jnp.arange(t)[None, :] < lengths[:, None])[..., None]
    np.testing.assert_allclose(np.asarray(y_p * mask), np.asarray(y_x * mask), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_x), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_x), rtol=2e-5, atol=2e-5)


def test_fused_lstm_grads_match(rng, monkeypatch):
    b, t, e, h = 4, 21, 16, 24
    x = jnp.asarray(rng.standard_normal((b, t, e)), jnp.float32) * 0.5
    lengths = jnp.asarray([21, 13, 1, 7], jnp.int32)
    mask = (jnp.arange(t)[None, :] < lengths[:, None])[..., None].astype(jnp.float32)
    gy = jnp.asarray(rng.standard_normal((b, t, h)), jnp.float32)
    gc = jnp.asarray(rng.standard_normal((b, h)), jnp.float32)
    c0 = jnp.asarray(rng.standard_normal((b, h)), jnp.float32) * 0.3
    h0 = jnp.asarray(rng.standard_normal((b, h)), jnp.float32) * 0.3

    def make_loss(fwd):
        def loss(params, x, c0, h0):
            y, (c, hh) = fwd(params, x, (c0, h0))
            return jnp.sum(y * mask * gy) + jnp.sum(c * gc) + jnp.sum(hh * gc)

        return loss

    params, fwd_x = _run("xla", monkeypatch, x, lengths, h)
    _, fwd_p = _run("pallas", monkeypatch, x, lengths, h)

    gx = jax.grad(make_loss(fwd_x), argnums=(0, 1, 2, 3))(params, x, c0, h0)
    gp = jax.grad(make_loss(fwd_p), argnums=(0, 1, 2, 3))(params, x, c0, h0)
    jax.tree.map(
        lambda a, b_: np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-4), gx, gp
    )


def test_fused_lstm_bf16(rng, monkeypatch):
    b, t, e, h = 4, 20, 32, 32
    x = jnp.asarray(rng.standard_normal((b, t, e)), jnp.float32) * 0.5
    params_x, fwd_x = _run("xla", monkeypatch, x, None, h, dtype=jnp.bfloat16)
    _, fwd_p = _run("pallas", monkeypatch, x, None, h, dtype=jnp.bfloat16)
    y_x, (c_x, h_x) = fwd_x(params_x, x, None)
    y_p, (c_p, h_p) = fwd_p(params_x, x, None)
    # fused emits compute-dtype outputs; flax's scan promotes to f32 because
    # the carry stays f32 (promotion artifact, not a semantic difference)
    assert y_p.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(y_p, np.float32), np.asarray(y_x, np.float32), rtol=0.1, atol=0.1)
    np.testing.assert_allclose(np.asarray(c_p, np.float32), np.asarray(c_x, np.float32), rtol=0.15, atol=0.15)


def test_fused_lstm_bf16_grads_match(rng, monkeypatch):
    """bf16 gradient parity (ADVICE r4): the custom VJP returns cotangents in
    the primal dtype; check values against the scan path at loose tolerance."""
    b, t, e, h = 4, 20, 32, 32
    x = jnp.asarray(rng.standard_normal((b, t, e)), jnp.float32) * 0.5
    lengths = jnp.asarray([20, 11, 3, 16], jnp.int32)
    mask = (jnp.arange(t)[None, :] < lengths[:, None])[..., None].astype(jnp.float32)

    def make_loss(fwd):
        def loss(params, x):
            y, (c, hh) = fwd(params, x, None)
            return jnp.sum((y * mask).astype(jnp.float32) ** 2) + jnp.sum(c.astype(jnp.float32) * hh.astype(jnp.float32))

        return loss

    params, fwd_x = _run("xla", monkeypatch, x, lengths, h, dtype=jnp.bfloat16)
    _, fwd_p = _run("pallas", monkeypatch, x, lengths, h, dtype=jnp.bfloat16)
    gx = jax.grad(make_loss(fwd_x), argnums=(0, 1))(params, x)
    gp = jax.grad(make_loss(fwd_p), argnums=(0, 1))(params, x)
    jax.tree.map(
        lambda a, b_: np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b_, np.float32), rtol=0.15, atol=0.15),
        gx,
        gp,
    )


def test_fused_lstm_zeroes_post_length_outputs(rng, monkeypatch):
    """With lengths given, the fused path zeroes y past each row's length so
    the two impls never differ in unmasked junk (ADVICE r4)."""
    b, t, e, h = 3, 11, 8, 16
    x = jnp.asarray(rng.standard_normal((b, t, e)), jnp.float32)
    lengths = jnp.asarray([11, 4, 7], jnp.int32)
    params, fwd_p = _run("pallas", monkeypatch, x, lengths, h)
    y, _ = fwd_p(params, x, None)
    post = np.asarray(y) * np.asarray((jnp.arange(t)[None, :] >= lengths[:, None])[..., None])
    np.testing.assert_array_equal(post, np.zeros_like(post))


def test_fused_lstm_zero_length_keeps_initial_carry(rng, monkeypatch):
    b, t, e, h = 2, 9, 8, 16
    x = jnp.asarray(rng.standard_normal((b, t, e)), jnp.float32)
    lengths = jnp.asarray([0, 9], jnp.int32)
    c0 = jnp.asarray(rng.standard_normal((b, h)), jnp.float32)
    h0 = jnp.asarray(rng.standard_normal((b, h)), jnp.float32)
    params, _ = _run("xla", monkeypatch, x, lengths, h)
    _, fwd_p = _run("pallas", monkeypatch, x, lengths, h)  # env read at apply time
    _, (c, hh) = fwd_p(params, x, (c0, h0))
    np.testing.assert_allclose(np.asarray(c[0]), np.asarray(c0[0]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(hh[0]), np.asarray(h0[0]), rtol=1e-6)


def test_dispatch_supports_flagship_and_pads_hang_bucket():
    # prediction net at bench shapes: B=16, U+1=129, H=320
    assert lstm_shapes_supported(16, 129, 320)
    assert _padded_h(320) == 512  # 384-lane axon hang bucket must round up
    # decode-time single-step path never dispatches here (t=1 is fine though)
    assert lstm_shapes_supported(1, 1, 320)


def test_pad384_optin_matches_scan(rng, monkeypatch):
    """TFASR_LSTM_PAD384=384 (the on-chip canary knob) must keep exact
    parity: per-gate slice offsets move from k·512 to k·384 and every
    padded lane/row must still contribute nothing."""
    monkeypatch.setenv("TFASR_LSTM_PAD384", "384")
    assert _padded_h(320) == 384
    b, t, e, h = 3, 33, 320, 320
    x = jnp.asarray(rng.standard_normal((b, t, e)), jnp.float32) * 0.5
    lengths = jnp.asarray([33, 17, 9], jnp.int32)
    mask = (jnp.arange(t)[None, :] < lengths[:, None])[..., None].astype(jnp.float32)

    params, fwd_x = _run("xla", monkeypatch, x, lengths, h)
    _, fwd_p = _run("pallas", monkeypatch, x, lengths, h)

    def loss(fwd):
        def f(p):
            y, (c, hh) = fwd(p, x, None)
            return jnp.sum(jnp.square(y * mask)) + jnp.sum(jnp.square(c)) + jnp.sum(jnp.square(hh))

        return jax.value_and_grad(f)(params)

    vp, gp = loss(fwd_p)
    vx, gx = loss(fwd_x)
    np.testing.assert_allclose(np.asarray(vp), np.asarray(vx), rtol=2e-5)
    jax.tree.map(
        lambda a, b_: np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=3e-4, atol=3e-4),
        gp,
        gx,
    )
