"""Fused FF-module kernel goldens (interpret mode on CPU).

Checks ops/pallas/ff_kernel.py value- and gradient-matches the XLA
composition it replaces (LN → dense+swish → dense → scaled residual),
across padded/unpadded shapes, both dropout sites' fwd/bwd PRNG
consistency, and that the FFModule fused path produces an identical
checkpoint tree to the XLA submodules.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflowasr_tpu.ops.pallas.ff_kernel import ff_shapes_supported, fused_ff


def _ref_ff(x, gamma, beta, w1, b1, w2, b2, factor, eps=1e-3):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps) * gamma + beta
    h = y @ w1 + b1
    a = h * jax.nn.sigmoid(h)
    return x + factor * (a @ w2 + b2)


def _make(rng, n, d, f, dtype=jnp.float32):
    r = lambda *s: jnp.asarray(rng.standard_normal(s), dtype)
    return (
        r(n, d) * 0.5,
        r(d) * 0.1 + 1.0,
        r(d) * 0.1,
        r(d, f) * (1.0 / np.sqrt(d)),
        r(f) * 0.1,
        r(f, d) * (1.0 / np.sqrt(f)),
        r(d) * 0.1,
    )


@pytest.mark.parametrize(
    "n,d,f,factor",
    [
        (37, 24, 96, 0.5),  # unaligned rows + lanes
        (64, 128, 512, 1.0),  # aligned
        (7, 144, 576, 0.5),  # bench lane shapes, tiny rows
    ],
)
def test_fused_ff_matches_ref(rng, n, d, f, factor):
    args = _make(rng, n, d, f)
    out = fused_ff(*args, jnp.zeros((), jnp.int32), 0.0, factor)
    ref = _ref_ff(*args, factor)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_fused_ff_grads_match(rng):
    n, d, f = 45, 24, 96
    args = _make(rng, n, d, f)
    g = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)

    def f_fused(*a):
        return jnp.sum(fused_ff(*a, jnp.zeros((), jnp.int32), 0.0, 0.5) * g)

    def f_ref(*a):
        return jnp.sum(_ref_ff(*a, 0.5) * g)

    gf = jax.grad(f_fused, argnums=tuple(range(7)))(*args)
    gr = jax.grad(f_ref, argnums=tuple(range(7)))(*args)
    names = ["dx", "dgamma", "dbeta", "dw1", "db1", "dw2", "db2"]
    for a, b, name in zip(gf, gr, names):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5, err_msg=name)


def test_fused_ff_multitile_grad_accumulation(rng):
    """Rows spanning several grid steps: weight grads accumulate across
    revisited output blocks (monkeypatch the tile size down to force >1 step)."""
    import tensorflowasr_tpu.ops.pallas.ff_kernel as ffk

    orig = ffk._row_tile
    ffk._row_tile = lambda n: 16
    try:
        n, d, f = 50, 12, 48
        args = _make(rng, n, d, f)

        def f_fused(*a):
            return jnp.sum(jnp.square(fused_ff(*a, jnp.zeros((), jnp.int32), 0.0, 0.5)))

        def f_ref(*a):
            return jnp.sum(jnp.square(_ref_ff(*a, 0.5)))

        gf = jax.grad(f_fused, argnums=(3, 4, 5, 6))(*args)
        gr = jax.grad(f_ref, argnums=(3, 4, 5, 6))(*args)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)
    finally:
        ffk._row_tile = orig


def test_fused_ff_bf16(rng):
    n, d, f = 32, 144, 576
    args = _make(rng, n, d, f, jnp.bfloat16)
    out = fused_ff(*args, jnp.zeros((), jnp.int32), 0.0, 0.5)
    assert out.dtype == jnp.bfloat16
    ref = _ref_ff(*[a.astype(jnp.float32) for a in args], 0.5)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref), rtol=3e-2, atol=3e-2)


def test_fused_ff_dropout_consistency(rng):
    """Fixed seed → deterministic; different seeds differ; the post-W2 keep
    mask is identical in fwd and bwd: out is affine in b2 with coefficient
    factor·keep2, so grad(b2) must equal the forward finite difference."""
    n, d, f = 24, 16, 64
    x, gamma, beta, w1, b1, w2, b2 = _make(rng, n, d, f)
    rate, factor = 0.4, 0.5
    seed = jnp.asarray(77, jnp.int32)

    out = fused_ff(x, gamma, beta, w1, b1, w2, b2, seed, rate, factor)
    out2 = fused_ff(x, gamma, beta, w1, b1, w2, b2, seed, rate, factor)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    out3 = fused_ff(x, gamma, beta, w1, b1, w2, b2, jnp.asarray(5, jnp.int32), rate, factor)
    assert not np.allclose(np.asarray(out), np.asarray(out3))

    db2 = jax.grad(lambda b: jnp.sum(fused_ff(x, gamma, beta, w1, b1, w2, b, seed, rate, factor)))(b2)
    delta = 1.0
    shifted = fused_ff(x, gamma, beta, w1, b1, w2, b2 + delta, seed, rate, factor)
    fd = jnp.sum(shifted - out, axis=0) / delta  # = factor · colsum(keep2)
    np.testing.assert_allclose(np.asarray(db2), np.asarray(fd), rtol=1e-4, atol=1e-4)

    # whole-backward directional check at fixed seed (mask locally constant)
    vec = [jnp.asarray(rng.standard_normal(a.shape), jnp.float32) * 1e-3 for a in (x, w1, w2)]

    def loss(xx, ww1, ww2):
        return jnp.sum(jnp.square(fused_ff(xx, gamma, beta, ww1, b1, ww2, b2, seed, rate, factor)))

    grads = jax.grad(loss, argnums=(0, 1, 2))(x, w1, w2)
    analytic = sum(float(jnp.sum(g * v)) for g, v in zip(grads, vec))
    lp = loss(x + vec[0], w1 + vec[1], w2 + vec[2])
    lm = loss(x - vec[0], w1 - vec[1], w2 - vec[2])
    np.testing.assert_allclose(analytic, float(lp - lm) / 2.0, rtol=2e-3)


def test_ffmodule_dispatch_matches_xla(rng):
    from tensorflowasr_tpu.models.encoders.conformer import FFModule

    b, t, d = 2, 18, 24
    x = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32) * 0.5
    layer = FFModule(input_dim=d, scale_factor=4, residual_factor=0.5)

    trees, outs, grads = {}, {}, {}
    for impl in ("xla", "pallas"):
        os.environ["TFASR_FF_IMPL"] = impl
        try:
            variables = layer.init({"params": jax.random.PRNGKey(0)}, x)
            outs[impl] = np.asarray(layer.apply(variables, x))
            grads[impl] = jax.grad(lambda v: jnp.sum(jnp.square(layer.apply(v, x))))(variables)
        finally:
            os.environ.pop("TFASR_FF_IMPL", None)
        trees[impl] = variables
    # identical checkpoint tree (same init rng folding by path) and outputs
    pa, xa = jax.tree_util.tree_leaves_with_path(trees["pallas"]), jax.tree_util.tree_leaves_with_path(trees["xla"])
    assert [p for p, _ in pa] == [p for p, _ in xa]
    for (_, a), (_, b_) in zip(pa, xa):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
    np.testing.assert_allclose(outs["pallas"], outs["xla"], rtol=1e-5, atol=1e-6)
    for a, b_ in zip(jax.tree_util.tree_leaves(grads["pallas"]), jax.tree_util.tree_leaves(grads["xla"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-5)


def test_shapes_supported_guard():
    assert ff_shapes_supported(6400, 144, 576)
    assert not ff_shapes_supported(6400, 4096, 16384)
