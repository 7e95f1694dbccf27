"""Fused conv-module kernel goldens (interpret mode on CPU).

Checks ops/pallas/conv_kernel.py (F1: LN→pointwise→GLU→depthwise conv;
F2: BN-apply→swish→pointwise→dropout→residual) value- and gradient-
matches the XLA ConvModule composition, for causal and same padding,
train (batch stats + running update) and eval (running stats) modes,
and that the fused path's checkpoint tree is identical.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflowasr_tpu.ops.pallas.conv_kernel import conv_back, conv_front, conv_shapes_supported, depthwise_conv1d


def _ln(x, gamma, beta, eps=1e-3):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * gamma + beta


def _ref_front(x, gamma, beta, wa, ba, wb, bb, wd, bd, padding):
    """conv_front (Pallas) + depthwise_conv1d (XLA) reference: LN → pw →
    GLU → depthwise conv via explicit shifted slices."""
    y = _ln(x, gamma, beta)
    ha = y @ wa + ba
    hb = y @ wb + bb
    g = ha * jax.nn.sigmoid(hb)
    k = wd.shape[0]
    pad = (k - 1, 0) if padding == "causal" else ((k - 1) // 2, k // 2)
    gp = jnp.pad(g, ((0, 0), pad, (0, 0)))
    t = x.shape[1]
    out = sum(wd[j] * gp[:, j : j + t, :] for j in range(k))
    return out + bd


def _fused_front(x, gamma, beta, wa, ba, wb, bb, wd, bd, padding):
    return depthwise_conv1d(conv_front(x, gamma, beta, wa, ba, wb, bb), wd, bd, padding)


def _ref_back(x, y1, mean, var, scale, bias, w2, b2, factor, eps=1e-3):
    xhat = (y1 - mean) * jax.lax.rsqrt(var + eps)
    bn = xhat * scale + bias
    a = bn * jax.nn.sigmoid(bn)
    return x + factor * (a @ w2 + b2)


def _make_front(rng, b, t, d, k, dtype=jnp.float32):
    r = lambda *s: jnp.asarray(rng.standard_normal(s), dtype)
    return (
        r(b, t, d) * 0.5,
        r(d) * 0.1 + 1.0,
        r(d) * 0.1,
        r(d, d) * (1.0 / np.sqrt(d)),
        r(d) * 0.1,
        r(d, d) * (1.0 / np.sqrt(d)),
        r(d) * 0.1,
        r(k, d) * 0.3,
        r(d) * 0.1,
    )


@pytest.mark.parametrize("padding,t,d,k", [("causal", 37, 24, 7), ("same", 40, 16, 8), ("causal", 25, 144, 31)])
def test_conv_front_matches_ref(rng, padding, t, d, k):
    args = _make_front(rng, 2, t, d, k)
    out = _fused_front(*args, padding)
    ref = _ref_front(*args, padding)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_conv_front_multistep_packed_accumulation(rng):
    """b=8 with pack factor → several grid steps, each carrying packed
    examples: weight grads must accumulate across revisited blocks and
    conv taps must not cross example boundaries."""
    args = _make_front(rng, 8, 19, 12, 5)
    g = jnp.asarray(rng.standard_normal((8, 19, 12)), jnp.float32)

    def f_fused(*a):
        return jnp.sum(_fused_front(*a, "causal") * g)

    def f_ref(*a):
        return jnp.sum(_ref_front(*a, "causal") * g)

    gf = jax.grad(f_fused, argnums=tuple(range(9)))(*args)
    gr = jax.grad(f_ref, argnums=tuple(range(9)))(*args)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("padding", ["causal", "same"])
def test_conv_front_grads_match(rng, padding):
    args = _make_front(rng, 2, 22, 20, 5)
    g = jnp.asarray(rng.standard_normal((2, 22, 20)), jnp.float32)

    def f_fused(*a):
        return jnp.sum(_fused_front(*a, padding) * g)

    def f_ref(*a):
        return jnp.sum(_ref_front(*a, padding) * g)

    gf = jax.grad(f_fused, argnums=tuple(range(9)))(*args)
    gr = jax.grad(f_ref, argnums=tuple(range(9)))(*args)
    names = ["dx", "dgamma", "dbeta", "dwa", "dba", "dwb", "dbb", "dwd", "dbd"]
    for a, b, name in zip(gf, gr, names):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5, err_msg=name)


def test_conv_back_matches_ref_with_stats_grads(rng):
    """conv_back + XLA batch stats: grads must flow through mean/var like
    real train-mode BatchNorm (dmean/dvar cotangents)."""
    b, t, d = 2, 18, 16
    x = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32) * 0.5
    y1 = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(d), jnp.float32) * 0.1 + 1.0
    bias = jnp.asarray(rng.standard_normal(d), jnp.float32) * 0.1
    w2 = jnp.asarray(rng.standard_normal((d, d)), jnp.float32) * 0.25
    b2 = jnp.asarray(rng.standard_normal(d), jnp.float32) * 0.1

    def stats(y):
        m = jnp.mean(y, axis=(0, 1))
        return m, jnp.mean(jnp.square(y), axis=(0, 1)) - jnp.square(m)

    def f_fused(xx, yy, ss, bb_, ww, cc):
        m, v = stats(yy)
        return jnp.sum(jnp.square(conv_back(xx, yy, m, v, ss, bb_, ww, cc, jnp.zeros((), jnp.int32), 0.0, 1.0)))

    def f_ref(xx, yy, ss, bb_, ww, cc):
        m, v = stats(yy)
        return jnp.sum(jnp.square(_ref_back(xx, yy, m, v, ss, bb_, ww, cc, 1.0)))

    val_f = f_fused(x, y1, scale, bias, w2, b2)
    val_r = f_ref(x, y1, scale, bias, w2, b2)
    np.testing.assert_allclose(float(val_f), float(val_r), rtol=1e-5)
    gf = jax.grad(f_fused, argnums=tuple(range(6)))(x, y1, scale, bias, w2, b2)
    gr = jax.grad(f_ref, argnums=tuple(range(6)))(x, y1, scale, bias, w2, b2)
    for a, b_, name in zip(gf, gr, ["dx", "dy1", "dscale", "dbias", "dw2", "db2"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-5, err_msg=name)


def test_conv_back_dropout_consistency(rng):
    b, t, d = 2, 12, 16
    x = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    y1 = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    one = jnp.ones((d,), jnp.float32)
    zero = jnp.zeros((d,), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((d, d)), jnp.float32) * 0.25
    seed = jnp.asarray(31, jnp.int32)
    rate = 0.4

    out = conv_back(x, y1, zero, one, one, zero, w2, zero, seed, rate, 1.0)
    out2 = conv_back(x, y1, zero, one, one, zero, w2, zero, seed, rate, 1.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    assert not np.allclose(np.asarray(out), np.asarray(conv_back(x, y1, zero, one, one, zero, w2, zero, jnp.asarray(3, jnp.int32), rate, 1.0)))

    # out is affine in b2 with coefficient keep: grad == forward difference
    db2 = jax.grad(lambda c: jnp.sum(conv_back(x, y1, zero, one, one, zero, w2, c, seed, rate, 1.0)))(zero)
    shifted = conv_back(x, y1, zero, one, one, zero, w2, zero + 1.0, seed, rate, 1.0)
    fd = jnp.sum(shifted - out, axis=(0, 1))
    np.testing.assert_allclose(np.asarray(db2), np.asarray(fd), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("train", [False, True])
def test_convmodule_dispatch_matches_xla(rng, train):
    from tensorflowasr_tpu.models.encoders.conformer import ConvModule

    b, t, d = 2, 20, 16
    x = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32) * 0.5
    layer = ConvModule(input_dim=d, kernel_size=5, dropout=0.0, padding="causal")

    trees, outs, stats, grads = {}, {}, {}, {}
    for impl in ("xla", "pallas"):
        os.environ["TFASR_CONV_IMPL"] = impl
        try:
            variables = layer.init({"params": jax.random.PRNGKey(0)}, x)
            if train:
                out, mut = layer.apply(variables, x, train=True, mutable=["batch_stats"])
                stats[impl] = jax.tree_util.tree_leaves(mut)

                def loss(v):
                    o, _ = layer.apply(v, x, train=True, mutable=["batch_stats"])
                    return jnp.sum(jnp.square(o))

                grads[impl] = jax.tree_util.tree_leaves(jax.grad(loss)({"params": variables["params"], "batch_stats": variables["batch_stats"]}))
            else:
                out = layer.apply(variables, x)
                grads[impl] = jax.tree_util.tree_leaves(jax.grad(lambda v: jnp.sum(jnp.square(layer.apply(v, x))))(variables))
            outs[impl] = np.asarray(out)
        finally:
            os.environ.pop("TFASR_CONV_IMPL", None)
        trees[impl] = variables

    pa = jax.tree_util.tree_leaves_with_path(trees["pallas"])
    xa = jax.tree_util.tree_leaves_with_path(trees["xla"])
    assert [p for p, _ in pa] == [p for p, _ in xa]
    for (_, a), (_, b_) in zip(pa, xa):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
    np.testing.assert_allclose(outs["pallas"], outs["xla"], rtol=1e-5, atol=1e-5)
    if train:
        for a, b_ in zip(stats["pallas"], stats["xla"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-5, atol=1e-6)
    for a, b_ in zip(grads["pallas"], grads["xla"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-5)


def test_shapes_supported_guard():
    assert conv_shapes_supported(400, 144, 31, "causal")
    assert conv_shapes_supported(400, 144, 31, "same")
    assert not conv_shapes_supported(400, 144, 31, "valid")
    assert not conv_shapes_supported(20000, 2048, 31, "causal")
