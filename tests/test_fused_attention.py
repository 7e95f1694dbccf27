"""Fused attention kernel goldens (interpret mode on CPU).

Checks the Pallas softmax/PV kernel (ops/pallas/attention_kernel.py)
value- and gradient-matches the XLA composition it replaces, across
padded/unpadded shapes (incl. the 384-lane bump bucket), bias broadcast,
and the in-kernel dropout's fwd/bwd mask consistency.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflowasr_tpu.ops.pallas.attention_kernel import attention_shapes_supported, fused_attention


def _ref_attention(q, k, v, bias):
    s = jnp.einsum("ztd,zsd->zts", q, k).astype(jnp.float32)
    s = s + bias.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("zts,zsd->ztd", p.astype(v.dtype), v).astype(q.dtype)


@pytest.mark.parametrize(
    "bh,t,s,d",
    [
        (4, 40, 40, 36),  # unaligned everything
        (2, 33, 300, 36),  # S pads into the 384 bucket -> bumped to 512
        (3, 16, 128, 64),  # already aligned
    ],
)
def test_fused_attention_matches_xla(rng, bh, t, s, d):
    q = jnp.asarray(rng.standard_normal((bh, t, d)), jnp.float32) * 0.3
    k = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.float32) * 0.3
    v = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.float32) * 0.5
    # realistic bias: positional-ish noise + a -1e9 masked tail
    bias = jnp.asarray(rng.standard_normal((bh, t, s)), jnp.float32) * 0.2
    bias = bias.at[:, :, -3:].add(-1e9)

    out = fused_attention(q, k, v, bias, jnp.zeros((), jnp.int32), 0.0)
    ref = _ref_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_fused_attention_grads_match(rng):
    bh, t, s, d = 3, 24, 40, 20
    q = jnp.asarray(rng.standard_normal((bh, t, d)), jnp.float32) * 0.3
    k = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.float32) * 0.3
    v = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.float32) * 0.5
    bias = jnp.asarray(rng.standard_normal((bh, t, s)), jnp.float32) * 0.2
    g = jnp.asarray(rng.standard_normal((bh, t, d)), jnp.float32)

    def f_fused(q, k, v, bias):
        return jnp.sum(fused_attention(q, k, v, bias, jnp.zeros((), jnp.int32), 0.0) * g)

    def f_ref(q, k, v, bias):
        return jnp.sum(_ref_attention(q, k, v, bias) * g)

    gf = jax.grad(f_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(f_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b, name in zip(gf, gr, ["dq", "dk", "dv", "dbias"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5, err_msg=name)


def test_fused_attention_bias_broadcast(rng):
    """Leading-1 bias is shared across all (b·h) and its grad is summed."""
    bh, t, s, d = 4, 16, 24, 12
    q = jnp.asarray(rng.standard_normal((bh, t, d)), jnp.float32) * 0.3
    k = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.float32) * 0.3
    v = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.float32) * 0.5
    bias1 = jnp.asarray(rng.standard_normal((1, t, s)), jnp.float32) * 0.2

    out = fused_attention(q, k, v, bias1, jnp.zeros((), jnp.int32), 0.0)
    ref = _ref_attention(q, k, v, jnp.broadcast_to(bias1, (bh, t, s)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    db = jax.grad(lambda b: jnp.sum(fused_attention(q, k, v, b, jnp.zeros((), jnp.int32), 0.0)))(bias1)
    db_ref = jax.grad(lambda b: jnp.sum(_ref_attention(q, k, v, jnp.broadcast_to(b, (bh, t, s)))))(bias1)
    np.testing.assert_allclose(np.asarray(db), np.asarray(db_ref), rtol=2e-4, atol=2e-5)


def test_fused_attention_bf16(rng):
    bh, t, s, d = 2, 32, 48, 36
    q = jnp.asarray(rng.standard_normal((bh, t, d)), jnp.bfloat16) * 0.3
    k = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.bfloat16) * 0.3
    v = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.bfloat16) * 0.5
    bias = jnp.asarray(rng.standard_normal((bh, t, s)), jnp.bfloat16) * 0.2
    out = fused_attention(q, k, v, bias, jnp.zeros((), jnp.int32), 0.0)
    ref = _ref_attention(q, k, v, bias)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=3e-2, atol=3e-2
    )


def test_fused_attention_dropout_consistency(rng):
    """With dropout, out is linear in v through the SAME keep mask in fwd and
    bwd: Σ (dv ⊙ v) must equal Σ out exactly — catches any fwd/bwd PRNG
    stream divergence. Also: deterministic per seed, varying across seeds,
    and keep-rate ≈ 1 − rate."""
    bh, t, s, d = 2, 16, 32, 12
    q = jnp.asarray(rng.standard_normal((bh, t, d)), jnp.float32) * 0.3
    k = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.float32) * 0.3
    v = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.float32) * 0.5
    bias = jnp.zeros((bh, t, s), jnp.float32)
    rate = 0.4
    seed = jnp.asarray(1234, jnp.int32)

    out = fused_attention(q, k, v, bias, seed, rate)
    out2 = fused_attention(q, k, v, bias, seed, rate)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    out3 = fused_attention(q, k, v, bias, jnp.asarray(99, jnp.int32), rate)
    assert not np.allclose(np.asarray(out), np.asarray(out3))

    dv = jax.grad(lambda vv: jnp.sum(fused_attention(q, k, vv, bias, seed, rate)))(v)
    np.testing.assert_allclose(float(jnp.sum(dv * v)), float(jnp.sum(out)), rtol=1e-5)

    # keep fraction: compare row sums against the no-dropout row sums of 1
    ones_v = jnp.ones_like(v[..., :1])
    kept = fused_attention(q, k, jnp.broadcast_to(ones_v, v.shape), bias, seed, rate)
    frac = float(jnp.mean(kept))  # E = 1 under exact-rate dropout scaling
    assert 0.8 < frac < 1.2


def test_layer_dispatch_matches_xla(rng):
    """MultiHeadRelativeAttention: pallas vs xla impl, same params/inputs."""
    import os

    from tensorflowasr_tpu.models.layers.attention import MultiHeadRelativeAttention

    b, t, d, heads, hd = 2, 20, 24, 2, 12
    x = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32) * 0.5
    relpe = jnp.asarray(rng.standard_normal((b, 2 * t - 1, d)), jnp.float32) * 0.5
    qmask = jnp.arange(t)[None, :] < jnp.asarray([t, t - 6])[:, None]

    layer = MultiHeadRelativeAttention(num_heads=heads, key_dim=hd, output_dim=d)
    variables = layer.init(
        {"params": jax.random.PRNGKey(0)}, x, x, relpe=relpe, query_mask=qmask, kv_mask=qmask
    )

    outs = {}
    for impl in ("xla", "pallas"):
        os.environ["TFASR_ATTN_IMPL"] = impl
        try:
            out, _ = layer.apply(variables, x, x, relpe=relpe, query_mask=qmask, kv_mask=qmask)
        finally:
            os.environ.pop("TFASR_ATTN_IMPL", None)
        outs[impl] = np.asarray(out)
    np.testing.assert_allclose(outs["pallas"], outs["xla"], rtol=1e-4, atol=1e-5)


def test_shapes_supported_guard():
    assert attention_shapes_supported(400, 400)
    assert attention_shapes_supported(1600, 1600)
    assert not attention_shapes_supported(4096, 4096)
