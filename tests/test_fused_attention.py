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


@pytest.mark.parametrize("with_kv", [False, True])
def test_vanilla_mha_dispatch_matches_xla(rng, with_kv):
    """MultiHeadAttention (non-relative): query-row-only masks are [B,1,T,1]
    and softmax-invariant; kv masks exercise the bias broadcast."""
    import os

    from tensorflowasr_tpu.models.layers.attention import MultiHeadAttention

    b, t, d, heads, hd = 2, 18, 24, 2, 12
    x = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32) * 0.5
    qmask = jnp.arange(t)[None, :] < jnp.asarray([t, t - 5])[:, None]
    kwargs = dict(query_mask=qmask)
    if with_kv:
        kwargs["kv_mask"] = qmask

    layer = MultiHeadAttention(num_heads=heads, key_dim=hd, output_dim=d)
    variables = layer.init({"params": jax.random.PRNGKey(0)}, x, x, **kwargs)
    outs = {}
    for impl in ("xla", "pallas"):
        os.environ["TFASR_ATTN_IMPL"] = impl
        try:
            out, _ = layer.apply(variables, x, x, **kwargs)
        finally:
            os.environ.pop("TFASR_ATTN_IMPL", None)
        outs[impl] = np.asarray(out)
    np.testing.assert_allclose(outs["pallas"], outs["xla"], rtol=1e-4, atol=1e-5)


def test_shapes_supported_guard():
    assert attention_shapes_supported(400, 400)
    assert attention_shapes_supported(1600, 1600)
    assert not attention_shapes_supported(4096, 4096)


# --------------------------------------------------------------------------- #
# kernel B: fully-fused relative attention (in-kernel barrel-shifted rel term)
# --------------------------------------------------------------------------- #


def _rel_layer(heads=2, hd=12, d=24, causal_pe=False, **kw):
    from tensorflowasr_tpu.models.layers.attention import MultiHeadRelativeAttention

    return MultiHeadRelativeAttention(num_heads=heads, key_dim=hd, output_dim=d, causal=causal_pe, **kw)


def _run_both(layer, variables, args, kwargs):
    import os

    outs = {}
    for impl in ("xla", "pallas"):
        os.environ["TFASR_ATTN_IMPL"] = impl
        try:
            out, _ = layer.apply(variables, *args, **kwargs)
        finally:
            os.environ.pop("TFASR_ATTN_IMPL", None)
        outs[impl] = np.asarray(out)
    return outs


@pytest.mark.parametrize("case", ["plain", "causal_vis", "chunked", "kv_masked", "causal_pe"])
def test_rel_fused_matches_xla_variants(rng, case):
    b, t, d, heads, hd = 2, 24, 24, 2, 12
    x = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32) * 0.5
    causal_pe = case == "causal_pe"
    r = t if causal_pe else 2 * t - 1
    relpe = jnp.asarray(rng.standard_normal((b, r, d)), jnp.float32) * 0.5

    kwargs = dict(relpe=relpe)
    layer_kw = {}
    if case == "causal_vis":
        kwargs["use_causal_mask"] = True
    if case == "causal_pe":
        kwargs["use_causal_mask"] = True
    if case == "chunked":
        layer_kw = dict(chunk_size=6, history_size=6)
    if case == "kv_masked":
        kwargs["kv_mask"] = jnp.arange(t)[None, :] < jnp.asarray([t, t - 7])[:, None]
        kwargs["query_mask"] = kwargs["kv_mask"]

    layer = _rel_layer(heads, hd, d, causal_pe=causal_pe, **layer_kw)
    variables = layer.init({"params": jax.random.PRNGKey(0)}, x, x, **kwargs)
    outs = _run_both(layer, variables, (x, x), kwargs)
    np.testing.assert_allclose(outs["pallas"], outs["xla"], rtol=1e-4, atol=1e-5, err_msg=case)


def test_rel_fused_grads_match_xla(rng):
    import os

    b, t, d, heads, hd = 2, 20, 24, 2, 12
    x = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32) * 0.5
    relpe = jnp.asarray(rng.standard_normal((b, 2 * t - 1, d)), jnp.float32) * 0.5
    layer = _rel_layer(heads, hd, d)
    variables = layer.init({"params": jax.random.PRNGKey(0)}, x, x, relpe=relpe)

    def loss(v, xx, rp):
        out, _ = layer.apply(v, xx, xx, relpe=rp)
        return jnp.sum(out * out)

    grads = {}
    for impl in ("xla", "pallas"):
        os.environ["TFASR_ATTN_IMPL"] = impl
        try:
            grads[impl] = jax.grad(loss, argnums=(0, 1, 2))(variables, x, relpe)
        finally:
            os.environ.pop("TFASR_ATTN_IMPL", None)
    for a, b_ in zip(jax.tree_util.tree_leaves(grads["pallas"]), jax.tree_util.tree_leaves(grads["xla"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-5)


@pytest.mark.parametrize("causal_pe", [False, True])
def test_rel_fused_long_relpe_slice(rng, causal_pe):
    """Memory-configured relpe with NO memory prepended: R is longer than
    2T−1 (or T), so the XLA path's trailing [..., -S:] slice is NOT a no-op
    — regression for the in-kernel `extra` shift offset."""
    b, t, d, heads, hd, m = 2, 16, 24, 2, 12, 8
    x = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32) * 0.5
    r = (t + m) if causal_pe else (m + 2 * t - 1)
    relpe = jnp.asarray(rng.standard_normal((b, r, d)), jnp.float32) * 0.5
    kwargs = dict(relpe=relpe)
    if causal_pe:
        kwargs["use_causal_mask"] = True
    layer = _rel_layer(heads, hd, d, causal_pe=causal_pe)
    variables = layer.init({"params": jax.random.PRNGKey(0)}, x, x, **kwargs)
    outs = _run_both(layer, variables, (x, x), kwargs)
    np.testing.assert_allclose(outs["pallas"], outs["xla"], rtol=1e-4, atol=1e-5)


def test_rel_fused_with_memory_state(rng):
    """KV memory prepends S−T masked slots — exercises the kv_bias row and
    R = M+2T−1 relpe inside the kernel."""
    from tensorflowasr_tpu.models.layers.attention import MemoryState

    b, t, d, heads, hd, m = 2, 12, 24, 2, 12, 8
    x = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32) * 0.5
    relpe = jnp.asarray(rng.standard_normal((b, m + 2 * t - 1, d)), jnp.float32) * 0.5
    layer = _rel_layer(heads, hd, d, memory_length=m)
    mem = MemoryState.init(b, m, d)
    mem["k"] = jnp.asarray(rng.standard_normal((b, m, d)), jnp.float32) * 0.5
    mem["v"] = jnp.asarray(rng.standard_normal((b, m, d)), jnp.float32) * 0.5
    mem["mask"] = jnp.arange(m)[None, :] >= jnp.asarray([m, 3])[:, None]
    kwargs = dict(relpe=relpe, memory_state=mem)
    variables = layer.init({"params": jax.random.PRNGKey(0)}, x, x, **kwargs)
    outs = _run_both(layer, variables, (x, x), kwargs)
    np.testing.assert_allclose(outs["pallas"], outs["xla"], rtol=1e-4, atol=1e-5)
