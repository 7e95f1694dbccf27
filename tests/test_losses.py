"""CTC / RNN-T loss golden tests: optax oracle + brute-force numpy DP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflowasr_tpu.ops import ctc_loss as ctc_mod
from tensorflowasr_tpu.ops import rnnt_loss as rnnt_mod


# ----------------------------- brute force oracles ---------------------------- #


def ctc_brute(log_probs, labels, blank=0):
    """Exact CTC -log p(labels) for one example via forward DP (numpy)."""
    T, V = log_probs.shape
    ext = [blank]
    for l in labels:
        ext += [l, blank]
    S = len(ext)
    alpha = np.full((T, S), -np.inf)
    alpha[0, 0] = log_probs[0, ext[0]]
    if S > 1:
        alpha[0, 1] = log_probs[0, ext[1]]
    for t in range(1, T):
        for s in range(S):
            cands = [alpha[t - 1, s]]
            if s >= 1:
                cands.append(alpha[t - 1, s - 1])
            if s >= 2 and ext[s] != blank and ext[s] != ext[s - 2]:
                cands.append(alpha[t - 1, s - 2])
            alpha[t, s] = np.logaddexp.reduce(cands) + log_probs[t, ext[s]]
    return -np.logaddexp(alpha[T - 1, S - 1], alpha[T - 1, S - 2] if S > 1 else -np.inf)


def rnnt_brute(log_probs, labels, blank=0):
    """Exact RNN-T -log p(labels) for one example (numpy).

    log_probs: [T, U+1, V]; labels: [U]
    """
    T, U1, V = log_probs.shape
    U = U1 - 1
    alpha = np.full((T, U1), -np.inf)
    alpha[0, 0] = 0.0
    for t in range(T):
        for u in range(U1):
            if t == 0 and u == 0:
                continue
            cands = []
            if t > 0:
                cands.append(alpha[t - 1, u] + log_probs[t - 1, u, blank])
            if u > 0:
                cands.append(alpha[t, u - 1] + log_probs[t, u - 1, labels[u - 1]])
            alpha[t, u] = np.logaddexp.reduce(cands)
    return -(alpha[T - 1, U] + log_probs[T - 1, U, blank])


# --------------------------------- CTC tests ---------------------------------- #


def _rand_ctc(rng, B=3, T=20, U=5, V=10):
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    labels = rng.integers(1, V, (B, U)).astype(np.int32)
    logit_len = np.asarray([T, T - 3, T - 7], np.int32)[:B]
    label_len = np.asarray([U, U - 1, U - 2], np.int32)[:B]
    labels = labels * (np.arange(U)[None, :] < label_len[:, None])
    return logits, logit_len, labels, label_len


def test_ctc_matches_brute_force(rng):
    logits, logit_len, labels, label_len = _rand_ctc(rng)
    ours = np.asarray(ctc_mod.ctc_loss(jnp.asarray(logits), logit_len, jnp.asarray(labels), label_len))
    for b in range(len(logits)):
        lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits[b, : logit_len[b]])))
        expect = ctc_brute(lp, labels[b, : label_len[b]].tolist())
        np.testing.assert_allclose(ours[b], expect, rtol=1e-4, atol=1e-4)


def test_ctc_matches_optax(rng):
    import optax

    logits, logit_len, labels, label_len = _rand_ctc(rng, B=3, T=25, U=6, V=12)
    T, U = logits.shape[1], labels.shape[1]
    logit_pad = (np.arange(T)[None, :] >= logit_len[:, None]).astype(np.float32)
    label_pad = (np.arange(U)[None, :] >= label_len[:, None]).astype(np.float32)
    theirs = np.asarray(optax.ctc_loss(jnp.asarray(logits), jnp.asarray(logit_pad), jnp.asarray(labels), jnp.asarray(label_pad)))
    ours = np.asarray(ctc_mod.ctc_loss(jnp.asarray(logits), logit_len, jnp.asarray(labels), label_len))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_ctc_grad_finite_and_jittable(rng):
    logits, logit_len, labels, label_len = _rand_ctc(rng)
    fn = jax.jit(jax.grad(lambda lg: ctc_mod.ctc_loss_mean(lg, logit_len, jnp.asarray(labels), label_len)))
    g = np.asarray(fn(jnp.asarray(logits)))
    assert np.isfinite(g).all()
    # padded frames get zero gradient
    assert np.abs(g[1, logit_len[1]:, :]).max() == 0.0


def test_ctc_bf16_casts(rng):
    logits, logit_len, labels, label_len = _rand_ctc(rng)
    out32 = ctc_mod.ctc_loss(jnp.asarray(logits), logit_len, jnp.asarray(labels), label_len)
    out16 = ctc_mod.ctc_loss(jnp.asarray(logits, jnp.bfloat16), logit_len, jnp.asarray(labels), label_len)
    np.testing.assert_allclose(np.asarray(out32), np.asarray(out16), rtol=0.05, atol=0.3)


# --------------------------------- RNN-T tests -------------------------------- #


def _rand_rnnt(rng, B=3, T=12, U=4, V=8):
    logits = rng.standard_normal((B, T, U + 1, V)).astype(np.float32)
    labels = rng.integers(1, V, (B, U)).astype(np.int32)
    logit_len = np.asarray([T, T - 2, T - 5], np.int32)[:B]
    label_len = np.asarray([U, U - 1, U - 2], np.int32)[:B]
    labels = labels * (np.arange(U)[None, :] < label_len[:, None])
    return logits, logit_len, labels, label_len


def test_rnnt_matches_brute_force(rng):
    logits, logit_len, labels, label_len = _rand_rnnt(rng)
    ours = np.asarray(rnnt_mod.rnnt_loss(jnp.asarray(logits), logit_len, jnp.asarray(labels), label_len))
    for b in range(len(logits)):
        lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits[b])))
        expect = rnnt_brute(lp[: logit_len[b], : label_len[b] + 1], labels[b, : label_len[b]].tolist())
        np.testing.assert_allclose(ours[b], expect, rtol=1e-4, atol=1e-4)


def test_rnnt_grad_finite_and_padding_zero(rng):
    logits, logit_len, labels, label_len = _rand_rnnt(rng)
    fn = jax.jit(jax.grad(lambda lg: rnnt_mod.rnnt_loss_mean(lg, logit_len, jnp.asarray(labels), label_len)))
    g = np.asarray(fn(jnp.asarray(logits)))
    assert np.isfinite(g).all()
    # gradient on frames beyond logit_length must be zero
    assert np.abs(g[2, logit_len[2]:, :, :]).max() == 0.0
    # gradient on label positions beyond label_length+1 must be zero
    assert np.abs(g[2, :, label_len[2] + 1:, :]).max() == 0.0


def test_rnnt_grad_matches_numerical(rng):
    # tiny case: compare autodiff grad against central differences
    logits, logit_len, labels, label_len = _rand_rnnt(rng, B=1, T=4, U=2, V=4)
    loss = lambda lg: rnnt_mod.rnnt_loss(lg, logit_len, jnp.asarray(labels), label_len)[0]
    g = np.asarray(jax.grad(loss)(jnp.asarray(logits)))
    eps = 1e-3
    for idx in [(0, 0, 0, 0), (0, 1, 1, 2), (0, 3, 2, 0), (0, 2, 0, 3)]:
        e = np.zeros_like(logits)
        e[idx] = eps
        num = (float(loss(jnp.asarray(logits + e))) - float(loss(jnp.asarray(logits - e)))) / (2 * eps)
        np.testing.assert_allclose(g[idx], num, rtol=1e-2, atol=1e-3)


def test_rnnt_bf16_casts(rng):
    logits, logit_len, labels, label_len = _rand_rnnt(rng)
    out32 = rnnt_mod.rnnt_loss(jnp.asarray(logits), logit_len, jnp.asarray(labels), label_len)
    out16 = rnnt_mod.rnnt_loss(jnp.asarray(logits, jnp.bfloat16), logit_len, jnp.asarray(labels), label_len)
    np.testing.assert_allclose(np.asarray(out32), np.asarray(out16), rtol=0.05, atol=0.5)
