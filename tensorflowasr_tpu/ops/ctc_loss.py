"""CTC loss: log-space forward recursion, batched, jit/grad-safe.

Functional replacement for the reference's CTC stack — the pure-TF TPU
implementation (``tensorflow_asr/losses/impl/ctc_tpu.py``, alpha/beta over
open/closed label states) and the external warp-ctc C++/CUDA op
(``scripts/install_ctc_loss.sh``). Here a single ``lax.scan`` over time on
the standard extended-label lattice computes the exact negative
log-likelihood; XLA autodiff through the scan yields the analytic gradient
(the backward recursion) at the same asymptotic cost.

Conventions (reference parity, ``losses/base_loss.py:24-36``):
  - blank index is 0
  - ``logit_length`` is clamped to be ≥ ``label_length``
  - bf16/f16 logits are cast to f32 for the DP
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tensorflowasr_tpu.utils.math_util import LOG_0


def _extend_labels(labels: jax.Array) -> jax.Array:
    """[B, U] → [B, 2U+1] with blanks interleaved: b, y1, b, y2, ..., b."""
    b, u = labels.shape
    ext = jnp.zeros((b, 2 * u + 1), labels.dtype)
    ext = ext.at[:, 1::2].set(labels)
    return ext


def ctc_loss(
    logits: jax.Array,
    logit_length: jax.Array,
    labels: jax.Array,
    label_length: jax.Array,
    blank: int = 0,
) -> jax.Array:
    """Negative log-likelihood per example.

    Parameters
    ----------
    logits : [B, T, V] unnormalized scores
    logit_length : [B] valid frames
    labels : [B, U] int labels (0 = padding/blank never appears as a label)
    label_length : [B] valid labels

    Returns
    -------
    [B] float32 loss
    """
    assert blank == 0, "blank is fixed to 0 (reference parity)"
    orig_dtype = logits.dtype
    if orig_dtype in (jnp.float16, jnp.bfloat16):
        logits = logits.astype(jnp.float32)

    batch, max_t, _ = logits.shape
    max_u = labels.shape[1]
    s = 2 * max_u + 1

    logit_length = jnp.maximum(jnp.asarray(logit_length, jnp.int32), jnp.asarray(label_length, jnp.int32))

    log_probs = jax.nn.log_softmax(logits, axis=-1)  # [B, T, V]
    ext = _extend_labels(labels)  # [B, S]

    # per-state emission log-probs for every frame: [B, T, S]
    lp_ext = jnp.take_along_axis(log_probs[:, :, None, :], ext[:, None, :, None].astype(jnp.int32), axis=-1)[..., 0]

    # skip transition allowed where ext[s] != blank and ext[s] != ext[s-2]
    ext_prev2 = jnp.pad(ext, ((0, 0), (2, 0)), constant_values=-1)[:, :-2]
    allow_skip = (ext != blank) & (ext != ext_prev2)  # [B, S]

    positions = jnp.arange(s)[None, :]  # [1, S]
    # valid states: s < 2*label_length+1
    state_valid = positions < (2 * jnp.asarray(label_length, jnp.int32)[:, None] + 1)

    neg = jnp.asarray(LOG_0, jnp.float32)
    alpha0 = jnp.full((batch, s), neg)
    alpha0 = alpha0.at[:, 0].set(lp_ext[:, 0, 0])
    alpha0 = alpha0.at[:, 1].set(jnp.where(jnp.asarray(label_length) > 0, lp_ext[:, 0, 1], neg))
    alpha0 = jnp.where(state_valid, alpha0, neg)

    def step(alpha, t):
        a0 = alpha
        a1 = jnp.pad(alpha, ((0, 0), (1, 0)), constant_values=LOG_0)[:, :-1]
        a2 = jnp.pad(alpha, ((0, 0), (2, 0)), constant_values=LOG_0)[:, :-2]
        a2 = jnp.where(allow_skip, a2, neg)
        m = jnp.maximum(jnp.maximum(a0, a1), a2)
        summed = m + jnp.log(jnp.exp(a0 - m) + jnp.exp(a1 - m) + jnp.exp(a2 - m))
        new_alpha = summed + lp_ext[:, t, :]
        new_alpha = jnp.where(state_valid, new_alpha, neg)
        # frames beyond logit_length leave alpha unchanged
        active = (t < jnp.asarray(logit_length, jnp.int32))[:, None]
        new_alpha = jnp.where(active, new_alpha, alpha)
        return new_alpha, None

    alpha, _ = jax.lax.scan(step, alpha0, jnp.arange(1, max_t))

    # ll = LSE(alpha[2U], alpha[2U-1]) at the final valid frame
    u2 = 2 * jnp.asarray(label_length, jnp.int32)
    last = jnp.take_along_axis(alpha, u2[:, None], axis=1)[:, 0]
    second = jnp.where(
        u2 > 0,
        jnp.take_along_axis(alpha, jnp.maximum(u2 - 1, 0)[:, None], axis=1)[:, 0],
        neg,
    )
    m = jnp.maximum(last, second)
    ll = m + jnp.log(jnp.exp(last - m) + jnp.exp(second - m))
    return -ll


def ctc_loss_mean(logits, logit_length, labels, label_length, blank: int = 0) -> jax.Array:
    """Batch-mean CTC loss (the training objective)."""
    return jnp.mean(ctc_loss(logits, logit_length, labels, label_length, blank))
