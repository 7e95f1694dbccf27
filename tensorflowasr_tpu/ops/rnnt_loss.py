"""RNN-T (transducer) loss: anti-diagonal wavefront DP in log space.

Functional replacement for the reference's RNN-T stack — the pure-TF
diagonal ``tf.scan`` implementation (``tensorflow_asr/losses/impl/rnnt.py:81-178``)
and the external warp-transducer C++/CUDA op
(``scripts/install_rnnt_loss.sh``). A single ``lax.scan`` over the T+U
anti-diagonals computes alpha; cells on a diagonal are independent so each
step is fully vectorized on the VPU. XLA autodiff through the scan yields
the analytic gradient (equivalent to the beta recursion + occupancy formula).

Conventions (reference parity):
  - blank index is 0
  - ``logits`` are the joint outputs [B, T, U+1, V] (U = label count)
  - bf16/f16 logits are cast to f32 for the DP (impl/rnnt.py:281-331)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tensorflowasr_tpu.utils.math_util import LOG_0


def rnnt_loss(
    logits: jax.Array,
    logit_length: jax.Array,
    labels: jax.Array,
    label_length: jax.Array,
    blank: int = 0,
) -> jax.Array:
    """Negative log-likelihood per example.

    Parameters
    ----------
    logits : [B, T, U+1, V] joint network outputs
    logit_length : [B] valid encoder frames
    labels : [B, U] int labels
    label_length : [B] valid labels

    Returns
    -------
    [B] float32 loss
    """
    assert blank == 0, "blank is fixed to 0 (reference parity)"
    orig_dtype = logits.dtype
    if orig_dtype in (jnp.float16, jnp.bfloat16):
        logits = logits.astype(jnp.float32)

    batch, max_t, u1, _ = logits.shape
    max_u = u1 - 1
    assert labels.shape[1] == max_u, f"labels U={labels.shape[1]} must equal logits U+1-1={max_u}"

    logit_length = jnp.asarray(logit_length, jnp.int32)
    label_length = jnp.asarray(label_length, jnp.int32)

    log_probs = jax.nn.log_softmax(logits, axis=-1)  # [B, T, U+1, V]
    lp_blank = log_probs[..., blank]  # [B, T, U+1]
    # emission prob of label y[u] at (t, u): gather over V
    lp_emit = jnp.take_along_axis(
        log_probs[:, :, :max_u, :], labels[:, None, :, None].astype(jnp.int32), axis=-1
    )[..., 0]  # [B, T, U]
    # pad emit at u = U (no label to emit there)
    lp_emit = jnp.pad(lp_emit, ((0, 0), (0, 0), (0, 1)), constant_values=LOG_0)  # [B, T, U+1]

    neg = jnp.asarray(LOG_0, jnp.float32)
    u_idx = jnp.arange(u1)  # [U+1]

    # Diagonal coordinates: A_d[u] = alpha[t = d - u, u].
    # alpha[t,u] = LSE(alpha[t-1,u] + blank[t-1,u], alpha[t,u-1] + emit[t,u-1])
    # → A_d[u] = LSE(A_{d-1}[u] + blank[d-1-u, u], A_{d-1}[u-1] + emit[d-u, u-1])
    def gather_t(mat, t_per_u):
        """mat: [B, T, U+1], t_per_u: [U+1] → [B, U+1] taking mat[:, t(u), u]."""
        t_safe = jnp.clip(t_per_u, 0, max_t - 1)
        return jnp.take_along_axis(mat, t_safe[None, None, :], axis=1)[:, 0, :]

    # emit term needs lp_emit at (t, u-1): shift the label axis BEFORE the
    # diagonal gather so column u of the shifted tensor holds emit[(·), u-1]
    lp_emit_shift = jnp.pad(lp_emit, ((0, 0), (0, 0), (1, 0)), constant_values=LOG_0)[:, :, :-1]

    alpha0 = jnp.full((batch, u1), neg).at[:, 0].set(0.0)  # alpha[0,0] = 0

    def step(alpha, d):
        t_for_blank = d - 1 - u_idx  # source cell (t-1, u) with t-1 = d-1-u
        t_for_emit = d - u_idx  # target cell t = d-u; emit source is (t, u-1)
        blank_term = alpha + gather_t(lp_blank, t_for_blank)
        blank_term = jnp.where((t_for_blank >= 0)[None, :] & (t_for_blank[None, :] < logit_length[:, None]), blank_term, neg)

        alpha_shift = jnp.pad(alpha, ((0, 0), (1, 0)), constant_values=LOG_0)[:, :-1]
        emit_prev = gather_t(lp_emit_shift, t_for_emit)  # emit[(t, u-1)] at column u
        # emit source at u-1 must be a valid label position: u-1 < label_length
        emit_term = alpha_shift + emit_prev
        emit_valid = (u_idx >= 1)[None, :] & ((u_idx - 1)[None, :] < label_length[:, None]) & ((t_for_emit >= 0)[None, :]) & (
            t_for_emit[None, :] < logit_length[:, None]
        )
        emit_term = jnp.where(emit_valid, emit_term, neg)

        m = jnp.maximum(blank_term, emit_term)
        new_alpha = m + jnp.log(jnp.exp(blank_term - m) + jnp.exp(emit_term - m))
        # cells not on any valid lattice point keep LOG_0; cell (0,0) on d=0 only
        cell_valid = (t_for_emit >= 0)[None, :] & (t_for_emit[None, :] < logit_length[:, None]) & (u_idx[None, :] <= label_length[:, None])
        new_alpha = jnp.where(cell_valid, new_alpha, neg)
        return new_alpha, new_alpha

    num_diags = max_t + max_u  # d runs 1 .. T-1+U
    _, alphas = jax.lax.scan(step, alpha0, jnp.arange(1, num_diags))
    alphas = jnp.concatenate([alpha0[None], alphas], axis=0)  # [D, B, U+1]

    # ll = alpha[T_b - 1, U_b] + blank[T_b - 1, U_b]
    final_d = logit_length - 1 + label_length  # [B]
    final_alpha = alphas[final_d, jnp.arange(batch), label_length]  # [B]
    final_blank = lp_blank[jnp.arange(batch), logit_length - 1, label_length]
    return -(final_alpha + final_blank)


def rnnt_loss_mean(logits, logit_length, labels, label_length, blank: int = 0) -> jax.Array:
    return jnp.mean(rnnt_loss(logits, logit_length, labels, label_length, blank))
