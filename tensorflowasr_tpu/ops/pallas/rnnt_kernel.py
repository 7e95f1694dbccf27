"""Pallas RNN-T loss: single-kernel anti-diagonal forward-backward.

Replaces the reference's external warp-transducer CUDA op and the pure-TF
diagonal tf.scan (``losses/impl/rnnt.py:81-278``) with one TPU kernel per
batch row: alpha and beta matrices live in VMEM in *skewed* coordinates
(``A[d, u] = alpha[t=d-u, u]``) so every diagonal update is a fully
vectorized row operation on the VPU — no XLA scan dispatch per diagonal,
no HBM traffic for intermediates. Gradients are the standard occupancy
products computed in the same kernel.

Skewed-coordinate recurrences (d indexes anti-diagonals, D = T+U+1 rows):
  forward:  A[d, u] = LSE(A[d-1, u] + BL[d-1, u],  A[d-1, u-1] + EM[d, u])
  backward: B[d, u] = LSE(BL[d, u] + B[d+1, u],    EM2[d, u] + B[d+1, u+1])
where BL[d, u] = lp_blank[d-u, u], EM[d, u] = lp_emit[d-u, u-1],
EM2[d, u] = lp_emit[d-u, u] = EM[d+1, u+1], and B is seeded with
B[T-1+U+1, U] = 0 (the exit after the final blank).

Gradients (loss = -ll):
  d lp_blank[t, u] = -exp(A[d, u] + BL[d, u] + B[d+1, u]   - ll)
  d lp_emit [t, u] = -exp(A[d, u] + EM2[d, u] + B[d+1, u+1] - ll)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tensorflowasr_tpu.utils.math_util import LOG_0, round_up

NEG = float(LOG_0)  # plain python float: avoids captured traced constants in the kernel


def _logaddexp(a, b):
    m = jnp.maximum(a, b)
    return m + jnp.log1p(jnp.exp(-jnp.abs(a - b)))


def _padded_lanes(u1: int) -> int:
    """Lane-padded width of the skewed U dimension.

    128-multiples, EXCEPT 384: on the axon TPU stack, kernels whose minor
    dim is exactly 384 lanes (3 tiles) hang at runtime once the grid has
    >1 step and D is large (bisected in scripts_dev/rnnt_bisect.py —
    128/256/512/640 all pass at the same D and batch). Rounding the 384
    bucket up to 512 costs 33% more VPU work on that bucket and nothing
    else; every u <= u_len guard in the kernel already masks the padding.
    """
    u1p = round_up(u1, 128)
    return 512 if u1p == 384 else u1p


def _skew(x: jax.Array, num_diags: int) -> jax.Array:
    """[B, T, U1] → [B, D, U1p] with out[b, d, u] = x[b, d-u, u] (else LOG_0)."""
    b, t, u1 = x.shape
    u1p = _padded_lanes(u1)
    d_idx = jnp.arange(num_diags)[:, None]
    u_idx = jnp.arange(u1p)[None, :]
    t_idx = d_idx - u_idx  # [D, U1p]
    valid = (t_idx >= 0) & (t_idx < t) & (u_idx < u1)
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, u1p - u1)), constant_values=LOG_0)
    gathered = xp[:, jnp.clip(t_idx, 0, t - 1), jnp.minimum(u_idx, u1p - 1)]
    return jnp.where(valid[None], gathered, NEG)


def _unskew(g: jax.Array, t: int, u1: int) -> jax.Array:
    """[B, D, U1p] → [B, T, U1] with out[b, t, u] = g[b, t+u, u]."""
    t_idx = jnp.arange(t)[:, None]
    u_idx = jnp.arange(u1)[None, :]
    return g[:, t_idx + u_idx, u_idx]


def _rnnt_kernel(
    logit_len_ref,  # scalar prefetch [B]
    label_len_ref,  # scalar prefetch [B]
    bl_ref,  # [1, D, U1p] skewed lp_blank
    em_ref,  # [1, D, U1p] skewed lp_emit (shifted: EM[d, u] = lp_emit[d-u, u-1])
    gbl_ref,  # out [1, D, U1p]; row D-1 is never a valid lattice diagonal and
    #           carries the scalar loss at column 0 (TPU blocks can't be 1x1)
    gem2_ref,  # out [1, D, U1p] grads in EM2 coords (lp_emit[d-u, u])
    alpha_ref,  # scratch [D, U1p]
    beta_ref,  # scratch [D, U1p]
):
    b = pl.program_id(0)
    t_len = logit_len_ref[b]
    u_len = label_len_ref[b]
    d_final = t_len - 1 + u_len

    d_total, u1p = alpha_ref.shape
    u_row = jax.lax.broadcasted_iota(jnp.int32, (1, u1p), 1)

    def cell_valid(d):
        t_of = d - u_row
        return (t_of >= 0) & (t_of < t_len) & (u_row <= u_len)

    # ------------------------------ forward ------------------------------- #
    alpha_ref[0:1, :] = jnp.where(u_row == 0, 0.0, NEG)

    def fwd_body(d, _):
        a_prev = alpha_ref[pl.ds(d - 1, 1), :]
        blank_term = a_prev + bl_ref[0, pl.ds(d - 1, 1), :]
        a_shift = pltpu.roll(a_prev, 1, 1)
        a_shift = jnp.where(u_row == 0, NEG, a_shift)
        emit_term = a_shift + em_ref[0, pl.ds(d, 1), :]
        row = _logaddexp(blank_term, emit_term)
        alpha_ref[pl.ds(d, 1), :] = jnp.where(cell_valid(d), row, NEG)
        return 0

    jax.lax.fori_loop(1, d_total, fwd_body, 0)

    # ll = alpha[d_final, U] + lp_blank[T-1, U] (= BL[d_final, U])
    final_mask = u_row == u_len  # (1, U1p) — keep everything 2D for TPU
    a_final = alpha_ref[pl.ds(d_final, 1), :]
    bl_final = bl_ref[0, pl.ds(d_final, 1), :]
    ll = jnp.max(jnp.where(final_mask, a_final + bl_final, NEG))

    # ------------------------------ backward ------------------------------ #
    # static trip count (compiler-friendly); rows above d_final are written
    # as NEG (except the seed row d_final+1 = exit), so no clear pass needed
    def bwd_body(i, _):
        d = d_total - 2 - i
        is_seed = d == d_final + 1
        above = d > d_final + 1
        b_next = beta_ref[pl.ds(d + 1, 1), :]
        blank_term = bl_ref[0, pl.ds(d, 1), :] + b_next
        b_next_shift = pltpu.roll(b_next, u1p - 1, 1)
        b_next_shift = jnp.where(u_row == u1p - 1, NEG, b_next_shift)
        # EM2[d, u] = EM[d+1, u+1]
        em2_row = pltpu.roll(em_ref[0, pl.ds(d + 1, 1), :], u1p - 1, 1)
        em2_row = jnp.where(u_row == u1p - 1, NEG, em2_row)
        emit_term = em2_row + b_next_shift
        row = _logaddexp(blank_term, emit_term)
        row = jnp.where(cell_valid(d) & jnp.logical_not(is_seed | above), row, NEG)
        seed_row = jnp.where(u_row == u_len, 0.0, NEG)
        row = jnp.where(is_seed, seed_row, row)
        beta_ref[pl.ds(d, 1), :] = row
        return 0

    # top row: the exit seed when this element is full-length (d_final+1 == D-1)
    top_is_seed = d_final + 1 == d_total - 1
    top_row = jnp.where(top_is_seed & (u_row == u_len), 0.0, NEG)
    beta_ref[pl.ds(d_total - 1, 1), :] = top_row
    jax.lax.fori_loop(0, d_total - 1, bwd_body, 0)

    # ------------------------------ gradients ----------------------------- #
    def grad_body(d, _):
        a_row = alpha_ref[pl.ds(d, 1), :]
        b_next = beta_ref[pl.ds(d + 1, 1), :]
        # seed row for d == d_final: beta_ref[d_final+1] already holds the exit
        gbl = -jnp.exp(a_row + bl_ref[0, pl.ds(d, 1), :] + b_next - ll)
        b_next_shift = pltpu.roll(b_next, u1p - 1, 1)
        b_next_shift = jnp.where(u_row == u1p - 1, NEG, b_next_shift)
        em2_row = pltpu.roll(em_ref[0, pl.ds(d + 1, 1), :], u1p - 1, 1)
        em2_row = jnp.where(u_row == u1p - 1, NEG, em2_row)
        gem2 = -jnp.exp(a_row + em2_row + b_next_shift - ll)
        valid = cell_valid(d)
        gbl_ref[0, pl.ds(d, 1), :] = jnp.where(valid, gbl, 0.0)
        gem2_ref[0, pl.ds(d, 1), :] = jnp.where(valid, gem2, 0.0)
        return 0

    jax.lax.fori_loop(0, d_total - 1, grad_body, 0)
    # last row (never a valid diagonal: d_final <= D-2) carries the loss
    loss_row = jnp.where(u_row == 0, -ll, 0.0)
    gbl_ref[0, pl.ds(d_total - 1, 1), :] = loss_row
    gem2_ref[0, pl.ds(d_total - 1, 1), :] = jnp.zeros((1, u1p), jnp.float32)


def _rnnt_pallas_call(bl_skew, em_skew, logit_length, label_length, interpret: bool):
    batch, d_total, u1p = bl_skew.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((1, d_total, u1p), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, d_total, u1p), lambda b, *_: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, d_total, u1p), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, d_total, u1p), lambda b, *_: (b, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((d_total, u1p), jnp.float32),
            pltpu.VMEM((d_total, u1p), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _rnnt_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((batch, d_total, u1p), jnp.float32),
            jax.ShapeDtypeStruct((batch, d_total, u1p), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.asarray(logit_length, jnp.int32), jnp.asarray(label_length, jnp.int32), bl_skew, em_skew)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def rnnt_loss_from_logprobs(lp_blank, lp_emit, logit_length, label_length, interpret=False):
    loss, _, _ = _rnnt_forward(lp_blank, lp_emit, logit_length, label_length, interpret)
    return loss


def _rnnt_forward(lp_blank, lp_emit, logit_length, label_length, interpret):
    interpret = interpret or jax.default_backend() == "cpu"  # Pallas TPU kernels need interpret mode off-TPU
    b, t, u1 = lp_blank.shape
    d_total = t + u1  # diagonals 0..T-1+U, plus the seed row at d_final+1
    bl_skew = _skew(lp_blank.astype(jnp.float32), d_total)
    # EM[d, u] = lp_emit[d-u, u-1]: skew the column-shifted tensor
    lp_emit_shifted = jnp.pad(lp_emit.astype(jnp.float32), ((0, 0), (0, 0), (1, 0)), constant_values=LOG_0)[:, :, :-1]
    em_skew = _skew(lp_emit_shifted, d_total)
    gbl_skew, gem2_skew = _rnnt_pallas_call(bl_skew, em_skew, logit_length, label_length, interpret)
    loss = gbl_skew[:, -1, 0]  # stashed by the kernel in the unused last row
    return loss, gbl_skew, gem2_skew


def _rnnt_fwd(lp_blank, lp_emit, logit_length, label_length, interpret):
    b, t, u1 = lp_blank.shape
    loss, gbl_skew, gem2_skew = _rnnt_forward(lp_blank, lp_emit, logit_length, label_length, interpret)
    return loss, (gbl_skew, gem2_skew, t, u1)

def _rnnt_bwd(interpret, residuals, g):
    gbl_skew, gem2_skew, t, u1 = residuals
    gbl = _unskew(gbl_skew, t, u1)
    gem2 = _unskew(gem2_skew, t, u1)  # EM2 coords == natural (t, u) coords
    scale = g[:, None, None]
    return gbl * scale, gem2 * scale, None, None


rnnt_loss_from_logprobs.defvjp(_rnnt_fwd, _rnnt_bwd)


def _logits_to_logprobs(logits, labels):
    """logits [B,T,U1,V] → (lp_blank [B,T,U1], lp_emit [B,T,U1], lse [B,T,U1])."""
    max_u = logits.shape[2] - 1
    vocab = logits.shape[-1]
    lse = jax.nn.logsumexp(logits, axis=-1)  # [B,T,U1]
    lp_blank = logits[..., 0] - lse
    onehot = jax.nn.one_hot(labels.astype(jnp.int32), vocab, dtype=logits.dtype)  # [B, U, V]
    # explicit multiply+reduce along the minor (V) axis; take_along_axis or
    # einsum here makes XLA pick a batch-minor layout with 32x padding on TPU
    sel = jnp.sum(logits[:, :, :max_u, :] * onehot[:, None, :, :], axis=-1)
    lp_emit = jnp.pad(sel - lse[:, :, :max_u], ((0, 0), (0, 0), (0, 1)), constant_values=LOG_0)
    return lp_blank, lp_emit, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def rnnt_loss_pallas(
    logits: jax.Array,
    logit_length: jax.Array,
    labels: jax.Array,
    label_length: jax.Array,
    blank: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in replacement for ``ops.rnnt_loss.rnnt_loss``: the Pallas
    forward-backward kernel computes loss + occupancy gradients; the dense
    d/d logits is assembled by a hand-written VJP (all ops V-minor — XLA's
    autodiff scatter/dot here picks catastrophic batch-minor layouts)."""
    loss, _ = _rnnt_logits_fwd_impl(logits, logit_length, labels, label_length, interpret)
    return loss


def _rnnt_logits_fwd_impl(logits, logit_length, labels, label_length, interpret):
    if logits.dtype in (jnp.float16, jnp.bfloat16):
        logits = logits.astype(jnp.float32)
    lp_blank, lp_emit, lse = _logits_to_logprobs(logits, labels)
    loss, gbl_skew, gem2_skew = _rnnt_forward(lp_blank, lp_emit, logit_length, label_length, interpret)
    t, u1 = lp_blank.shape[1], lp_blank.shape[2]
    gbl = _unskew(gbl_skew, t, u1)  # dL/d lp_blank  [B,T,U1]
    gem = _unskew(gem2_skew, t, u1)  # dL/d lp_emit  [B,T,U1] (EM2 coords = natural)
    return loss, (logits, lse, gbl, gem)


def _rnnt_logits_fwd(logits, logit_length, labels, label_length, blank, interpret):
    assert blank == 0
    loss, (_, lse, gbl, gem) = _rnnt_logits_fwd_impl(logits, logit_length, labels, label_length, interpret)
    return loss, (logits, lse, gbl, gem, labels)


def _rnnt_logits_bwd(blank, interpret, residuals, g):
    logits, lse, gbl, gem, labels = residuals
    # keep the dense-gradient assembly in its own fusion island: fusing it
    # with the pallas-call producers crashes the TPU backend at large T/U
    logits, lse, gbl, gem = jax.lax.optimization_barrier((logits, lse, gbl, gem))
    logits32 = logits.astype(jnp.float32)
    vocab = logits32.shape[-1]
    max_u = logits32.shape[2] - 1
    # chain rule through lp = selected_logit - lse:
    #   d logits[v] = onehot_sel[v]·g_lp − softmax[v]·g_lp
    softmax = jnp.exp(logits32 - lse[..., None])  # [B,T,U1,V]
    gsum = gbl + gem  # [B,T,U1]
    # pure broadcast arithmetic — .at[].add scatters here trigger the same
    # pathological batch-minor layouts in XLA as take_along_axis
    onehot_blank = jax.nn.one_hot(jnp.zeros((), jnp.int32), vocab, dtype=logits32.dtype)  # [V]
    onehot = jax.nn.one_hot(labels.astype(jnp.int32), vocab, dtype=logits32.dtype)  # [B,U,V]
    onehot_u1 = jnp.pad(onehot, ((0, 0), (0, 1), (0, 0)))  # [B,U1,V]; gem[:, :, U] == 0
    d = (
        gbl[..., None] * onehot_blank[None, None, None, :]
        + gem[..., None] * onehot_u1[:, None, :, :]
        - softmax * gsum[..., None]
    )
    d = d * g[:, None, None, None]
    return d.astype(logits.dtype), None, None, None


rnnt_loss_pallas.defvjp(_rnnt_logits_fwd, _rnnt_logits_bwd)


def rnnt_loss_pallas_mean(logits, logit_length, labels, label_length, blank: int = 0, interpret: bool = False):
    return jnp.mean(rnnt_loss_pallas(logits, logit_length, labels, label_length, blank, interpret))
