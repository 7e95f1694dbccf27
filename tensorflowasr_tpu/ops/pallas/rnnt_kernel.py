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
    """[B, T, U1] → [B, D, U1p] with out[b, d, u] = x[b, d-u, u] (else LOG_0).

    Implemented with the pad+flatten+reshape shift trick (each row of the
    transposed tensor shifts right by its row index) — NO gather ops. XLA
    gathers with [D, U1p] index arrays execute catastrophically slowly on
    this TPU stack (measured 31 s at B=4, 207 s at B=8 standalone) and blow
    up compile times when fused; the reshape formulation is plain copies.
    """
    b, t, u1 = x.shape
    u1p = _padded_lanes(u1)
    # [B, U1p, T] with NEG in the padded lanes
    y = jnp.pad(x, ((0, 0), (0, 0), (0, u1p - u1)), constant_values=NEG)
    y = jnp.swapaxes(y, 1, 2)
    # Pad rows to width W, flatten, re-window at width W-1: the flat index
    # u*(W-1) + d lands on y[u, d-u], with all out-of-range cells reading the
    # NEG padding (requires W >= t + u1p so underflows hit the previous row's
    # pad tail, and W - 1 >= num_diags so the slice below is in range).
    w = t + max(u1p, u1 + 1)
    y = jnp.pad(y, ((0, 0), (0, 0), (0, w - t)), constant_values=NEG)
    z = y.reshape(b, u1p * w)[:, : u1p * (w - 1)].reshape(b, u1p, w - 1)
    return jnp.swapaxes(z[:, :, :num_diags], 1, 2)


def _unskew(g: jax.Array, t: int, u1: int) -> jax.Array:
    """[B, D, U1p] → [B, T, U1] with out[b, t, u] = g[b, t+u, u].

    Inverse shift via the same flatten/re-window trick (rows shift LEFT by
    their row index): flat index u*(D+1) + c reads gT[u, c+u]. No gathers.
    """
    b, d_total, u1p = g.shape
    gt = jnp.swapaxes(g, 1, 2).reshape(b, u1p * d_total)  # [B, U1p*D]
    gt = jnp.pad(gt, ((0, 0), (0, u1p)))
    z = gt.reshape(b, u1p, d_total + 1)[:, :u1, :t]  # z[b, u, c] = gT[b, u, c+u]
    return jnp.swapaxes(z, 1, 2)


def _pack_shape(batch: int, d_total: int, u1p: int) -> tuple:
    """(S sublane-packed, G lane-packed) examples per kernel grid step.

    S is pinned to 1 — a measured negative result (round 5, v5e,
    scripts_dev/rnnt_dp_ab.py): stacking S=8 example-groups into the
    SUBLANE dim ([S, G·U1p] rows in dense (8,128) vregs, 8× fewer grid
    steps) ran ~25-60% SLOWER than lane-only packing at the bench shape
    across three runs (e.g. 7.4-8.6 ms lane-only vs 9.4-10.4 ms sublane,
    bs16 T=400 U=128). The DP is per-row LATENCY-bound, not vector-width
    bound, and Mosaic lowers the rank-3 rolls/slices with S>1 worse than
    the flat wide rows. Lanes-only instead packs up to G=16 examples
    side-by-side ([1, G·U1p] rows) — G=16 measured ~14% faster than G=8
    within-run (one grid step at bs16, half the sequential rows of G=8).
    Bounded by VMEM: ~9 f32 [D, G·U1p] buffer-copies (4 grid-blocked
    operands/outputs double-buffered + alpha scratch) under the 100 MB cap.
    """
    budget = 80 * 1024 * 1024
    per_example = d_total * u1p * 4 * 9
    g = 16
    while g > 1 and g * per_example > budget:
        g //= 2
    if (g * u1p) == 384:  # the bisected 384-lane axon hang bucket — never emit it
        g = 2 if g == 3 else max(1, g - 1)
    return 1, g


def _rnnt_kernel(
    logit_len_ref,  # scalar prefetch [Bp]
    label_len_ref,  # scalar prefetch [Bp]
    bl_ref,  # [1, D, S, G·U1p] skewed lp_blank (S sublane × G lane packed)
    em_ref,  # [1, D, S, G·U1p] skewed lp_emit (shifted: EM[d, u] = lp_emit[d-u, u-1])
    gbl_ref,  # out [1, D, S, G·U1p]; row D-1 is never a valid lattice diagonal
    #           and carries each example's loss at its segment's column 0
    gem2_ref,  # out [1, D, S, G·U1p] grads in EM2 coords (lp_emit[d-u, u])
    alpha_ref,  # scratch [D, S, G·U1p]
    *,
    subl: int,
    group: int,
    u1p: int,
):
    e0 = pl.program_id(0) * (subl * group)
    d_total, _, lanes = alpha_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, subl, lanes), 2)
    u_row = jax.lax.rem(lane, u1p)  # per-segment label coordinate

    # per-example lengths broadcast over each (sublane s, segment g) slot
    def bcast_len(ref):
        rows = [
            jnp.concatenate(
                [jnp.full((1, 1, u1p), ref[e0 + s * group + g], jnp.int32) for g in range(group)], axis=2
            )
            for s in range(subl)
        ]
        return jnp.concatenate(rows, axis=1)  # [1, S, lanes]

    t_len = bcast_len(logit_len_ref)
    u_len = bcast_len(label_len_ref)
    d_final = t_len - 1 + u_len  # [1, S, lanes]

    def cell_valid(d):
        t_of = d - u_row
        return (t_of >= 0) & (t_of < t_len) & (u_row <= u_len)

    # NOTE on rolls: all shifts are global over the packed lanes, and every
    # lane that would receive a value from the neighboring SEGMENT is
    # exactly a lane with u_row == 0 (shift right) or u_row == u1p-1 (shift
    # left) — which the existing boundary masks already force to NEG.

    # ------------------------------ forward ------------------------------- #
    # The previous alpha row and BL row ride the fori_loop carry (registers)
    # instead of being re-read from VMEM each iteration: the DP is per-row
    # LATENCY-bound (measured ~9 µs/row at bench shapes when every operand
    # came from a dynamic VMEM slice), so each removed load/store and the
    # unrolling matter more than vector width.
    row0 = jnp.where((u_row == 0) & cell_valid(0), 0.0, NEG)
    alpha_ref[0:1] = row0
    bl0 = bl_ref[0, 0:1]
    ll_sel = (u_row == u_len)  # exactly one lane per (s, segment) slot
    ll_acc0 = jnp.where((d_final == 0) & ll_sel, row0 + bl0, NEG)

    def fwd_body(d, carry):
        a_prev, bl_prev, ll_acc = carry
        blank_term = a_prev + bl_prev
        a_shift = pltpu.roll(a_prev, 1, 2)
        a_shift = jnp.where(u_row == 0, NEG, a_shift)
        emit_term = a_shift + em_ref[0, pl.ds(d, 1)]
        row = jnp.where(cell_valid(d), _logaddexp(blank_term, emit_term), NEG)
        alpha_ref[pl.ds(d, 1)] = row
        bl_d = bl_ref[0, pl.ds(d, 1)]
        # ll = alpha[d_final, U] + BL[d_final, U], captured as d passes by
        ll_acc = jnp.where((d == d_final) & ll_sel, row + bl_d, ll_acc)
        return row, bl_d, ll_acc

    _, _, ll_acc = jax.lax.fori_loop(1, d_total, fwd_body, (row0, bl0, ll_acc0))

    # broadcast each slot's single selected ll lane to its whole segment via
    # two tiny 0/1 matmuls (segment indicator matrices), per sublane row
    seg_of = jax.lax.broadcasted_iota(jnp.int32, (lanes, group), 0) // u1p
    col = jax.lax.broadcasted_iota(jnp.int32, (lanes, group), 1)
    gather_m = (seg_of == col).astype(jnp.float32)  # [lanes, group]
    vals = jnp.where(ll_sel, ll_acc, 0.0)[0]  # [S, lanes]
    # HIGHEST precision: the default single bf16 MXU pass rounds the f32 ll
    # values to ~8 mantissa bits (visibly wrong losses at |ll| ~ hundreds)
    seg_ll = jnp.dot(vals, gather_m, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)  # [S, group]
    scat_r = jax.lax.broadcasted_iota(jnp.int32, (group, lanes), 0)
    scat_c = jax.lax.broadcasted_iota(jnp.int32, (group, lanes), 1) // u1p
    scatter_m = (scat_r == scat_c).astype(jnp.float32)  # [group, lanes]
    ll = jnp.dot(seg_ll, scatter_m, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)[None]  # [1, S, lanes]

    # -------------------- backward + gradients (fused) -------------------- #
    # One sweep computes beta[d] AND the occupancy gradients for row d: at
    # step d both inputs of grad_body — alpha[d] and beta[d+1] — are live
    # (beta[d+1] is the carry), so a separate third D-row loop would only
    # repeat the loads. Fusing cuts the kernel's sequential row ops from
    # 3·D to 2·D, and carrying beta in registers removes the beta scratch
    # array entirely (beta rows are never needed after their grad row).
    # Static trip count (compiler-friendly); rows above d_final never exist
    # — the seed row d_final+1 = exit is selected in-carry.
    def bwd_body(i, b_next):
        d = d_total - 2 - i
        is_seed = d == d_final + 1
        above = d > d_final + 1
        bl_row = bl_ref[0, pl.ds(d, 1)]
        blank_term = bl_row + b_next
        b_next_shift = pltpu.roll(b_next, lanes - 1, 2)
        b_next_shift = jnp.where(u_row == u1p - 1, NEG, b_next_shift)
        # EM2[d, u] = EM[d+1, u+1]
        em2_row = pltpu.roll(em_ref[0, pl.ds(d + 1, 1)], lanes - 1, 2)
        em2_row = jnp.where(u_row == u1p - 1, NEG, em2_row)
        emit_term = em2_row + b_next_shift
        row = _logaddexp(blank_term, emit_term)
        row = jnp.where(cell_valid(d) & jnp.logical_not(is_seed | above), row, NEG)
        seed_row = jnp.where(u_row == u_len, 0.0, NEG)
        row = jnp.where(is_seed, seed_row, row)

        # gradients for row d (b_next already holds the exit seed when
        # d == d_final)
        a_row = alpha_ref[pl.ds(d, 1)]
        gbl = -jnp.exp(a_row + bl_row + b_next - ll)
        gem2 = -jnp.exp(a_row + em2_row + b_next_shift - ll)
        valid = cell_valid(d)
        gbl_ref[0, pl.ds(d, 1)] = jnp.where(valid, gbl, 0.0)
        gem2_ref[0, pl.ds(d, 1)] = jnp.where(valid, gem2, 0.0)
        return row

    # top row: the exit seed for examples whose d_final+1 == D-1
    top_is_seed = d_final + 1 == d_total - 1
    top_row = jnp.where(top_is_seed & (u_row == u_len), 0.0, NEG)
    jax.lax.fori_loop(0, d_total - 1, bwd_body, top_row)
    # last row (never a valid diagonal: d_final <= D-2) carries the losses
    loss_row = jnp.where(u_row == 0, -ll, 0.0)
    gbl_ref[0, pl.ds(d_total - 1, 1)] = loss_row
    gem2_ref[0, pl.ds(d_total - 1, 1)] = jnp.zeros((1, subl, lanes), jnp.float32)


def _pack_grid(x: jax.Array, subl: int, group: int) -> jax.Array:
    """[Bp, D, U1p] → [Bp/(S·G), D, S, G·U1p]; example e ↦ grid step
    e//(S·G), sublane (e%(S·G))//G, lane segment e%G."""
    bp, d_total, u1p = x.shape
    e = subl * group
    x = x.reshape(bp // e, subl, group, d_total, u1p)
    x = jnp.transpose(x, (0, 3, 1, 2, 4))
    return x.reshape(bp // e, d_total, subl, group * u1p)


def _unpack_grid(x: jax.Array, subl: int, group: int, u1p: int) -> jax.Array:
    """[Bp/(S·G), D, S, G·U1p] → [Bp, D, U1p]."""
    nstep, d_total, _, _ = x.shape
    x = x.reshape(nstep, d_total, subl, group, u1p)
    x = jnp.transpose(x, (0, 2, 3, 1, 4))
    return x.reshape(nstep * subl * group, d_total, u1p)


def _rnnt_pallas_call(bl_skew, em_skew, logit_length, label_length, interpret: bool):
    batch, d_total, u1p = bl_skew.shape
    subl, group = _pack_shape(batch, d_total, u1p)
    e = subl * group
    bp = round_up(batch, e)
    if bp != batch:
        # padded examples: trivial 1-frame/0-label lattices, sliced off after
        pad = ((0, bp - batch), (0, 0), (0, 0))
        bl_skew = jnp.pad(bl_skew, pad, constant_values=NEG)
        em_skew = jnp.pad(em_skew, pad, constant_values=NEG)
        logit_length = jnp.pad(jnp.asarray(logit_length, jnp.int32), (0, bp - batch), constant_values=1)
        label_length = jnp.pad(jnp.asarray(label_length, jnp.int32), (0, bp - batch))

    bl_p = _pack_grid(bl_skew, subl, group)
    em_p = _pack_grid(em_skew, subl, group)
    lanes = group * u1p
    nstep = bp // e

    spec = pl.BlockSpec((1, d_total, subl, lanes), lambda b, *_: (b, 0, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nstep,),
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        scratch_shapes=[
            pltpu.VMEM((d_total, subl, lanes), jnp.float32),  # alpha (beta rides the loop carry)
        ],
    )
    gbl_p, gem2_p = pl.pallas_call(
        functools.partial(_rnnt_kernel, subl=subl, group=group, u1p=u1p),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nstep, d_total, subl, lanes), jnp.float32),
            jax.ShapeDtypeStruct((nstep, d_total, subl, lanes), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(logit_length, jnp.int32), jnp.asarray(label_length, jnp.int32), bl_p, em_p)
    gbl = _unpack_grid(gbl_p, subl, group, u1p)[:batch]
    gem2 = _unpack_grid(gem2_p, subl, group, u1p)[:batch]
    return gbl, gem2


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


# --------------------------------------------------------------------------- #
# Flattened row-block kernels over the [B*T*U1, V] view of the joint logits.
#
# Everything [B,T,U1,V]-shaped is done HERE, in two tiny Pallas kernels, and
# never as XLA 4-D broadcast arithmetic: the remote TPU compiler takes minutes
# (B=4: 121 s) and then times out/faults at B>=8 on the equivalent fused XLA
# elementwise program, while these kernels compile in seconds at any batch.
# --------------------------------------------------------------------------- #


def _row_block(vp: int) -> int:
    """Rows per grid step: ~2M f32 elements of VMEM per buffer, 8..1024."""
    return max(8, min(1024, (1 << 21) // max(vp, 1) // 8 * 8))


def _padded_vocab(v: int) -> int:
    vp = round_up(v, 128)
    return 512 if vp == 384 else vp  # same 384-lane hang avoidance as lanes


def _logprob_kernel(x_ref, lab_ref, lpb_ref, lpe_ref, lse_ref):
    x = x_ref[...].astype(jnp.float32)  # [BLK, Vp]; V-padding holds NEG
    m = jnp.max(x, axis=1, keepdims=True)
    lse = m + jnp.log(jnp.sum(jnp.exp(x - m), axis=1, keepdims=True))
    lab = lab_ref[...]  # [BLK, 1] int32; -1 marks the u == U column
    v_iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    sel = jnp.sum(jnp.where(v_iota == lab, x, 0.0), axis=1, keepdims=True)
    lse_ref[...] = lse
    lpb_ref[...] = x[:, 0:1] - lse
    lpe_ref[...] = jnp.where(lab >= 0, sel - lse, NEG)


def _dlogits_kernel(x_ref, lse_ref, gbl_ref, gem_ref, lab_ref, gs_ref, out_ref):
    x = x_ref[...].astype(jnp.float32)
    lse = lse_ref[...]  # [BLK, 1]
    gbl = gbl_ref[...]
    gem = gem_ref[...]
    lab = lab_ref[...]
    gs = gs_ref[...]
    v_iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    softmax = jnp.exp(x - lse)
    d = (
        jnp.where(v_iota == 0, gbl, 0.0)
        + jnp.where(v_iota == lab, gem, 0.0)
        - softmax * (gbl + gem)
    )
    out_ref[...] = (d * gs).astype(out_ref.dtype)


def _rows_view(logits, labels):
    """[B,T,U1,V] logits → ([Rp, Vp] padded 2-D view, [Rp, 1] label ids, meta).

    The flatten of the three major dims is layout-free; only the V pad and a
    row pad to the block size copy. Label column u holds labels[b, u] for
    u < U and -1 for the final (emit-impossible) column.
    """
    b, t, u1, v = logits.shape
    vp = _padded_vocab(v)
    rows = b * t * u1
    blk = _row_block(vp)
    rp = round_up(rows, blk)
    x2 = logits.reshape(rows, v)
    x2 = jnp.pad(x2, ((0, rp - rows), (0, vp - v)), constant_values=NEG)
    lab_col = jnp.pad(labels.astype(jnp.int32), ((0, 0), (0, 1)), constant_values=-1)  # [B, U1]
    lab_rows = jnp.broadcast_to(lab_col[:, None, :], (b, t, u1)).reshape(rows, 1)
    lab_rows = jnp.pad(lab_rows, ((0, rp - rows), (0, 0)), constant_values=-1)
    return x2, lab_rows, (rows, rp, vp, blk)


def _logits_to_logprobs(logits, labels, interpret):
    """logits [B,T,U1,V] → (lp_blank [B,T,U1], lp_emit [B,T,U1], lse [B,T,U1]).

    One row-block Pallas pass; lp_emit[..., U] = LOG_0 (no emit past the last
    label), matching the lattice convention of the DP kernel.
    """
    b, t, u1, v = logits.shape
    x2, lab_rows, (rows, rp, vp, blk) = _rows_view(logits, labels)
    col = pl.BlockSpec((blk, 1), lambda r: (r, 0))
    lpb, lpe, lse = pl.pallas_call(
        _logprob_kernel,
        grid=(rp // blk,),
        in_specs=[pl.BlockSpec((blk, vp), lambda r: (r, 0)), col],
        out_specs=[col, col, col],
        out_shape=[jax.ShapeDtypeStruct((rp, 1), jnp.float32)] * 3,
        interpret=interpret,
    )(x2, lab_rows)
    shape = (b, t, u1)
    return (
        lpb[:rows, 0].reshape(shape),
        lpe[:rows, 0].reshape(shape),
        lse[:rows, 0].reshape(shape),
    )


def _dlogits_assemble(logits, lse, gbl, gem, labels, g, interpret):
    """Dense d loss / d logits [B,T,U1,V] from the occupancy grads, in one
    row-block Pallas pass (chain rule through lp = selected_logit − lse):
      d logits[v] = 1[v=0]·gbl + 1[v=lab]·gem − softmax[v]·(gbl+gem)
    scaled by the upstream cotangent g[b]."""
    b, t, u1, v = logits.shape
    x2, lab_rows, (rows, rp, vp, blk) = _rows_view(logits, labels)

    def rows_of(a):  # [B,T,U1] f32 → [Rp, 1]
        r = a.astype(jnp.float32).reshape(rows, 1)
        return jnp.pad(r, ((0, rp - rows), (0, 0)))

    gs = jnp.broadcast_to(g.astype(jnp.float32)[:, None, None], (b, t, u1))
    col = pl.BlockSpec((blk, 1), lambda r: (r, 0))
    out = pl.pallas_call(
        _dlogits_kernel,
        grid=(rp // blk,),
        in_specs=[pl.BlockSpec((blk, vp), lambda r: (r, 0)), col, col, col, col, col],
        out_specs=pl.BlockSpec((blk, vp), lambda r: (r, 0)),
        out_shape=jax.ShapeDtypeStruct((rp, vp), logits.dtype),
        interpret=interpret,
    )(x2, rows_of(lse), rows_of(gbl), rows_of(gem), lab_rows, rows_of(gs))
    return out[:rows, :v].reshape(b, t, u1, v)


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
    interpret = interpret or jax.default_backend() == "cpu"
    lp_blank, lp_emit, lse = _logits_to_logprobs(logits, labels, interpret)
    loss, gbl_skew, gem2_skew = _rnnt_forward(lp_blank, lp_emit, logit_length, label_length, interpret)
    t, u1 = lp_blank.shape[1], lp_blank.shape[2]
    gbl = _unskew(gbl_skew, t, u1)  # dL/d lp_blank  [B,T,U1]
    gem = _unskew(gem2_skew, t, u1)  # dL/d lp_emit  [B,T,U1] (EM2 coords = natural)
    return loss, (logits, lse, gbl, gem)


def _rnnt_logits_fwd(logits, logit_length, labels, label_length, blank, interpret):
    assert blank == 0
    # residuals keep the logits in their ORIGINAL dtype (bf16 halves the
    # dominant [B,T,U1,V] residual); the bwd kernel upcasts per block
    loss, (_, lse, gbl, gem) = _rnnt_logits_fwd_impl(logits, logit_length, labels, label_length, interpret)
    return loss, (logits, lse, gbl, gem, labels)


def _rnnt_logits_bwd(blank, interpret, residuals, g):
    logits, lse, gbl, gem, labels = residuals
    interpret = interpret or jax.default_backend() == "cpu"
    d = _dlogits_assemble(logits, lse, gbl, gem, labels, g, interpret)
    return d, None, None, None


rnnt_loss_pallas.defvjp(_rnnt_logits_fwd, _rnnt_logits_bwd)


def rnnt_loss_pallas_mean(logits, logit_length, labels, label_length, blank: int = 0, interpret: bool = False):
    return jnp.mean(rnnt_loss_pallas(logits, logit_length, labels, label_length, blank, interpret))
