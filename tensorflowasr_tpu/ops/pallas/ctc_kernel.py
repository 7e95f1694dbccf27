"""Pallas CTC loss: single-kernel forward-backward on the extended lattice.

Replaces the reference's external warp-ctc CUDA op and the pure-TF TPU
implementation (``losses/impl/ctc_tpu.py``) with one TPU kernel per batch
row: alpha/beta over the blank-interleaved state sequence live in VMEM,
each time step is one vectorized row update over the S = 2U+1 states
(lanes), and the state-occupancy gradients come out of the same kernel.

Lattice recurrences (s indexes extended states b,y1,b,y2,...,b):
  alpha[t, s] = lp[t, s] + LSE(alpha[t-1, s], alpha[t-1, s-1],
                               alpha[t-1, s-2] + skip_ok[s])
  beta[t, s]  = LSE(beta[t+1, s] + lp[t+1, s], beta[t+1, s+1] + lp[t+1, s+1],
                    beta[t+1, s+2] + lp[t+1, s+2] + skip_ok[s+2])
  ll = LSE(alpha[T-1, 2U], alpha[T-1, 2U-1])
  dL/d lp[t, s] = -exp(alpha[t, s] + beta[t, s] - ll)

The chain to dense logits gradients (softmax − occupancy) is a hand-written
VJP with V-minor broadcast arithmetic (see rnnt_kernel.py for why).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tensorflowasr_tpu.utils.math_util import LOG_0, round_up

NEG = float(LOG_0)


def _lse3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    return m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m) + jnp.exp(c - m))


def _ctc_kernel(
    logit_len_ref,  # scalar prefetch [Bp]
    label_len_ref,  # scalar prefetch [Bp]
    lp_ref,  # [1, T, S, G·Sp] per-state log-probs (S sublane × G lane packed)
    skip_ref,  # [1, 1, S, G·Sp] skip addend (0 allowed / NEG forbidden)
    occ_ref,  # out [1, T+1, S, G·Sp]: -occupancy grads; row T stashes each
    #           example's loss at its segment's column 0
    alpha_ref,  # scratch [T, S, G·Sp] (beta rides the loop carry)
    *,
    subl: int,
    group: int,
    sp: int,
):
    e0 = pl.program_id(0) * (subl * group)
    t_total, _, lanes = alpha_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, subl, lanes), 2)
    s_row = jax.lax.rem(lane, sp)  # per-segment extended-state coordinate

    # per-example lengths broadcast over each (sublane s, segment g) slot
    def bcast_len(ref):
        rows = [
            jnp.concatenate([jnp.full((1, 1, sp), ref[e0 + s * group + g], jnp.int32) for g in range(group)], axis=2)
            for s in range(subl)
        ]
        return jnp.concatenate(rows, axis=1)  # [1, S, lanes]

    t_len = bcast_len(logit_len_ref)
    u_len = bcast_len(label_len_ref)
    s_last = 2 * u_len  # index of the final blank state, per segment

    state_ok = s_row <= s_last
    skip_row = skip_ref[0, 0:1]

    # all rolls are global over the packed lanes (per sublane row); lanes
    # receiving values from a neighboring segment are exactly the s_row < k /
    # s_row >= sp-k boundary lanes, which the masks below already force to NEG
    def shift1(x):
        y = pltpu.roll(x, 1, 2)
        return jnp.where(s_row == 0, NEG, y)

    def shift2(x):
        y = pltpu.roll(x, 2, 2)
        return jnp.where(s_row < 2, NEG, y)

    fin_mask = (s_row == s_last) | ((s_row == s_last - 1) & (s_last > 0))

    # ------------------------------ forward ------------------------------- #
    # The previous alpha row rides the fori_loop carry (registers) instead
    # of being re-read from VMEM each iteration — the DP is per-row
    # latency-bound (see rnnt_kernel._pack_shape).
    init = jnp.where(s_row < 2, lp_ref[0, 0:1], NEG)
    init = jnp.where(state_ok, init, NEG)
    alpha_ref[0:1] = init
    # final-row alpha values are captured in-loop (each segment has its own
    # t_len, so no single post-loop row read works)
    fin0 = jnp.where((t_len == 1) & fin_mask, init, NEG)

    def fwd_body(t, carry):
        a_prev, fin_acc = carry
        row = _lse3(a_prev, shift1(a_prev), shift2(a_prev) + skip_row) + lp_ref[0, pl.ds(t, 1)]
        row = jnp.where(state_ok, row, NEG)
        # past the true length, carry alpha forward unchanged
        row = jnp.where(t < t_len, row, a_prev)
        alpha_ref[pl.ds(t, 1)] = row
        return row, jnp.where((t == t_len - 1) & fin_mask, row, fin_acc)

    _, fin = jax.lax.fori_loop(1, t_total, fwd_body, (init, fin0))

    # per-slot ll = LSE of the (<= 2, adjacent) participating lanes:
    # combine lane s_last with lane s_last-1 rolled onto it, then broadcast
    # each slot's single s_last lane to its segment via 0/1 matmuls
    fin_last = jnp.where(s_row == s_last, fin, NEG)
    fin_prev = pltpu.roll(jnp.where((s_row == s_last - 1) & (s_last > 0), fin, NEG), 1, 2)
    fin_prev = jnp.where(s_row == 0, NEG, fin_prev)
    ll_lane = _lse3(fin_last, fin_prev, jnp.full_like(fin_last, NEG))
    ll_sel = s_row == s_last
    seg_of = jax.lax.broadcasted_iota(jnp.int32, (lanes, group), 0) // sp
    col = jax.lax.broadcasted_iota(jnp.int32, (lanes, group), 1)
    gather_m = (seg_of == col).astype(jnp.float32)
    vals = jnp.where(ll_sel, ll_lane, 0.0)[0]  # [S, lanes]
    # HIGHEST precision: a single bf16 MXU pass would round the f32 ll values
    seg_ll = jnp.dot(vals, gather_m, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)  # [S, group]
    scat_r = jax.lax.broadcasted_iota(jnp.int32, (group, lanes), 0)
    scat_c = jax.lax.broadcasted_iota(jnp.int32, (group, lanes), 1) // sp
    scatter_m = (scat_r == scat_c).astype(jnp.float32)
    ll = jnp.dot(seg_ll, scatter_m, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)[None]  # [1, S, lanes]

    # -------------------- backward + gradients (fused) -------------------- #
    # beta[t+1] and lp[t+1] ride the carry; the occupancy gradient for row t
    # uses beta[t] = the row just computed, so a separate third T-row loop
    # would only repeat the loads. 3·T sequential rows → 2·T, no beta
    # scratch, and one dynamic lp load per iteration instead of two.
    skip2 = pltpu.roll(skip_row, lanes - 2, 2)  # skip_ok at the TARGET state s+2
    last_row = jnp.where(fin_mask, 0.0, NEG)

    def bwd_body(i, carry):
        b_next, lp_next = carry
        t = t_total - 1 - i
        is_last = t == t_len - 1
        beyond = t > t_len - 1
        term0 = b_next + lp_next
        # shift LEFT over the packed lanes: state s reads s+1, s+2
        t1 = pltpu.roll(term0, lanes - 1, 2)
        t1 = jnp.where(s_row == sp - 1, NEG, t1)
        t2 = pltpu.roll(term0, lanes - 2, 2)
        t2 = jnp.where(s_row >= sp - 2, NEG, t2)
        row = _lse3(term0, t1, t2 + skip2)
        row = jnp.where(is_last, last_row, row)
        row = jnp.where(beyond, NEG, row)
        row = jnp.where(state_ok, row, NEG)

        lp_t = lp_ref[0, pl.ds(t, 1)]
        occ = -jnp.exp(alpha_ref[pl.ds(t, 1)] + row - ll)
        occ = jnp.where(state_ok & (t < t_len), occ, 0.0)
        occ_ref[0, pl.ds(t, 1)] = occ
        return row, lp_t

    # carry init: at t = T-1 the row is fully determined by is_last/beyond
    # masks, so the seeded beta/lp values are never read through
    neg_row = jnp.full((1, subl, lanes), NEG, jnp.float32)
    jax.lax.fori_loop(0, t_total, bwd_body, (neg_row, lp_ref[0, pl.ds(t_total - 1, 1)]))
    occ_ref[0, pl.ds(t_total, 1)] = jnp.where(s_row == 0, -ll, 0.0)


def _ctc_pallas_call(lp_ext, skip_add, logit_length, label_length, interpret: bool):
    from tensorflowasr_tpu.ops.pallas.rnnt_kernel import _pack_grid, _pack_shape, _unpack_grid

    batch, t_total, sp = lp_ext.shape
    subl, group = _pack_shape(batch, t_total + 1, sp)
    e = subl * group
    bp = round_up(batch, e)
    if bp != batch:
        # padded examples: trivial 1-frame/0-label lattices, sliced off after
        lp_ext = jnp.pad(lp_ext, ((0, bp - batch), (0, 0), (0, 0)), constant_values=NEG)
        skip_add = jnp.pad(skip_add, ((0, bp - batch), (0, 0), (0, 0)), constant_values=NEG)
        logit_length = jnp.pad(jnp.asarray(logit_length, jnp.int32), (0, bp - batch), constant_values=1)
        label_length = jnp.pad(jnp.asarray(label_length, jnp.int32), (0, bp - batch))

    lp_p = _pack_grid(lp_ext, subl, group)
    skip_p = _pack_grid(skip_add, subl, group)
    lanes = group * sp
    nstep = bp // e

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nstep,),
        in_specs=[
            pl.BlockSpec((1, t_total, subl, lanes), lambda b, *_: (b, 0, 0, 0)),
            pl.BlockSpec((1, 1, subl, lanes), lambda b, *_: (b, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t_total + 1, subl, lanes), lambda b, *_: (b, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((t_total, subl, lanes), jnp.float32),  # alpha (beta rides the loop carry)
        ],
    )
    occ_p = pl.pallas_call(
        functools.partial(_ctc_kernel, subl=subl, group=group, sp=sp),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nstep, t_total + 1, subl, lanes), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(logit_length, jnp.int32), jnp.asarray(label_length, jnp.int32), lp_p, skip_p)
    return _unpack_grid(occ_p, subl, group, sp)[:batch]


def _prep(logits, labels, blank):
    """logits [B,T,V], labels [B,U] → lp_ext [B,T,Sp], skip_add [B,1,Sp], lse."""
    from tensorflowasr_tpu.ops.pallas.rnnt_kernel import _padded_lanes

    b, t, vocab = logits.shape
    u = labels.shape[1]
    s = 2 * u + 1
    # _padded_lanes bumps the 384-lane bucket to 512: when _pack_shape
    # returns group 1 (very long T) the packed minor dim equals sp, and
    # exactly 384 lanes with grid>1 is the bisected axon hang region (see
    # rnnt_kernel._padded_lanes); _pack_shape itself dodges group*sp == 384.
    sp = _padded_lanes(s)

    lse = jax.nn.logsumexp(logits, axis=-1)  # [B,T]
    # extended state labels: even → blank, odd s=2k+1 → labels[k]
    onehot = jax.nn.one_hot(labels.astype(jnp.int32), vocab, dtype=logits.dtype)  # [B,U,V]
    # batched GEMM contracting V (MXU) — a [B,T,U,V] broadcast-multiply here
    # compiles pathologically slowly on the remote TPU compiler at scale.
    # HIGHEST: the TPU default (one bf16 pass) rounds the selected f32
    # logits ~0.4% rel, which surfaced as ~1e-2 absolute grad error on-chip.
    sel = jax.lax.dot_general(logits, onehot, (((2,), (2,)), ((0,), (0,))), precision=jax.lax.Precision.HIGHEST)  # [B,T,U] label logits
    lp_lab = sel - lse[:, :, None]
    lp_blank = logits[..., blank] - lse  # [B,T]

    lp_ext = jnp.full((b, t, sp), LOG_0, jnp.float32)
    lp_ext = lp_ext.at[:, :, 0:s:2].set(lp_blank[:, :, None])
    lp_ext = lp_ext.at[:, :, 1:s:2].set(lp_lab)

    # skip allowed at odd states whose label differs from the previous label
    prev_lab = jnp.pad(labels, ((0, 0), (1, 0)), constant_values=-1)[:, :-1]
    allow = (labels != prev_lab) & (labels != blank)
    skip_add = jnp.full((b, 1, sp), LOG_0, jnp.float32)
    skip_add = skip_add.at[:, 0, 1:s:2].set(jnp.where(allow, 0.0, LOG_0))
    return lp_ext, skip_add, lse, onehot


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def ctc_loss_pallas(logits, logit_length, labels, label_length, blank: int = 0, interpret: bool = False):
    """Drop-in replacement for ``ops.ctc_loss.ctc_loss`` on the Pallas kernel."""
    loss, _ = _ctc_fwd_impl(logits, logit_length, labels, label_length, blank, interpret)
    return loss


def _ctc_fwd_impl(logits, logit_length, labels, label_length, blank, interpret):
    interpret = interpret or jax.default_backend() == "cpu"  # Pallas TPU kernels need interpret mode off-TPU
    assert blank == 0
    orig = logits
    if logits.dtype in (jnp.float16, jnp.bfloat16):
        logits = logits.astype(jnp.float32)
    logit_length = jnp.maximum(jnp.asarray(logit_length, jnp.int32), jnp.asarray(label_length, jnp.int32))
    lp_ext, skip_add, lse, onehot = _prep(logits, labels, blank)
    occ = _ctc_pallas_call(lp_ext, skip_add, logit_length, label_length, interpret)
    loss = occ[:, -1, 0]
    return loss, (orig, lse, occ, onehot)


def _ctc_fwd(logits, logit_length, labels, label_length, blank, interpret):
    loss, res = _ctc_fwd_impl(logits, logit_length, labels, label_length, blank, interpret)
    return loss, res


def _ctc_bwd(blank, interpret, residuals, g):
    logits, lse, occ, onehot = residuals
    b, t, vocab = logits.shape
    u = onehot.shape[1]
    s = 2 * u + 1
    logits32 = logits.astype(jnp.float32)
    softmax = jnp.exp(logits32 - lse[..., None])  # [B,T,V]

    g_blank = jnp.sum(occ[:, :t, 0:s:2], axis=-1)  # [B,T] total blank-state occupancy grad
    g_lab = occ[:, :t, 1:s:2]  # [B,T,U]
    gsum = g_blank + jnp.sum(g_lab, axis=-1)  # [B,T]

    onehot_blank = jax.nn.one_hot(jnp.zeros((), jnp.int32), vocab, dtype=jnp.float32)  # [V]
    # scatter the U label-occupancy grads into V bins as a batched GEMM
    # contracting U (MXU) — not as a [B,T,U,V] broadcast-sum (see _prep).
    # HIGHEST for the same reason as _prep's selection dot.
    w_lab = jax.lax.dot_general(g_lab, onehot.astype(jnp.float32), (((2,), (1,)), ((0,), (0,))), precision=jax.lax.Precision.HIGHEST)  # [B,T,V]
    d = (
        g_blank[..., None] * onehot_blank[None, None, :]
        + w_lab
        - softmax * gsum[..., None]
    )
    d = d * g[:, None, None]
    return d.astype(logits.dtype), None, None, None


ctc_loss_pallas.defvjp(_ctc_fwd, _ctc_bwd)


def ctc_loss_pallas_mean(logits, logit_length, labels, label_length, blank: int = 0, interpret: bool = False):
    return jnp.mean(ctc_loss_pallas(logits, logit_length, labels, label_length, blank, interpret))
