"""Fused joint-projection + RNN-T loss (flash-RNN-T) — opt-in.

The transducer's joint logits ``[B, T, U+1, V]`` are the largest tensor in
training (2.1 GB bf16 at bs16×16 s Conformer-S) and the train step pays
~8-10 GB/step of HBM traffic writing and re-reading them (see
docs/design/fused_joint_loss.md for the measured breakdown). This module
never materializes them: tiles of ``z = tanh(enc_p[t] + pred_p[u])`` and
``logits = z @ Wv + bv`` live only in VMEM/registers.

  forward  (per (b, t-tile) grid step): compute the logits tile on the MXU
    and immediately reduce it to ``lse`` / ``lp_blank`` / ``lp_emit``
    rows — O(B·T·U) outputs, 1/V-th the logits size. The RNN-T DP runs on
    those (ops/pallas/rnnt_kernel, lane-packed).
  backward (same grid): recompute the tile (flash-attention style),
    assemble ``d_logits`` in-register from the DP's occupancy gradients,
    and contract it immediately: ``d_enc_p`` per tile, ``d_pred_p`` and
    ``dWv``/``dbv`` accumulated across grid steps in revisited output
    blocks (sequential TPU grid).

Supported joint: add-mode, tanh, prejoint linears, no postjoint — the
flagship configuration; everything else uses the unfused path.

Status: DEFAULT under ``TFASR_LOSS_IMPL=auto`` since round 3. The round-2
kernel measured 138.7 ms/step vs 122.3 unfused at Conformer-S bs16×16 s;
executing the tuning leads fixed it: (a) J padded to plain 128-multiples
(320→384, not 512 — canary-validated, the bisected hang was on row-op
kernels not matmul tiles), (b) U+1 padded to SUBLANE multiples (129→144,
not 256 — U+1 is never a lane dim here, so the round-2 padding doubled
every tile GEMM's rows), (c) T tile raised 16→32 (halves grid steps).
Round-3 measurement (scripts_dev/profile_components.py, v5e): the fused
joint+loss block fwd+bwd = 21.0 ms vs 41.1 ms unfused — 2.0× faster, with
no [B,T,U+1,V] logits or residuals in HBM (the path that scales batch).
Exactness: value + all four input gradients match the unfused composition
(tests/test_fused_joint_loss.py), including a full train-step A/B.

Reference scope: replaces the logits production of
``models/transducer/base_transducer.py:177-302`` combined with the loss of
``losses/rnnt_loss.py`` in one memory pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tensorflowasr_tpu.utils.math_util import LOG_0, round_up

NEG = float(LOG_0)


def _lanes(n: int) -> int:
    p = round_up(max(n, 1), 128)
    return 512 if p == 384 else p


def _lanes_j(n: int) -> int:
    """J (contraction) dim padding: plain 128-multiples. The 384-lane hang
    (rnnt_kernel._padded_lanes) was bisected on long sequential row-op
    kernels; matmul operand tiles have not shown it, and J=320 models pay a
    60% FLOP tax if bumped to 512. Canary-validated on v5e at bench shapes."""
    return round_up(max(n, 1), 128)


def _sublanes_u(n: int) -> int:
    """U+1 (prediction-position) padding: SUBLANE multiples only (16 covers
    bf16's (16, 128) tile; f32 needs 8). U+1 is never a lane dim in these
    kernels — it only appears as the second-minor dim of the ``z``/``pred``
    tiles and as a factor of the GEMM row count — so padding it to 128
    (round-1 choice) just multiplied every tile GEMM's rows by up to 2×
    (129 → 256 at the flagship U=128). 129 → 144 cuts the padded-row FLOP
    tax from 1.98× to 1.12×."""
    return round_up(max(n, 1), 16)


def _t_tile() -> int:
    """T rows per grid step (multiple of 16 — bf16 sublane tile). Bigger
    tiles amortize per-grid-step overhead and feed the MXU larger GEMMs,
    but also grow the f32 [TT, U1p, Jp] intermediates that must round-trip
    VMEM. Retuned on chip after the round-5 orientation change (lane-major
    stats, register-carried DP rows): TT=16 now edges TT=32 by ~2% on the
    full loss leg (14.62/14.48 vs 14.94/14.77 ms over two reps each,
    Conformer-S bs16×16 s) — the smaller tile halves the VMEM residency
    (~12 MB of f32 intermediates at TT=16/U1p=144/J=384) and the
    per-grid-step overhead the bigger tile used to amortize is gone.
    Overridable for on-chip tuning via TFASR_FUSED_TT."""
    import os

    return int(os.environ.get("TFASR_FUSED_TT", "16"))


# --------------------------------------------------------------------------- #
# forward: logits tile -> (lse, lp_blank, lp_emit) rows
# --------------------------------------------------------------------------- #


def _fwd_kernel(
    lab_ref,  # [1, 1, TT*U1p] int32 label id per tile row (lane r = t·U1p+u); -1 where no emit
    enc_ref,  # [1, TT, Jp]
    pred_ref,  # [1, U1p, Jp]
    wvt_ref,  # [Vp, Jp] (vocab kernel TRANSPOSED)
    bvt_ref,  # [Vp, 1]
    stats_ref,  # out [1, 1, 3, TT*U1p]: sublane 0 = lp_blank, 1 = lp_emit, 2 = lse
    *,
    tt: int,
    u1p: int,
):
    """Transposed-logits orientation: ``logitsT[v, r]`` puts the (t, u) rows
    in LANES, so the three per-row reductions come out as dense [1, TU] rows
    instead of [TU, 1] columns. The round-4 row-major kernel emitted
    [B, n_t, TT·U1p, 1] buffers whose size-1 minor dim XLA pads to 128 lanes
    — a 128× memory blowup (3 × 3.66 GiB at bs128 = the OOM that killed the
    bs128 bench point; ~5 GB/step of pure padding HBM traffic at bs16)."""
    f32 = jnp.float32
    # add + tanh run in the matmul dtype (bf16 in training): the VPU packs
    # two bf16 lanes per f32 lane, halving the T·U1·J transcendental cost
    # that dominates this kernel, and it matches the UNFUSED path exactly —
    # ops/losses.py computes jnp.tanh on bf16 operands too. f32 inputs keep
    # the f32 tanh (interpret-mode goldens).
    enc = enc_ref[0].astype(wvt_ref.dtype)  # [TT, Jp]
    pred = pred_ref[0].astype(wvt_ref.dtype)  # [U1p, Jp]
    z3 = enc[:, None, :] + pred[None, :, :]  # [TT, U1p, Jp]
    # rows r = t*U1p + u
    a = jnp.tanh(z3).reshape(tt * u1p, -1)
    # HIGHEST only for f32 operands (Mosaic's default f32 matmul rounds to
    # one bf16 pass); bf16 operands must use DEFAULT (fp32-precision matmul
    # on bf16 vectors is rejected: "Bad lhs type")
    prec = jax.lax.Precision.HIGHEST if wvt_ref.dtype == f32 else jax.lax.Precision.DEFAULT
    # [Vp, Jp] ·contract Jp· [TU, Jp] → [Vp, TU]: both operands contract on
    # their minor dim (the attention-QKᵀ pattern — MXU-native, no relayout)
    logits = (
        jax.lax.dot_general(wvt_ref[...], a.astype(wvt_ref.dtype), (((1,), (1,)), ((), ())), precision=prec, preferred_element_type=f32)
        + bvt_ref[...]
    )

    m = jnp.max(logits, axis=0, keepdims=True)
    lse = m + jnp.log(jnp.sum(jnp.exp(logits - m), axis=0, keepdims=True))
    lpb = logits[0:1, :] - lse

    lab_lanes = lab_ref[0]  # [1, TU]
    v_iota = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
    sel = jnp.sum(jnp.where(v_iota == lab_lanes, logits, 0.0), axis=0, keepdims=True)
    lpe = jnp.where(lab_lanes >= 0, sel - lse, NEG)

    stats_ref[0, 0, 0:1] = lpb
    stats_ref[0, 0, 1:2] = lpe
    stats_ref[0, 0, 2:3] = lse


# --------------------------------------------------------------------------- #
# backward: recompute tile, contract d_logits immediately
# --------------------------------------------------------------------------- #


def _bwd_kernel(
    lab_ref,  # [1, 1, TT*U1p] int32 label id per tile row (lane-major)
    enc_ref,  # [1, TT, Jp]
    pred_ref,  # [1, U1p, Jp]
    wvt_ref,  # [Vp, Jp] (vocab kernel TRANSPOSED)
    bvt_ref,  # [Vp, 1]
    stats_ref,  # [1, 1, 3, TT*U1p]: sublane 0 = lse (from fwd), 1 = gbl, 2 = gem (upstream-scaled)
    denc_ref,  # out [1, TT, Jp] (written once per (b, tt))
    dpred_ref,  # out [1, U1p, Jp] (accumulated over tt for fixed b)
    dwvt_ref,  # out [Vp, Jp] (accumulated over all steps; transposed back XLA-side)
    dbvt_ref,  # out [Vp, 1] (accumulated over all steps)
    *,
    tt: int,
    u1p: int,
):
    f32 = jnp.float32
    b_idx = pl.program_id(0)
    t_idx = pl.program_id(1)

    # bf16 add+tanh for bf16 inputs — see _fwd_kernel (must recompute the
    # SAME activation values the forward produced)
    enc = enc_ref[0].astype(wvt_ref.dtype)
    pred = pred_ref[0].astype(wvt_ref.dtype)
    z3 = enc[:, None, :] + pred[None, :, :]
    a = jnp.tanh(z3).reshape(tt * u1p, -1)  # [TU, Jp]
    # HIGHEST only for f32 operands (Mosaic's default f32 matmul rounds to
    # one bf16 pass); bf16 operands must use DEFAULT (fp32-precision matmul
    # on bf16 vectors is rejected: "Bad lhs type")
    prec = jax.lax.Precision.HIGHEST if wvt_ref.dtype == f32 else jax.lax.Precision.DEFAULT
    logits = (
        jax.lax.dot_general(wvt_ref[...], a.astype(wvt_ref.dtype), (((1,), (1,)), ((), ())), precision=prec, preferred_element_type=f32)
        + bvt_ref[...]
    )  # [Vp, TU]

    lse = stats_ref[0, 0, 0:1]  # [1, TU]
    gbl = stats_ref[0, 0, 1:2]
    gem = stats_ref[0, 0, 2:3]
    softmax = jnp.exp(logits - lse)
    gsum = gbl + gem
    lab_lanes = lab_ref[0]  # [1, TU]
    v_iota = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
    # d logitsT = 1[v=0]·gbl + 1[v=lab]·gem − softmaxT·(gbl+gem)
    dlogits = jnp.where(v_iota == 0, gbl, 0.0) + jnp.where(v_iota == lab_lanes, gem, 0.0) - softmax * gsum

    hp = jax.lax.Precision.HIGHEST
    # dWvT += dlogitsT @ a ; dbvT += Σ_lanes dlogitsT
    prec2 = jax.lax.Precision.HIGHEST if a.dtype == f32 else jax.lax.Precision.DEFAULT
    dwvt_part = jax.lax.dot_general(dlogits.astype(a.dtype), a, (((1,), (0,)), ((), ())), precision=prec2, preferred_element_type=f32)
    dbvt_part = jnp.sum(dlogits, axis=1, keepdims=True)

    @pl.when((b_idx == 0) & (t_idx == 0))
    def _init_wv():
        dwvt_ref[...] = jnp.zeros_like(dwvt_ref)
        dbvt_ref[...] = jnp.zeros_like(dbvt_ref)

    dwvt_ref[...] += dwvt_part
    dbvt_ref[...] += dbvt_part

    # da[r, j] = Σ_v dlogitsT[v, r]·WvT[v, j] ; dz = da·(1−a²)
    wvt = wvt_ref[...].astype(f32)
    da = jax.lax.dot_general(dlogits, wvt, (((0,), (0,)), ((), ())), precision=hp, preferred_element_type=f32)
    a32 = a.astype(f32)
    dz = (da * (1.0 - a32 * a32)).reshape(tt, u1p, -1)  # [TT, U1p, Jp]

    denc_ref[0] = jnp.sum(dz, axis=1)  # [TT, Jp]

    @pl.when(t_idx == 0)
    def _init_pred():
        dpred_ref[0] = jnp.zeros_like(dpred_ref[0])

    dpred_ref[0] += jnp.sum(dz, axis=0)  # [U1p, Jp]


# --------------------------------------------------------------------------- #
# host-side wrappers + custom VJP
# --------------------------------------------------------------------------- #


def _pad_inputs(enc_p, pred_p, wv, bv, labels):
    b, t, j = enc_p.shape
    u1 = pred_p.shape[1]
    v = wv.shape[1]
    jp, u1p, vp = _lanes_j(j), _sublanes_u(u1), _lanes(v)
    tt = _t_tile()
    tp = round_up(t, tt)
    # NEG-pad bvT rows so padded vocab SUBLANES never win the lse max/sum;
    # zero-pad everything else (padded J lanes contribute 0 to dots)
    enc_pad = jnp.pad(enc_p, ((0, 0), (0, tp - t), (0, jp - j)))
    pred_pad = jnp.pad(pred_p, ((0, 0), (0, u1p - u1), (0, jp - j)))
    wvt_pad = jnp.pad(wv, ((0, jp - j), (0, vp - v))).T  # [Vp, Jp]
    bvt_pad = jnp.pad(bv.reshape(-1, 1), ((0, vp - v), (0, 0)), constant_values=NEG)  # [Vp, 1]
    lab = jnp.pad(labels.astype(jnp.int32), ((0, 0), (0, 1)), constant_values=-1)  # [B, U1]
    lab = jnp.pad(lab, ((0, 0), (0, u1p - u1)), constant_values=-1)
    # one label id per z-tile row r = t_in_tile*U1p + u, LANE-major: the same
    # [U1p] pattern tiled TT times along lanes, precomputed here because the
    # lane-index gather is not expressible inside the kernel
    lab_lanes = jnp.tile(lab, (1, tt))[:, None, :]  # [B, 1, TT*U1p]
    return enc_pad, pred_pad, wvt_pad, bvt_pad, lab_lanes, (tt, tp, jp, u1p, vp)


def _joint_logprobs(enc_p, pred_p, wv, bv, labels, interpret):
    """→ (lp_blank, lp_emit, lse) each [B, T, U1p-true-sliced]."""
    b, t, _ = enc_p.shape
    u1 = pred_p.shape[1]
    enc_pad, pred_pad, wvt_pad, bvt_pad, lab, (tt, tp, jp, u1p, vp) = _pad_inputs(enc_p, pred_p, wv, bv, labels)
    n_t = tp // tt

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b, n_t),
        in_specs=[
            pl.BlockSpec((1, 1, tt * u1p), lambda bi, ti: (bi, 0, 0)),
            pl.BlockSpec((1, tt, jp), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec((1, u1p, jp), lambda bi, ti: (bi, 0, 0)),
            pl.BlockSpec((vp, jp), lambda bi, ti: (0, 0)),
            pl.BlockSpec((vp, 1), lambda bi, ti: (0, 0)),
        ],
        # ONE dense lane-major stats output (sublanes 0/1/2 = lpb/lpe/lse):
        # a [B, n_t, TU, 1] column layout would be lane-padded 128× by XLA
        out_specs=[pl.BlockSpec((1, 1, 3, tt * u1p), lambda bi, ti: (bi, ti, 0, 0))],
    )
    (stats,) = pl.pallas_call(
        functools.partial(_fwd_kernel, tt=tt, u1p=u1p),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b, n_t, 3, tt * u1p), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(lab, enc_pad, pred_pad, wvt_pad, bvt_pad)

    def unpack(k):  # stats sublane k: [B, n_t, TT*U1p] → [B, T, U1]
        return stats[:, :, k, :].reshape(b, tp, u1p)[:, :t, :u1]

    return unpack(0), unpack(1), unpack(2)


def _joint_backward(enc_p, pred_p, wv, bv, labels, lse, gbl, gem, interpret):
    """gbl/gem: upstream-scaled dL/d lp rows [B, T, U1] → grads of the four
    differentiable inputs."""
    b, t, j = enc_p.shape
    u1 = pred_p.shape[1]
    v = wv.shape[1]
    enc_pad, pred_pad, wvt_pad, bvt_pad, lab, (tt, tp, jp, u1p, vp) = _pad_inputs(enc_p, pred_p, wv, bv, labels)
    n_t = tp // tt

    def pack(x, fill=0.0):  # [B, T, U1] → [B, n_t, 1, TT*U1p] lane-major
        xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, tp - t), (0, u1p - u1)), constant_values=fill)
        return xp.reshape(b, n_t, 1, tt * u1p)

    # lse pads with +1e9 so padded rows' softmax underflows to 0 (their
    # gbl/gem are 0, but exp(logits − 0) could overflow otherwise); sublane
    # order matches _bwd_kernel: 0 = lse, 1 = gbl, 2 = gem
    stats = jnp.concatenate([pack(lse, 1e9), pack(gbl), pack(gem)], axis=2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b, n_t),
        in_specs=[
            pl.BlockSpec((1, 1, tt * u1p), lambda bi, ti: (bi, 0, 0)),
            pl.BlockSpec((1, tt, jp), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec((1, u1p, jp), lambda bi, ti: (bi, 0, 0)),
            pl.BlockSpec((vp, jp), lambda bi, ti: (0, 0)),
            pl.BlockSpec((vp, 1), lambda bi, ti: (0, 0)),
            pl.BlockSpec((1, 1, 3, tt * u1p), lambda bi, ti: (bi, ti, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tt, jp), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec((1, u1p, jp), lambda bi, ti: (bi, 0, 0)),
            pl.BlockSpec((vp, jp), lambda bi, ti: (0, 0)),
            pl.BlockSpec((vp, 1), lambda bi, ti: (0, 0)),
        ],
    )
    denc, dpred, dwvt, dbvt = pl.pallas_call(
        functools.partial(_bwd_kernel, tt=tt, u1p=u1p),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, tp, jp), jnp.float32),
            jax.ShapeDtypeStruct((b, u1p, jp), jnp.float32),
            jax.ShapeDtypeStruct((vp, jp), jnp.float32),
            jax.ShapeDtypeStruct((vp, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(lab, enc_pad, pred_pad, wvt_pad, bvt_pad, stats)

    return (
        denc[:, :t, :j].astype(enc_p.dtype),
        dpred[:, :u1, :j].astype(pred_p.dtype),
        dwvt[:v, :j].T.astype(wv.dtype),
        dbvt[:v, 0].astype(bv.dtype),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def rnnt_loss_fused_joint(
    enc_p: jax.Array,  # [B, T, J] encoder side AFTER the prejoint linear
    pred_p: jax.Array,  # [B, U+1, J] prediction side AFTER the prejoint linear
    wv: jax.Array,  # [J, V] vocab projection kernel
    bv: jax.Array,  # [V] vocab projection bias
    logit_length: jax.Array,
    labels: jax.Array,
    label_length: jax.Array,
    blank: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Per-example RNN-T loss with the joint computed tile-wise in VMEM —
    the [B, T, U+1, V] logits never exist in HBM."""
    loss, _ = _fused_fwd_impl(enc_p, pred_p, wv, bv, logit_length, labels, label_length, interpret)
    return loss


def _fused_fwd_impl(enc_p, pred_p, wv, bv, logit_length, labels, label_length, interpret):
    from tensorflowasr_tpu.ops.pallas.rnnt_kernel import _rnnt_forward, _unskew

    interpret = interpret or jax.default_backend() == "cpu"
    assert pred_p.shape[1] == labels.shape[1] + 1, "pred_p must be U+1 rows"
    lpb, lpe, lse = _joint_logprobs(enc_p, pred_p, wv, bv, labels, interpret)
    loss, gbl_skew, gem2_skew = _rnnt_forward(lpb, lpe, logit_length, label_length, interpret)
    t, u1 = lpb.shape[1], lpb.shape[2]
    gbl = _unskew(gbl_skew, t, u1)
    gem = _unskew(gem2_skew, t, u1)
    return loss, (lse, gbl, gem)


def _fused_fwd(enc_p, pred_p, wv, bv, logit_length, labels, label_length, blank, interpret):
    assert blank == 0
    loss, (lse, gbl, gem) = _fused_fwd_impl(enc_p, pred_p, wv, bv, logit_length, labels, label_length, interpret)
    return loss, (enc_p, pred_p, wv, bv, labels, lse, gbl, gem)


def _fused_bwd(blank, interpret, res, g):
    enc_p, pred_p, wv, bv, labels, lse, gbl, gem = res
    interpret = interpret or jax.default_backend() == "cpu"
    scale = g[:, None, None].astype(jnp.float32)
    denc, dpred, dwv, dbv = _joint_backward(
        enc_p, pred_p, wv, bv, labels, lse, gbl * scale, gem * scale, interpret
    )
    return denc, dpred, dwv, dbv, None, None, None


rnnt_loss_fused_joint.defvjp(_fused_fwd, _fused_bwd)
