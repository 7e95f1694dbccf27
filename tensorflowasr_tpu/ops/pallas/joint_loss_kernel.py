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
    tiles amortize per-grid-step overhead (the round-2 kernel at TT=16 ran
    2×(B·T/16) = 800 steps per train step at bench shapes) and feed the MXU
    larger GEMMs. VMEM at TT=32/U1p=144/J=384: ~25 MB of f32 intermediates,
    comfortably under the 100 MB cap that v5e accepts. Overridable for
    on-chip tuning via TFASR_FUSED_TT."""
    import os

    return int(os.environ.get("TFASR_FUSED_TT", "32"))


# --------------------------------------------------------------------------- #
# forward: logits tile -> (lse, lp_blank, lp_emit) rows
# --------------------------------------------------------------------------- #


def _fwd_kernel(
    lab_ref,  # [1, TT*U1p, 1] int32 label id per tile row; -1 where no emit
    enc_ref,  # [1, TT, Jp]
    pred_ref,  # [1, U1p, Jp]
    wv_ref,  # [Jp, Vp]
    bv_ref,  # [1, Vp]
    lpb_ref,  # out [1, TT*U1p, 1]
    lpe_ref,  # out [1, TT*U1p, 1]
    lse_ref,  # out [1, TT*U1p, 1]
    *,
    tt: int,
    u1p: int,
):
    f32 = jnp.float32
    # add + tanh run in the matmul dtype (bf16 in training): the VPU packs
    # two bf16 lanes per f32 lane, halving the T·U1·J transcendental cost
    # that dominates this kernel, and it matches the UNFUSED path exactly —
    # ops/losses.py computes jnp.tanh on bf16 operands too. f32 inputs keep
    # the f32 tanh (interpret-mode goldens).
    enc = enc_ref[0].astype(wv_ref.dtype)  # [TT, Jp]
    pred = pred_ref[0].astype(wv_ref.dtype)  # [U1p, Jp]
    z3 = enc[:, None, :] + pred[None, :, :]  # [TT, U1p, Jp]
    # rows r = t*U1p + u
    a = jnp.tanh(z3).reshape(tt * u1p, -1)
    # HIGHEST only for f32 operands (Mosaic's default f32 matmul rounds to
    # one bf16 pass); bf16 operands must use DEFAULT (fp32-precision matmul
    # on bf16 vectors is rejected: "Bad lhs type")
    prec = jax.lax.Precision.HIGHEST if wv_ref.dtype == f32 else jax.lax.Precision.DEFAULT
    logits = jnp.dot(a.astype(wv_ref.dtype), wv_ref[...], preferred_element_type=f32, precision=prec) + bv_ref[...]

    m = jnp.max(logits, axis=1, keepdims=True)
    lse = m + jnp.log(jnp.sum(jnp.exp(logits - m), axis=1, keepdims=True))
    lpb = logits[:, 0:1] - lse

    lab_rows = lab_ref[0]  # [TT*U1p, 1]
    v_iota = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    sel = jnp.sum(jnp.where(v_iota == lab_rows, logits, 0.0), axis=1, keepdims=True)
    lpe = jnp.where(lab_rows >= 0, sel - lse, NEG)

    lse_ref[0, 0] = lse
    lpb_ref[0, 0] = lpb
    lpe_ref[0, 0] = lpe


# --------------------------------------------------------------------------- #
# backward: recompute tile, contract d_logits immediately
# --------------------------------------------------------------------------- #


def _bwd_kernel(
    lab_ref,  # [1, TT*U1p, 1] int32 label id per tile row
    enc_ref,  # [1, TT, Jp]
    pred_ref,  # [1, U1p, Jp]
    wv_ref,  # [Jp, Vp]
    bv_ref,  # [1, Vp]
    lse_ref,  # [1, TT*U1p, 1] (from fwd)
    gbl_ref,  # [1, TT*U1p, 1] dL/d lp_blank rows (upstream-scaled)
    gem_ref,  # [1, TT*U1p, 1] dL/d lp_emit rows (upstream-scaled)
    denc_ref,  # out [1, TT, Jp] (written once per (b, tt))
    dpred_ref,  # out [1, U1p, Jp] (accumulated over tt for fixed b)
    dwv_ref,  # out [Jp, Vp] (accumulated over all steps)
    dbv_ref,  # out [1, Vp] (accumulated over all steps)
    *,
    tt: int,
    u1p: int,
):
    f32 = jnp.float32
    b_idx = pl.program_id(0)
    t_idx = pl.program_id(1)

    # bf16 add+tanh for bf16 inputs — see _fwd_kernel (must recompute the
    # SAME activation values the forward produced)
    enc = enc_ref[0].astype(wv_ref.dtype)
    pred = pred_ref[0].astype(wv_ref.dtype)
    z3 = enc[:, None, :] + pred[None, :, :]
    a = jnp.tanh(z3).reshape(tt * u1p, -1)  # [TU, Jp]
    # HIGHEST only for f32 operands (Mosaic's default f32 matmul rounds to
    # one bf16 pass); bf16 operands must use DEFAULT (fp32-precision matmul
    # on bf16 vectors is rejected: "Bad lhs type")
    prec = jax.lax.Precision.HIGHEST if wv_ref.dtype == f32 else jax.lax.Precision.DEFAULT
    logits = jnp.dot(a.astype(wv_ref.dtype), wv_ref[...], preferred_element_type=f32, precision=prec) + bv_ref[...]

    lse = lse_ref[0, 0]  # [TU, 1]
    gbl = gbl_ref[0, 0]
    gem = gem_ref[0, 0]
    softmax = jnp.exp(logits - lse)
    gsum = gbl + gem
    lab_rows = lab_ref[0]  # [TT*U1p, 1]
    v_iota = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    # d logits = 1[v=0]·gbl + 1[v=lab]·gem − softmax·(gbl+gem)
    dlogits = jnp.where(v_iota == 0, gbl, 0.0) + jnp.where(v_iota == lab_rows, gem, 0.0) - softmax * gsum

    hp = jax.lax.Precision.HIGHEST
    # dWv += aᵀ @ dlogits ; dbv += Σ_rows dlogits
    prec2 = jax.lax.Precision.HIGHEST if a.dtype == f32 else jax.lax.Precision.DEFAULT
    dwv_part = jax.lax.dot_general(a, dlogits.astype(a.dtype), (((0,), (0,)), ((), ())), precision=prec2, preferred_element_type=f32)
    dbv_part = jnp.sum(dlogits, axis=0, keepdims=True)

    @pl.when((b_idx == 0) & (t_idx == 0))
    def _init_wv():
        dwv_ref[...] = jnp.zeros_like(dwv_ref)
        dbv_ref[...] = jnp.zeros_like(dbv_ref)

    dwv_ref[...] += dwv_part
    dbv_ref[...] += dbv_part

    # da = dlogits @ Wvᵀ ; dz = da·(1−a²)
    wv = wv_ref[...].astype(f32)
    da = jax.lax.dot_general(dlogits, wv, (((1,), (1,)), ((), ())), precision=hp, preferred_element_type=f32)
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
    # NEG-pad bv columns so padded vocab lanes never win lse/argmax sums;
    # zero-pad everything else (padded J lanes contribute 0 to dots)
    enc_pad = jnp.pad(enc_p, ((0, 0), (0, tp - t), (0, jp - j)))
    pred_pad = jnp.pad(pred_p, ((0, 0), (0, u1p - u1), (0, jp - j)))
    wv_pad = jnp.pad(wv, ((0, jp - j), (0, vp - v)))
    bv_pad = jnp.pad(bv.reshape(1, -1), ((0, 0), (0, vp - v)), constant_values=NEG)
    lab = jnp.pad(labels.astype(jnp.int32), ((0, 0), (0, 1)), constant_values=-1)  # [B, U1]
    lab = jnp.pad(lab, ((0, 0), (0, u1p - u1)), constant_values=-1)
    # one label id per z-tile ROW (r = t_in_tile*U1p + u): the same [U1p]
    # pattern tiled TT times, precomputed here because collapsing lanes into
    # sublanes inside the kernel is an unsupported Mosaic shape cast
    lab_rows = jnp.tile(lab, (1, tt))[:, :, None]  # [B, TT*U1p, 1]
    return enc_pad, pred_pad, wv_pad, bv_pad, lab_rows, (tt, tp, jp, u1p, vp)


def _joint_logprobs(enc_p, pred_p, wv, bv, labels, interpret):
    """→ (lp_blank, lp_emit, lse) each [B, T, U1p-true-sliced]."""
    b, t, _ = enc_p.shape
    u1 = pred_p.shape[1]
    enc_pad, pred_pad, wv_pad, bv_pad, lab, (tt, tp, jp, u1p, vp) = _pad_inputs(enc_p, pred_p, wv, bv, labels)
    n_t = tp // tt

    col = lambda: pl.BlockSpec((1, 1, tt * u1p, 1), lambda bi, ti: (bi, ti, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b, n_t),
        in_specs=[
            pl.BlockSpec((1, tt * u1p, 1), lambda bi, ti: (bi, 0, 0)),
            pl.BlockSpec((1, tt, jp), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec((1, u1p, jp), lambda bi, ti: (bi, 0, 0)),
            pl.BlockSpec((jp, vp), lambda bi, ti: (0, 0)),
            pl.BlockSpec((1, vp), lambda bi, ti: (0, 0)),
        ],
        out_specs=[col(), col(), col()],
    )
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, tt=tt, u1p=u1p),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b, n_t, tt * u1p, 1), jnp.float32)] * 3,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(lab, enc_pad, pred_pad, wv_pad, bv_pad)

    def unpack(x):  # [B, n_t, TT*U1p, 1] → [B, T, U1]
        return x.reshape(b, tp, u1p)[:, :t, :u1]

    lpb, lpe, lse = (unpack(o) for o in outs)
    return lpb, lpe, lse


def _joint_backward(enc_p, pred_p, wv, bv, labels, lse, gbl, gem, interpret):
    """gbl/gem: upstream-scaled dL/d lp rows [B, T, U1] → grads of the four
    differentiable inputs."""
    b, t, j = enc_p.shape
    u1 = pred_p.shape[1]
    v = wv.shape[1]
    enc_pad, pred_pad, wv_pad, bv_pad, lab, (tt, tp, jp, u1p, vp) = _pad_inputs(enc_p, pred_p, wv, bv, labels)
    n_t = tp // tt

    def pack(x, fill=0.0):  # [B, T, U1] → [B, n_t, TT*U1p, 1]
        xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, tp - t), (0, u1p - u1)), constant_values=fill)
        return xp.reshape(b, n_t, tt * u1p, 1)

    col = lambda: pl.BlockSpec((1, 1, tt * u1p, 1), lambda bi, ti: (bi, ti, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b, n_t),
        in_specs=[
            pl.BlockSpec((1, tt * u1p, 1), lambda bi, ti: (bi, 0, 0)),
            pl.BlockSpec((1, tt, jp), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec((1, u1p, jp), lambda bi, ti: (bi, 0, 0)),
            pl.BlockSpec((jp, vp), lambda bi, ti: (0, 0)),
            pl.BlockSpec((1, vp), lambda bi, ti: (0, 0)),
            col(),
            col(),
            col(),
        ],
        out_specs=[
            pl.BlockSpec((1, tt, jp), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec((1, u1p, jp), lambda bi, ti: (bi, 0, 0)),
            pl.BlockSpec((jp, vp), lambda bi, ti: (0, 0)),
            pl.BlockSpec((1, vp), lambda bi, ti: (0, 0)),
        ],
    )
    denc, dpred, dwv, dbv = pl.pallas_call(
        functools.partial(_bwd_kernel, tt=tt, u1p=u1p),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, tp, jp), jnp.float32),
            jax.ShapeDtypeStruct((b, u1p, jp), jnp.float32),
            jax.ShapeDtypeStruct((jp, vp), jnp.float32),
            jax.ShapeDtypeStruct((1, vp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    # lse pads with +1e9 so padded rows' softmax underflows to 0 (their
    # gbl/gem are 0, but exp(logits − 0) could overflow otherwise)
    )(lab, enc_pad, pred_pad, wv_pad, bv_pad, pack(lse, 1e9), pack(gbl), pack(gem))

    return (
        denc[:, :t, :j].astype(enc_p.dtype),
        dpred[:, :u1, :j].astype(pred_p.dtype),
        dwv[:j, :v].astype(wv.dtype),
        dbv[0, :v].astype(bv.dtype),
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
