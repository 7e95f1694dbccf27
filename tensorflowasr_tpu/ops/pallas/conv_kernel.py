"""Fused Conformer convolution module: two Pallas passes around XLA's
depthwise conv + batch statistics.

Motivation (measured, v5e, Conformer-S bs16×16 s, post-FF-kernel profile):
the 16 conv modules cost ~10 ms of the 78 ms train step — HBM round-trips
(LN stats, GLU, BN, swish, two pointwise GEMMs, residual) over [B,T,2D]
activations, not FLOPs.

What stays in XLA, and why:
  - the 31-tap depthwise conv: a roll-based in-kernel formulation was
    built and MEASURED SLOWER (31–62 static sublane ``pltpu.roll`` shifts
    per direction ≈ 13.3 ms for the 16-module stack vs 9.4 XLA — the VPU
    shuffle traffic of [T, D]-tile rotates dwarfs the fused-elementwise
    win). XLA's conv emitter handles it better; autodiff composes it
    between the two custom-vjp kernels for free.
  - train-mode BatchNorm statistics: they reduce over the WHOLE [B·T]
    batch, so they cannot live inside a per-row-block kernel anyway (one
    cheap XLA pass; flax-compatible running-stat update in the module).

  F1 (``conv_front``): LN → pointwise (2D, split into two D-wide GEMMs so
      the GLU halves land on lane-aligned tensors) → GLU.
  F2 (``conv_back``): BN apply → swish → pointwise → dropout (in-kernel
      counter-hash PRNG) → scaled residual; emits dmean/dvar cotangents so
      the XLA stats path backpropagates into F1.

Several examples ride one grid step as stacked sublane groups ([P·tp, D]
tiles) — bigger GEMMs, fewer grid steps. Both backwards recompute their
forward; weight gradients accumulate across grid steps in revisited
output blocks.

Replaces the hot path of the reference's Conformer ConvModule
(``tensorflow_asr/models/encoders/conformer.py:245-379``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tensorflowasr_tpu.ops.pallas.attention_kernel import _dropout_mask, _lanes
from tensorflowasr_tpu.ops.pallas.ff_kernel import _ln_fwd
from tensorflowasr_tpu.utils.math_util import round_up

_SALT_STEP = 40499


def conv_shapes_supported(t: int, d: int, k: int, padding: str) -> bool:
    if padding not in ("causal", "same"):
        return False
    if round_up(d, 128) == 384:  # the bisected axon 384-lane hang bucket
        return False
    tp, dp = round_up(t, 16), _lanes(d)
    # ~6 row-block f32 tiles live in the backward plus weight blocks
    return (6 * tp * dp + 3 * dp * dp) * 4 <= 48 * 1024 * 1024


def _pack_factor(b: int, tp: int) -> int:
    for p in (8, 4, 2):
        if b % p == 0 and p * tp <= 4096:
            return p
    return 1


def _front_recompute(x_ref, g_ref, b_ref, wa_ref, ba_ref, wb_ref, bb_ref, *, d_true, eps):
    f32 = jnp.float32
    x32 = x_ref[0].astype(f32)
    lane_ok = jax.lax.broadcasted_iota(jnp.int32, x32.shape, 1) < d_true
    y, xhat, rstd = _ln_fwd(x32, d_true, eps, g_ref[...].astype(f32), b_ref[...].astype(f32), lane_ok)
    wa = wa_ref[...]
    prec = jax.lax.Precision.HIGHEST if wa.dtype == f32 else jax.lax.Precision.DEFAULT
    yc = y.astype(wa.dtype)
    ha = jax.lax.dot_general(yc, wa, (((1,), (0,)), ((), ())), preferred_element_type=f32, precision=prec) + ba_ref[...].astype(f32)
    hb = jax.lax.dot_general(yc, wb_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=f32, precision=prec) + bb_ref[...].astype(f32)
    sigb = jax.nn.sigmoid(hb)
    g = jnp.where(lane_ok, ha * sigb, 0.0)  # bias broadcast would leak into padded lanes
    return x32, lane_ok, y, xhat, rstd, ha, hb, sigb, g, prec


def _front_fwd_kernel(x_ref, g_ref, b_ref, wa_ref, ba_ref, wb_ref, bb_ref, o_ref, *, d_true, tp, t_true, eps):
    out = _front_recompute(x_ref, g_ref, b_ref, wa_ref, ba_ref, wb_ref, bb_ref, eps=eps, d_true=d_true)
    g = out[8]
    pos = jax.lax.broadcasted_iota(jnp.int32, g.shape, 0) % tp
    # zero padded rows (they carry LN(0)=β): the XLA depthwise conv window
    # and the batch statistics downstream must not see them
    o_ref[0] = jnp.where(pos < t_true, g, 0.0).astype(o_ref.dtype)


def _front_bwd_kernel(
    x_ref, g_ref, b_ref, wa_ref, ba_ref, wb_ref, bb_ref, dg_in_ref,
    dx_ref, dg_ref, db_ref, dwa_ref, dba_ref, dwb_ref, dbb_ref,
    *, d_true, tp, t_true, eps,
):
    f32 = jnp.float32
    i = pl.program_id(0)
    x32, lane_ok, y, xhat, rstd, ha, hb, sigb, g, prec = _front_recompute(
        x_ref, g_ref, b_ref, wa_ref, ba_ref, wb_ref, bb_ref, d_true=d_true, eps=eps
    )

    @pl.when(i == 0)
    def _init():
        for r in (dg_ref, db_ref, dwa_ref, dba_ref, dwb_ref, dbb_ref):
            r[...] = jnp.zeros_like(r)

    dg = dg_in_ref[0].astype(f32)
    pos = jax.lax.broadcasted_iota(jnp.int32, dg.shape, 0) % tp
    dg = jnp.where((pos < t_true) & lane_ok, dg, 0.0)
    dha = dg * sigb
    dhb = dg * ha * sigb * (1.0 - sigb)
    dba_ref[...] += jnp.sum(dha, axis=0, keepdims=True)
    dbb_ref[...] += jnp.sum(dhb, axis=0, keepdims=True)
    dwa_ref[...] += jax.lax.dot_general(y, dha, (((0,), (0,)), ((), ())), preferred_element_type=f32, precision=prec)
    dwb_ref[...] += jax.lax.dot_general(y, dhb, (((0,), (0,)), ((), ())), preferred_element_type=f32, precision=prec)
    wa, wb = wa_ref[...], wb_ref[...]
    dy = jax.lax.dot_general(dha.astype(wa.dtype), wa, (((1,), (1,)), ((), ())), preferred_element_type=f32, precision=prec)
    dy = dy + jax.lax.dot_general(dhb.astype(wb.dtype), wb, (((1,), (1,)), ((), ())), preferred_element_type=f32, precision=prec)
    gamma = g_ref[...].astype(f32)
    dg_ref[...] += jnp.sum(dy * xhat, axis=0, keepdims=True)
    db_ref[...] += jnp.sum(jnp.where(lane_ok, dy, 0.0), axis=0, keepdims=True)
    dxn = jnp.where(lane_ok, dy * gamma, 0.0)
    inv_d = 1.0 / d_true
    m1 = jnp.sum(dxn, axis=1, keepdims=True) * inv_d
    m2 = jnp.sum(dxn * xhat, axis=1, keepdims=True) * inv_d
    dx_ref[0] = jnp.where(lane_ok, rstd * (dxn - m1 - xhat * m2), 0.0).astype(dx_ref.dtype)


def _front_pack(x, gamma, beta, wa, ba, wb, bb):
    """Lane dims ARE padded here (144→256): an unpadded-blocks variant was
    measured — the masked sub-tile [·,144]@[144,144] GEMM chain lowered
    ~50% slower than the padded one (13.6 vs 9 ms/stack), unlike the FF
    and attention kernels where unpadded blocks are neutral-to-faster."""
    b, t, d = x.shape
    tp, dp = round_up(t, 16), _lanes(d)
    p = _pack_factor(b, tp)
    xp = jnp.pad(x, ((0, 0), (0, tp - t), (0, dp - d))).reshape(b // p, p * tp, dp)
    vec = lambda v: jnp.pad(v.reshape(1, d), ((0, 0), (0, dp - d)))
    return (
        xp,
        vec(gamma),
        vec(beta),
        jnp.pad(wa, ((0, dp - d), (0, dp - d))),
        vec(ba),
        jnp.pad(wb, ((0, dp - d), (0, dp - d))),
        vec(bb),
        (b, t, d, tp, dp, p),
    )


def _front_specs(p, tp, dp):
    xspec = pl.BlockSpec((1, p * tp, dp), lambda i: (i, 0, 0))
    vspec = pl.BlockSpec((1, dp), lambda i: (0, 0))
    wspec = pl.BlockSpec((dp, dp), lambda i: (0, 0))
    return xspec, vspec, wspec


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def conv_front(x, gamma, beta, wa, ba, wb, bb, eps: float = 1e-3, interpret: bool = False):
    """GLU([LN(x)·Wa + ba, LN(x)·Wb + bb]) — the conv module up to (not
    including) the depthwise conv.

    x: [B, T, D]; wa/wb: [D, D] GLU halves of the 2D pointwise kernel.
    Returns [B, T, D] in x.dtype.
    """
    out, _ = _front_vjp_fwd(x, gamma, beta, wa, ba, wb, bb, eps, interpret)
    return out


def _front_vjp_fwd(x, gamma, beta, wa, ba, wb, bb, eps, interpret):
    interpret = interpret or jax.default_backend() == "cpu"
    xp, gp, bp, wap, bap, wbp, bbp, (b, t, d, tp, dp, p) = _front_pack(x, gamma, beta, wa, ba, wb, bb)
    xspec, vspec, wspec = _front_specs(p, tp, dp)
    out = pl.pallas_call(
        functools.partial(_front_fwd_kernel, d_true=d, tp=tp, t_true=t, eps=eps),
        grid=(b // p,),
        in_specs=[xspec, vspec, vspec, wspec, vspec, wspec, vspec],
        out_specs=[xspec],
        out_shape=[jax.ShapeDtypeStruct((b // p, p * tp, dp), x.dtype)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, gp, bp, wap, bap, wbp, bbp)[0]
    return out.reshape(b, tp, dp)[:, :t, :d], (x, gamma, beta, wa, ba, wb, bb)


def _front_vjp_bwd(eps, interpret, res, g):
    x, gamma, beta, wa, ba, wb, bb = res
    interpret_ = interpret or jax.default_backend() == "cpu"
    xp, gp, bp, wap, bap, wbp, bbp, (b, t, d, tp, dp, p) = _front_pack(x, gamma, beta, wa, ba, wb, bb)
    dgp = jnp.pad(g.astype(jnp.float32), ((0, 0), (0, tp - t), (0, dp - d))).reshape(b // p, p * tp, dp)
    xspec, vspec, wspec = _front_specs(p, tp, dp)
    f32 = jnp.float32
    dx, dgm, dbt, dwa, dba, dwb, dbb = pl.pallas_call(
        functools.partial(_front_bwd_kernel, d_true=d, tp=tp, t_true=t, eps=eps),
        grid=(b // p,),
        in_specs=[xspec, vspec, vspec, wspec, vspec, wspec, vspec, xspec],
        out_specs=[xspec, vspec, vspec, wspec, vspec, wspec, vspec],
        out_shape=[
            jax.ShapeDtypeStruct((b // p, p * tp, dp), f32),
            jax.ShapeDtypeStruct((1, dp), f32),
            jax.ShapeDtypeStruct((1, dp), f32),
            jax.ShapeDtypeStruct((dp, dp), f32),
            jax.ShapeDtypeStruct((1, dp), f32),
            jax.ShapeDtypeStruct((dp, dp), f32),
            jax.ShapeDtypeStruct((1, dp), f32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret_,
    )(xp, gp, bp, wap, bap, wbp, bbp, dgp)
    return (
        dx.reshape(b, tp, dp)[:, :t, :d].astype(x.dtype),
        dgm[0, :d].astype(gamma.dtype),
        dbt[0, :d].astype(beta.dtype),
        dwa[:d, :d].astype(wa.dtype),
        dba[0, :d].astype(ba.dtype),
        dwb[:d, :d].astype(wb.dtype),
        dbb[0, :d].astype(bb.dtype),
    )


conv_front.defvjp(_front_vjp_fwd, _front_vjp_bwd)


def depthwise_conv1d(g, wd, bd, padding: str):
    """XLA depthwise conv (the piece deliberately NOT in Pallas — see module
    docstring). g: [B, T, D]; wd: [K, D] taps; padding causal/same."""
    k = wd.shape[0]
    pad = [(k - 1, 0)] if padding == "causal" else [((k - 1) // 2, k // 2)]
    out = jax.lax.conv_general_dilated(
        g,
        wd[:, None, :].astype(g.dtype),
        window_strides=(1,),
        padding=pad,
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=g.shape[-1],
    )
    return out + bd.astype(out.dtype)


# --------------------------------------------------------------------------- #
# F2: BN apply → swish → pointwise → dropout → scaled residual
# --------------------------------------------------------------------------- #


def _back_recompute(y1_ref, mean_ref, var_ref, s_ref, b_ref, w2_ref, b2_ref, seed_ref, *, d_true, eps, rate):
    f32 = jnp.float32
    i = pl.program_id(0)
    y1 = y1_ref[0].astype(f32)
    lane_ok = jax.lax.broadcasted_iota(jnp.int32, y1.shape, 1) < d_true
    rstd = jax.lax.rsqrt(var_ref[...].astype(f32) + eps)  # [1, Dp]; padded var=0 → finite
    xhat = (y1 - mean_ref[...].astype(f32)) * rstd
    bn = xhat * s_ref[...].astype(f32) + b_ref[...].astype(f32)
    sig = jax.nn.sigmoid(bn)
    a = jnp.where(lane_ok, bn * sig, 0.0)
    w2 = w2_ref[...]
    prec = jax.lax.Precision.HIGHEST if w2.dtype == f32 else jax.lax.Precision.DEFAULT
    z = jax.lax.dot_general(a.astype(w2.dtype), w2, (((1,), (0,)), ((), ())), preferred_element_type=f32, precision=prec)
    z = jnp.where(lane_ok, z + b2_ref[...].astype(f32), 0.0)
    if rate > 0.0:
        keep = _dropout_mask(seed_ref[0] + i * jnp.int32(_SALT_STEP), z.shape, rate)
        z = z * keep
    else:
        keep = None
    return lane_ok, rstd, xhat, bn, sig, a, z, keep, prec


def _back_fwd_kernel(seed_ref, x_ref, y1_ref, mean_ref, var_ref, s_ref, b_ref, w2_ref, b2_ref, o_ref, *, d_true, eps, rate, factor):
    _, _, _, _, _, _, z, _, _ = _back_recompute(y1_ref, mean_ref, var_ref, s_ref, b_ref, w2_ref, b2_ref, seed_ref, d_true=d_true, eps=eps, rate=rate)
    o_ref[0] = (x_ref[0].astype(jnp.float32) + factor * z).astype(o_ref.dtype)


def _back_bwd_kernel(
    seed_ref, y1_ref, mean_ref, var_ref, s_ref, b_ref, w2_ref, b2_ref, do_ref,
    dy1_ref, dmean_ref, dvar_ref, ds_ref, db_ref, dw2_ref, db2_ref,
    *, d_true, eps, rate, factor,
):
    f32 = jnp.float32
    i = pl.program_id(0)
    lane_ok, rstd, xhat, bn, sig, a, _, keep, prec = _back_recompute(
        y1_ref, mean_ref, var_ref, s_ref, b_ref, w2_ref, b2_ref, seed_ref, d_true=d_true, eps=eps, rate=rate
    )

    @pl.when(i == 0)
    def _init():
        for r in (dmean_ref, dvar_ref, ds_ref, db_ref, dw2_ref, db2_ref):
            r[...] = jnp.zeros_like(r)

    do = do_ref[0].astype(f32)
    dz = factor * do
    if rate > 0.0:
        dz = dz * keep
    dz = jnp.where(lane_ok, dz, 0.0)
    db2_ref[...] += jnp.sum(dz, axis=0, keepdims=True)
    dw2_ref[...] += jax.lax.dot_general(a, dz, (((0,), (0,)), ((), ())), preferred_element_type=f32, precision=prec)
    w2 = w2_ref[...]
    da = jax.lax.dot_general(dz.astype(w2.dtype), w2, (((1,), (1,)), ((), ())), preferred_element_type=f32, precision=prec)
    dbn = da * (sig + bn * sig * (1.0 - sig))
    dbn = jnp.where(lane_ok, dbn, 0.0)
    ds_ref[...] += jnp.sum(dbn * xhat, axis=0, keepdims=True)
    db_ref[...] += jnp.sum(dbn, axis=0, keepdims=True)
    dxhat = dbn * s_ref[...].astype(f32)
    dy1_ref[0] = (dxhat * rstd).astype(dy1_ref.dtype)
    dmean_ref[...] += jnp.sum(-dxhat * rstd, axis=0, keepdims=True)
    dvar_ref[...] += jnp.sum(dxhat * xhat, axis=0, keepdims=True) * -0.5 * rstd * rstd


def _back_pack(x, y1, mean, var, scale, bias, w2, b2):
    """Lane dims padded — see _front_pack."""
    b, t, d = x.shape
    tp, dp = round_up(t, 16), _lanes(d)
    p = _pack_factor(b, tp)
    pack3 = lambda a: jnp.pad(a, ((0, 0), (0, tp - t), (0, dp - d))).reshape(b // p, p * tp, dp)
    vec = lambda v: jnp.pad(v.reshape(1, d).astype(jnp.float32), ((0, 0), (0, dp - d)))
    return (
        pack3(x),
        pack3(y1),
        vec(mean),
        vec(var),
        vec(scale),
        vec(bias),
        jnp.pad(w2, ((0, dp - d), (0, dp - d))),
        vec(b2),
        (b, t, d, tp, dp, p),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def conv_back(x, y1, mean, var, scale, bias, w2, b2, seed, rate: float = 0.0, factor: float = 1.0, eps: float = 1e-3, interpret: bool = False):
    """x + factor · drop(swish((y1 − mean)·rstd·scale + bias) · W2 + b2).

    x/y1: [B, T, D] (skip input / depthwise-conv output); mean/var/scale/
    bias: [D] BatchNorm stats+affine; w2: [D, D] second pointwise. Emits
    dmean/dvar cotangents so the XLA batch-stat path backpropagates.
    """
    out, _ = _back_vjp_fwd(x, y1, mean, var, scale, bias, w2, b2, seed, rate, factor, eps, interpret)
    return out


def _back_vjp_fwd(x, y1, mean, var, scale, bias, w2, b2, seed, rate, factor, eps, interpret):
    interpret = interpret or jax.default_backend() == "cpu"
    xp, y1p, mp, vp, sp, bp, w2p, b2p, (b, t, d, tp, dp, p) = _back_pack(x, y1, mean, var, scale, bias, w2, b2)
    xspec = pl.BlockSpec((1, p * tp, dp), lambda i, *_: (i, 0, 0))
    vspec = pl.BlockSpec((1, dp), lambda i, *_: (0, 0))
    wspec = pl.BlockSpec((dp, dp), lambda i, *_: (0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(b // p,), in_specs=[xspec, xspec, vspec, vspec, vspec, vspec, wspec, vspec], out_specs=[xspec]
    )
    out = pl.pallas_call(
        functools.partial(_back_fwd_kernel, d_true=d, eps=eps, rate=rate, factor=factor),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b // p, p * tp, dp), x.dtype)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), xp, y1p, mp, vp, sp, bp, w2p, b2p)[0]
    return out.reshape(b, tp, dp)[:, :t, :d], (y1, mean, var, scale, bias, w2, b2, seed)


def _back_vjp_bwd(rate, factor, eps, interpret, res, g):
    y1, mean, var, scale, bias, w2, b2, seed = res
    interpret_ = interpret or jax.default_backend() == "cpu"
    x_dummy = y1  # packing helper only uses shapes for x
    xp, y1p, mp, vp, sp, bp, w2p, b2p, (b, t, d, tp, dp, p) = _back_pack(x_dummy, y1, mean, var, scale, bias, w2, b2)
    dop = jnp.pad(g.astype(jnp.float32), ((0, 0), (0, tp - t), (0, dp - d))).reshape(b // p, p * tp, dp)
    xspec = pl.BlockSpec((1, p * tp, dp), lambda i, *_: (i, 0, 0))
    vspec = pl.BlockSpec((1, dp), lambda i, *_: (0, 0))
    wspec = pl.BlockSpec((dp, dp), lambda i, *_: (0, 0))
    f32 = jnp.float32
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // p,),
        in_specs=[xspec, vspec, vspec, vspec, vspec, wspec, vspec, xspec],
        out_specs=[xspec, vspec, vspec, vspec, vspec, wspec, vspec],
    )
    dy1, dmean, dvar, ds, db, dw2, db2 = pl.pallas_call(
        functools.partial(_back_bwd_kernel, d_true=d, eps=eps, rate=rate, factor=factor),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b // p, p * tp, dp), f32),
            jax.ShapeDtypeStruct((1, dp), f32),
            jax.ShapeDtypeStruct((1, dp), f32),
            jax.ShapeDtypeStruct((1, dp), f32),
            jax.ShapeDtypeStruct((1, dp), f32),
            jax.ShapeDtypeStruct((dp, dp), f32),
            jax.ShapeDtypeStruct((1, dp), f32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret_,
    )(jnp.asarray(seed, jnp.int32).reshape(1), y1p, mp, vp, sp, bp, w2p, b2p, dop)
    return (
        g,  # d(out)/dx is the identity skip path
        dy1.reshape(b, tp, dp)[:, :t, :d].astype(y1.dtype),
        dmean[0, :d].astype(mean.dtype),
        dvar[0, :d].astype(var.dtype),
        ds[0, :d].astype(scale.dtype),
        db[0, :d].astype(bias.dtype),
        dw2[:d, :d].astype(w2.dtype),
        db2[0, :d].astype(b2.dtype),
        None,
    )


conv_back.defvjp(_back_vjp_fwd, _back_vjp_bwd)
