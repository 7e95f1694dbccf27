"""Fused Conformer feed-forward module: LN → W1+swish(+dropout) → W2
(+dropout) → scaled residual, one VMEM pass per row tile.

Motivation (measured, v5e, Conformer-S bs16×16 s, post-attention-kernel
profile): the 32 FF modules cost 20.8 ms of the 85 ms train step while
their GEMMs are ~1 ms of MXU work at peak — the rest is HBM round-trips
of [B·T, 4D] activations (LN stats, swish, two dropout masks, residual)
plus the 144→256 lane padding XLA re-pays on every elementwise pass.
This kernel streams row tiles of the flattened [B·T, D] input once in
each direction: the whole chain lives in VMEM, weights stay resident
across grid steps, and the backward recomputes forward intermediates
instead of storing them (same recompute strategy as attention_kernel).

Both dropout sites (post-swish and post-W2; reference
``models/encoders/conformer.py:52-58`` FFModule dropout placement) run
in-kernel with the counter-hash PRNG from attention_kernel, regenerated
bit-exactly in the backward — the [B·T, 4D] keep masks never exist in
HBM. Weight/LN gradients accumulate across grid steps in revisited output
blocks (same pattern as joint_loss_kernel dWv).

Replaces the hot path of the reference's Conformer FFModule
(``tensorflow_asr/models/encoders/conformer.py:30-111``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tensorflowasr_tpu.ops.pallas.attention_kernel import _dropout_mask, _lanes
from tensorflowasr_tpu.utils.math_util import round_up

_SALT_STEP = 40499  # per-grid-step dropout decorrelation
_SALT_SITE2 = 7919  # second dropout site


def _row_tile(n: int) -> int:
    return round_up(min(n, 1024), 16)


def ff_shapes_supported(n: int, d: int, f: int) -> bool:
    """VMEM budget: ~5 [TR, Fp] + ~4 [TR, Dp] f32 tiles live in bwd, plus
    two weight blocks and two weight-grad accumulators. Lane dims whose
    physical padding lands on exactly 384 lanes (3 tiles) are refused —
    the bisected axon hang region (see rnnt_kernel._padded_lanes)."""
    if round_up(d, 128) == 384 or round_up(f, 128) == 384:
        return False
    tr, dp, fp = _row_tile(n), _lanes(d), _lanes(f)
    tiles = (5 * tr * fp + 4 * tr * dp + 4 * dp * fp) * 4
    return tiles <= 64 * 1024 * 1024


def _ln_fwd(x32, d_true: int, eps: float, gamma, beta, lane_ok):
    """Row LayerNorm over the first ``d_true`` lanes; padded lanes → 0.

    Stats in f32 (flax ``nn.LayerNorm`` promotes stats to f32 as well).
    Returns (y, xhat, rstd)."""
    inv_d = 1.0 / d_true
    mu = jnp.sum(x32, axis=1, keepdims=True) * inv_d  # padded lanes are 0
    cx = jnp.where(lane_ok, x32 - mu, 0.0)
    var = jnp.sum(cx * cx, axis=1, keepdims=True) * inv_d
    rstd = jax.lax.rsqrt(var + eps)
    xhat = cx * rstd
    y = xhat * gamma + beta  # gamma/beta zero-padded → y padded lanes stay 0
    return y, xhat, rstd


def _recompute(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, seed_ref, *, d_true, f_true, eps, rate):
    f32 = jnp.float32
    i = pl.program_id(0)
    x = x_ref[...]
    x32 = x.astype(f32)
    lane_ok = jax.lax.broadcasted_iota(jnp.int32, x32.shape, 1) < d_true
    gamma = g_ref[...].astype(f32)
    beta = b_ref[...].astype(f32)
    y, xhat, rstd = _ln_fwd(x32, d_true, eps, gamma, beta, lane_ok)

    w1 = w1_ref[...]
    prec = jax.lax.Precision.HIGHEST if w1.dtype == f32 else jax.lax.Precision.DEFAULT
    h = jax.lax.dot_general(y.astype(w1.dtype), w1, (((1,), (0,)), ((), ())), preferred_element_type=f32, precision=prec)
    h = h + b1_ref[...].astype(f32)
    # padded F lanes: w1/b1 zero-padded → h=0 → swish(0)=0; safe for W2 (rows zero-padded)
    sig = jax.nn.sigmoid(h)
    a = h * sig
    if rate > 0.0:
        keep1 = _dropout_mask(seed_ref[0] + i * jnp.int32(_SALT_STEP), a.shape, rate)
        ad = a * keep1
    else:
        keep1 = None
        ad = a
    w2 = w2_ref[...]
    z = jax.lax.dot_general(ad.astype(w2.dtype), w2, (((1,), (0,)), ((), ())), preferred_element_type=f32, precision=prec)
    z = z + b2_ref[...].astype(f32)
    z = jnp.where(lane_ok, z, 0.0)  # b2 broadcast would leak into padded lanes
    if rate > 0.0:
        keep2 = _dropout_mask(seed_ref[0] + i * jnp.int32(_SALT_STEP) + jnp.int32(_SALT_SITE2), z.shape, rate)
        z = z * keep2
    else:
        keep2 = None
    return x32, lane_ok, gamma, y, xhat, rstd, h, sig, a, keep1, ad, z, keep2, prec


def _fwd_kernel(seed_ref, x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, d_true, f_true, eps, rate, factor):
    x32, _, _, _, _, _, _, _, _, _, _, z, _, _ = _recompute(
        x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, seed_ref, d_true=d_true, f_true=f_true, eps=eps, rate=rate
    )
    o_ref[...] = (x32 + factor * z).astype(o_ref.dtype)


def _bwd_kernel(
    seed_ref, x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, do_ref,
    dx_ref, dg_ref, db_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
    *, d_true, f_true, eps, rate, factor,
):
    f32 = jnp.float32
    i = pl.program_id(0)
    x32, lane_ok, gamma, y, xhat, rstd, h, sig, a, keep1, ad, _, keep2, prec = _recompute(
        x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, seed_ref, d_true=d_true, f_true=f_true, eps=eps, rate=rate
    )

    @pl.when(i == 0)
    def _init():
        dg_ref[...] = jnp.zeros_like(dg_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    do = do_ref[...].astype(f32)  # [TR, Dp]; padded rows/lanes are 0
    dz = factor * do
    if rate > 0.0:
        dz = dz * keep2
    dz = jnp.where(lane_ok, dz, 0.0)
    db2_ref[...] += jnp.sum(dz, axis=0, keepdims=True)
    dw2_ref[...] += jax.lax.dot_general(ad, dz, (((0,), (0,)), ((), ())), preferred_element_type=f32, precision=prec)
    w2 = w2_ref[...]
    da = jax.lax.dot_general(dz.astype(w2.dtype), w2, (((1,), (1,)), ((), ())), preferred_element_type=f32, precision=prec)
    if rate > 0.0:
        da = da * keep1
    # swish' = sig + h·sig·(1−sig)
    dh = da * (sig + h * sig * (1.0 - sig))
    db1_ref[...] += jnp.sum(dh, axis=0, keepdims=True)
    dw1_ref[...] += jax.lax.dot_general(y, dh, (((0,), (0,)), ((), ())), preferred_element_type=f32, precision=prec)
    w1 = w1_ref[...]
    dy = jax.lax.dot_general(dh.astype(w1.dtype), w1, (((1,), (1,)), ((), ())), preferred_element_type=f32, precision=prec)
    # LN backward: y = xhat·γ + β
    dg_ref[...] += jnp.sum(dy * xhat, axis=0, keepdims=True)
    db_ref[...] += jnp.sum(jnp.where(lane_ok, dy, 0.0), axis=0, keepdims=True)
    dxn = jnp.where(lane_ok, dy * gamma, 0.0)
    inv_d = 1.0 / d_true
    m1 = jnp.sum(dxn, axis=1, keepdims=True) * inv_d
    m2 = jnp.sum(dxn * xhat, axis=1, keepdims=True) * inv_d
    dx_ln = rstd * (dxn - m1 - xhat * m2)
    dx_ref[...] = jnp.where(lane_ok, do + dx_ln, 0.0).astype(dx_ref.dtype)


def _pack(x, gamma, beta, w1, b1, w2, b2):
    """Row-pad x to a tile multiple; lane dims stay UNPADDED — Pallas block
    dims equal to the array dims let Mosaic handle the sub-tile (144→2×128
    masked) layout internally, so no [N, Dp] pad/unpad copies hit HBM."""
    n, d = x.shape
    f = w1.shape[1]
    tr = _row_tile(n)
    npad = round_up(n, tr)
    xp = jnp.pad(x, ((0, npad - n), (0, 0)))
    return xp, gamma.reshape(1, d), beta.reshape(1, d), w1, b1.reshape(1, f), w2, b2.reshape(1, d), (n, d, f, npad, tr, d, f)


def _specs(tr, dp, fp):
    xspec = pl.BlockSpec((tr, dp), lambda i, *_: (i, 0))
    const = lambda shape: pl.BlockSpec(shape, lambda i, *_: (0,) * len(shape))
    return (
        xspec,
        const((1, dp)),  # gamma
        const((1, dp)),  # beta
        const((dp, fp)),  # w1
        const((1, fp)),  # b1
        const((fp, dp)),  # w2
        const((1, dp)),  # b2
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def fused_ff(x, gamma, beta, w1, b1, w2, b2, seed, rate: float = 0.0, factor: float = 0.5, eps: float = 1e-3, interpret: bool = False):
    """x + factor · drop(W2 · drop(swish(W1 · LN(x) + b1)) + b2).

    x: [N, D] (rows = flattened batch·time); gamma/beta: [D] LN params;
    w1: [D, F], w2: [F, D] (+biases) in compute dtype; seed: int32 scalar
    for both in-kernel dropout sites (ignored when rate == 0). Returns
    [N, D] in x.dtype. LN stats and the residual add run in f32.
    """
    out, _ = _vjp_fwd(x, gamma, beta, w1, b1, w2, b2, seed, rate, factor, eps, interpret)
    return out


def _vjp_fwd(x, gamma, beta, w1, b1, w2, b2, seed, rate, factor, eps, interpret):
    interpret = interpret or jax.default_backend() == "cpu"
    xp, gp, bp, w1p, b1p, w2p, b2p, (n, d, f, npad, tr, dp, fp) = _pack(x, gamma, beta, w1, b1, w2, b2)
    specs = _specs(tr, dp, fp)
    grid_spec = pltpu.PrefetchScalarGridSpec(num_scalar_prefetch=1, grid=(npad // tr,), in_specs=list(specs), out_specs=[specs[0]])
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, d_true=d, f_true=f, eps=eps, rate=rate, factor=factor),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((npad, dp), x.dtype)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), xp, gp, bp, w1p, b1p, w2p, b2p)[0]
    return out[:n, :d], (x, gamma, beta, w1, b1, w2, b2, seed)


def _vjp_bwd(rate, factor, eps, interpret, res, g):
    x, gamma, beta, w1, b1, w2, b2, seed = res
    interpret_ = interpret or jax.default_backend() == "cpu"
    xp, gp, bp, w1p, b1p, w2p, b2p, (n, d, f, npad, tr, dp, fp) = _pack(x, gamma, beta, w1, b1, w2, b2)
    dop = jnp.pad(g.astype(jnp.float32), ((0, npad - n), (0, dp - d)))
    specs = _specs(tr, dp, fp)
    f32 = jnp.float32
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(npad // tr,),
        in_specs=list(specs) + [specs[0]],
        out_specs=[pl.BlockSpec((tr, dp), lambda i, *_: (i, 0))] + list(_specs(tr, dp, fp))[1:],
    )
    dx, dg, db, dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(_bwd_kernel, d_true=d, f_true=f, eps=eps, rate=rate, factor=factor),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((npad, dp), f32),
            jax.ShapeDtypeStruct((1, dp), f32),
            jax.ShapeDtypeStruct((1, dp), f32),
            jax.ShapeDtypeStruct((dp, fp), f32),
            jax.ShapeDtypeStruct((1, fp), f32),
            jax.ShapeDtypeStruct((fp, dp), f32),
            jax.ShapeDtypeStruct((1, dp), f32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret_,
    )(jnp.asarray(seed, jnp.int32).reshape(1), xp, gp, bp, w1p, b1p, w2p, b2p, dop)
    return (
        dx[:n, :d].astype(x.dtype),
        dg[0, :d].astype(gamma.dtype),
        db[0, :d].astype(beta.dtype),
        dw1[:d, :f].astype(w1.dtype),
        db1[0, :f].astype(b1.dtype),
        dw2[:f, :d].astype(w2.dtype),
        db2[0, :d].astype(b2.dtype),
        None,
    )


fused_ff.defvjp(_vjp_fwd, _vjp_bwd)
