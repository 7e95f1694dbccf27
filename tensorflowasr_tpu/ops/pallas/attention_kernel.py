"""Fused attention kernel: QKᵀ + additive bias → f32 softmax → (dropout) → PV
in one VMEM pass, with a recompute-based backward.

Motivation (measured, v5e, Conformer-S bs16×16 s): the 16-block rel-MHSA
stack costs 48.5 ms of the 121 ms train step — dominated not by FLOPs
(~0.3 ms of GEMMs at peak) but by HBM round-trips of score-shaped tensors:
content scores [B,H,T,S] bf16, f32 upcast for the masked softmax, f32
probs, bf16 downcast — ~10 such passes per block per direction. This
kernel keeps every [T, S] tile in VMEM; only the inputs (q/k/v, one
combined additive-bias tensor) and outputs (context, lse) touch HBM.

The relative-position term and the −1e9 mask term are NOT computed here:
they are XLA-side (`rel_left_shift` skew + mask merge, attention.py) and
enter as one additive ``bias [B|1, H|1, T, S]`` operand. Fusing the rel
term would need a per-row lane shift inside the kernel — an unsupported
Mosaic relayout (CLAUDE.md "lane→sublane reshapes") — while bias-as-input
still removes the dominant f32 softmax traffic.

Dropout on attention probabilities (reference parity:
``multihead_attention.py:227`` applies Keras dropout to scores) runs
INSIDE the kernel with a counter-based hash PRNG: the keep mask is
regenerated bit-exactly in the backward from the same per-(b·h) seed, so
probs are never materialized even when training with dropout.

Grid is one step per (b·h): at ASR shapes the whole [T, S] score tile fits
VMEM comfortably (T=400 → 512×512 f32 = 1 MB; guarded up to ~64 MB of f32
tiles before falling back to XLA). Backward needs no cross-step
accumulation — each (b·h) owns its dk/dv block.

Replaces the hot path of the reference's
``models/layers/multihead_attention.py:216-582`` score/softmax/PV chain.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tensorflowasr_tpu.utils.math_util import round_up

NEG_PAD = -1e30  # structural padding for out-of-range key columns (f32)


def _lanes(n: int) -> int:
    """Lane padding with the 384→512 bump (the bisected axon hang region —
    see rnnt_kernel._padded_lanes)."""
    p = round_up(max(n, 1), 128)
    return 512 if p == 384 else p


def _subl(n: int) -> int:
    return round_up(max(n, 1), 16)


def _vmem_ok(tp: int, sp: int) -> bool:
    # ~4 live f32 [Tp, Sp] tiles in bwd; keep well under the 100 MB cap
    return 4 * tp * sp * 4 <= 64 * 1024 * 1024


def _dropout_mask(seed, shape, rate: float):
    """Regenerable in-kernel dropout KEEP mask (f32, 1/(1-rate)-scaled).

    Counter-based murmur3-finalizer hash of (seed, row, col): bit-identical
    between the forward and backward kernels and across interpret/compiled
    modes (pltpu.prng_* has no CPU-interpret lowering), so probs never need
    materializing to keep the dropout pattern consistent."""
    r = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = (r * jnp.uint32(2654435761)) ^ (c * jnp.uint32(97538843)) ^ seed.astype(jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    # keep iff bits >= rate * 2^32 (exact threshold in uint32 space)
    thresh = jnp.uint32(min(int(rate * 4294967296.0), 4294967295))
    keep = (x >= thresh).astype(jnp.float32)
    return keep / jnp.float32(1.0 - rate)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *, s_true: int, rate: float):
    f32 = jnp.float32
    bh = pl.program_id(0)
    q = q_ref[0]  # [Tp, Dp] (dtype)
    k = k_ref[0]
    v = v_ref[0]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=f32)  # [Tp, Sp]
    s = s + bias_ref[0].astype(f32)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < s_true, s, NEG_PAD)

    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    lse_ref[0] = m + jnp.log(l)
    pn = p / l
    if rate > 0.0:
        pn = pn * _dropout_mask(seed_ref[0] + bh * jnp.int32(40499), pn.shape, rate)
    o_ref[0] = jax.lax.dot_general(pn.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=f32).astype(o_ref.dtype)


def _bwd_kernel(
    seed_ref, q_ref, k_ref, v_ref, bias_ref, lse_ref, do_ref, delta_ref,
    dq_ref, dk_ref, dv_ref, dbias_ref, *, s_true: int, rate: float
):
    f32 = jnp.float32
    bh = pl.program_id(0)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(f32)  # [Tp, Dp]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=f32)
    s = s + bias_ref[0].astype(f32)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < s_true, s, NEG_PAD)
    pn = jnp.exp(s - lse_ref[0])  # [Tp, Sp] softmax rows (lse = m + log l)

    if rate > 0.0:
        keep = _dropout_mask(seed_ref[0] + bh * jnp.int32(40499), pn.shape, rate)
        pd = pn * keep
    else:
        pd = pn

    # dv = pdᵀ @ do
    dv_ref[0] = jax.lax.dot_general(pd, do, (((0,), (0,)), ((), ())), preferred_element_type=f32).astype(dv_ref.dtype)
    # d(pn) = keep ⊙ (do @ vᵀ); softmax vjp: ds = pn ⊙ (dpn − delta), delta = Σ do⊙out
    dpn = jax.lax.dot_general(do, v.astype(f32), (((1,), (1,)), ((), ())), preferred_element_type=f32)
    if rate > 0.0:
        dpn = dpn * keep
    ds = pn * (dpn - delta_ref[0])  # [Tp, Sp]
    dbias_ref[0] = ds.astype(dbias_ref.dtype)
    dq_ref[0] = jax.lax.dot_general(ds.astype(k.dtype), k, (((1,), (0,)), ((), ())), preferred_element_type=f32).astype(dq_ref.dtype)
    dk_ref[0] = jax.lax.dot_general(ds.astype(q.dtype), q, (((0,), (0,)), ((), ())), preferred_element_type=f32).astype(dk_ref.dtype)


def _pad3(x, t, d):
    return jnp.pad(x, ((0, 0), (0, t - x.shape[1]), (0, d - x.shape[2])))


def _specs(bh, tp, sp, dp, bias_bh):
    """Block specs for (grid=(bh,)) over [BH, ...] operands; bias may have a
    broadcast leading dim (bias_bh == 1)."""
    # index maps take (grid_idx, scalar_prefetch_ref) under PrefetchScalarGridSpec
    qspec = pl.BlockSpec((1, tp, dp), lambda i, *_: (i, 0, 0))
    kspec = pl.BlockSpec((1, sp, dp), lambda i, *_: (i, 0, 0))
    bspec = pl.BlockSpec((1, tp, sp), (lambda i, *_: (0, 0, 0)) if bias_bh == 1 else (lambda i, *_: (i, 0, 0)))
    lspec = pl.BlockSpec((1, tp, 1), lambda i, *_: (i, 0, 0))
    return qspec, kspec, bspec, lspec


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_attention(q, k, v, bias, seed, rate: float = 0.0, interpret: bool = False):
    """softmax(q @ kᵀ + bias) @ v, per leading batch·head index.

    q: [BH, T, D], k/v: [BH, S, D], bias: [BH|1, T, S] additive (mask/-1e9
    and any positional term pre-added), seed: int32 scalar array (dropout
    stream; unused when rate == 0). Returns [BH, T, D] in q.dtype.

    Softmax runs in f32 regardless of input dtype; the probs→PV matmul in
    v.dtype (XLA-path parity). Dropout (rate > 0) uses an in-kernel hash
    PRNG regenerated in the backward — not the threefry stream of
    ``nn.Dropout``, which only changes which units drop, not the semantics.
    """
    out, _ = _fwd(q, k, v, bias, seed, rate, interpret)
    return out


def _run_fwd(q, k, v, bias, seed, rate, interpret):
    bh, t, d = q.shape
    s = k.shape[1]
    tp, sp, dp = _subl(t), _lanes(s), _lanes(d)
    qp = _pad3(q, tp, dp)
    kp = _pad3(k, sp, dp)
    vp = _pad3(v, sp, dp)
    biasp = jnp.pad(bias, ((0, 0), (0, tp - t), (0, sp - s)))
    qspec, kspec, bspec, lspec = _specs(bh, tp, sp, dp, bias.shape[0])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh,),
        in_specs=[qspec, kspec, kspec, bspec],
        out_specs=[qspec, lspec],
    )
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, s_true=s, rate=rate),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bh, tp, dp), q.dtype),
            jax.ShapeDtypeStruct((bh, tp, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), qp, kp, vp, biasp)
    return out[:, :t, :d], lse


def _fwd(q, k, v, bias, seed, rate, interpret):
    interpret = interpret or jax.default_backend() == "cpu"
    out, lse = _run_fwd(q, k, v, bias, seed, rate, interpret)
    return out, (q, k, v, bias, seed, lse, out)


def _bwd(rate, interpret, res, g):
    q, k, v, bias, seed, lse, out = res
    interpret = interpret or jax.default_backend() == "cpu"
    bh, t, d = q.shape
    s = k.shape[1]
    tp, sp, dp = _subl(t), _lanes(s), _lanes(d)
    qp = _pad3(q, tp, dp)
    kp = _pad3(k, sp, dp)
    vp = _pad3(v, sp, dp)
    biasp = jnp.pad(bias, ((0, 0), (0, tp - t), (0, sp - s)))
    dop = _pad3(g.astype(jnp.float32), tp, dp)
    # delta rows: Σ_d do ⊙ out — identical with or without dropout
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=2, keepdims=True)
    delta = jnp.pad(delta, ((0, 0), (0, tp - t), (0, 0)))
    lsep = jnp.pad(lse, ((0, 0), (0, 0), (0, 0)))

    qspec, kspec, bspec, lspec = _specs(bh, tp, sp, dp, bias.shape[0])
    dbspec = pl.BlockSpec((1, tp, sp), lambda i, *_: (i, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh,),
        in_specs=[qspec, kspec, kspec, bspec, lspec, qspec, lspec],
        out_specs=[qspec, kspec, kspec, dbspec],
    )
    dq, dk, dv, dbias = pl.pallas_call(
        functools.partial(_bwd_kernel, s_true=s, rate=rate),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bh, tp, dp), jnp.float32),
            jax.ShapeDtypeStruct((bh, sp, dp), jnp.float32),
            jax.ShapeDtypeStruct((bh, sp, dp), jnp.float32),
            jax.ShapeDtypeStruct((bh, tp, sp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), qp, kp, vp, biasp, lsep, dop, delta)

    dbias_full = dbias[:, :t, :s]
    if bias.shape[0] == 1:
        dbias_full = jnp.sum(dbias_full, axis=0, keepdims=True)
    return (
        dq[:, :t, :d].astype(q.dtype),
        dk[:, :s, :d].astype(k.dtype),
        dv[:, :s, :d].astype(v.dtype),
        dbias_full.astype(bias.dtype),
        None,
    )


fused_attention.defvjp(_fwd, _bwd)


def attention_shapes_supported(t: int, s: int) -> bool:
    """True when the whole [T, S] tile per (b·h) fits the VMEM budget."""
    return _vmem_ok(_subl(t), _lanes(s))
