"""Fused attention kernel: QKᵀ + additive bias → f32 softmax → (dropout) → PV
in one VMEM pass, with a recompute-based backward.

Motivation (measured, v5e, Conformer-S bs16×16 s): the 16-block rel-MHSA
stack costs 48.5 ms of the 121 ms train step — dominated not by FLOPs
(~0.3 ms of GEMMs at peak) but by HBM round-trips of score-shaped tensors:
content scores [B,H,T,S] bf16, f32 upcast for the masked softmax, f32
probs, bf16 downcast — ~10 such passes per block per direction. This
kernel keeps every [T, S] tile in VMEM; only the inputs (q/k/v, one
combined additive-bias tensor) and the context output touch HBM — the
softmax stats are recomputed in the backward rather than stored, because a
[BH, T, 1] f32 output tile-pads its minor dim to 128 lanes (128× memory:
the round-4 bs128 OOM traced to 16 blocks × 100 MB of padded lse).

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


def _softmax_rows(s):
    """f32 softmax over lanes with its stats kept in-register: [Tp, Sp] →
    (pn, m, l). Emitting the [T, 1] stats to HBM is a trap: XLA tiles f32
    minor dims to 128 lanes, so a [BH, T, 1] output allocates 128× its
    size (100 MB per block at bs128 — the round-4 OOM), which is why the
    backward RECOMPUTES the stats instead of loading an lse residual."""
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    return p / l, m, l


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, *, s_true: int, rate: float):
    f32 = jnp.float32
    bh = pl.program_id(0)
    q = q_ref[0]  # [Tp, Dp] (dtype)
    k = k_ref[0]
    v = v_ref[0]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=f32)  # [Tp, Sp]
    s = s + bias_ref[0].astype(f32)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < s_true, s, NEG_PAD)

    pn, _, _ = _softmax_rows(s)
    if rate > 0.0:
        pn = pn * _dropout_mask(seed_ref[0] + bh * jnp.int32(40499), pn.shape, rate)
    o_ref[0] = jax.lax.dot_general(pn.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=f32).astype(o_ref.dtype)


def _bwd_kernel(
    seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref,
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
    pn, _, _ = _softmax_rows(s)  # stats recomputed, not loaded (see _softmax_rows)

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
    # delta = Σ_d do ⊙ out, with out RECOMPUTED (one extra small MXU pass)
    # instead of stored: a [BH, T, D] residual per block tile-pads its
    # D=36 lanes to 128 (3.6×, 50 MB/block at bs128). Replaying the
    # forward's dtype round-trip keeps delta bit-identical to stored-out.
    o = jax.lax.dot_general(pd.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=f32)
    o = o.astype(q_ref.dtype).astype(f32)
    delta = jnp.sum(do * o, axis=1, keepdims=True)  # [Tp, 1] in-register
    ds = pn * (dpn - delta)  # [Tp, Sp]
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
    return qspec, kspec, bspec


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
    qspec, kspec, bspec = _specs(bh, tp, sp, dp, bias.shape[0])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh,),
        in_specs=[qspec, kspec, kspec, bspec],
        out_specs=qspec,
    )
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, s_true=s, rate=rate),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bh, tp, dp), q.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), qp, kp, vp, biasp)
    return out[:, :t, :d]


def _fwd(q, k, v, bias, seed, rate, interpret):
    interpret = interpret or jax.default_backend() == "cpu"
    out = _run_fwd(q, k, v, bias, seed, rate, interpret)
    return out, (q, k, v, bias, seed)


def _bwd(rate, interpret, res, g):
    q, k, v, bias, seed = res
    interpret = interpret or jax.default_backend() == "cpu"
    bh, t, d = q.shape
    s = k.shape[1]
    tp, sp, dp = _subl(t), _lanes(s), _lanes(d)
    qp = _pad3(q, tp, dp)
    kp = _pad3(k, sp, dp)
    vp = _pad3(v, sp, dp)
    biasp = jnp.pad(bias, ((0, 0), (0, tp - t), (0, sp - s)))
    dop = _pad3(g.astype(jnp.float32), tp, dp)

    qspec, kspec, bspec = _specs(bh, tp, sp, dp, bias.shape[0])
    dbspec = pl.BlockSpec((1, tp, sp), lambda i, *_: (i, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh,),
        in_specs=[qspec, kspec, kspec, bspec, qspec],
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
    )(jnp.asarray(seed, jnp.int32).reshape(1), qp, kp, vp, biasp, dop)

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


# --------------------------------------------------------------------------- #
# Relative-position attention, fully fused (kernel B)
#
# The bias-as-input kernel above still materializes a per-block [B,H,T,S]
# bias (positional term + mask) in HBM — measured roughly break-even with
# XLA at Conformer-S shapes because that traffic cancels the softmax win.
# This variant computes the Transformer-XL relative term INSIDE the kernel:
#   W = qp @ posᵀ                                  [T, R] on the MXU
#   rel[i, s] = W[i, s + (T-1-i)]                  per-row left shift
# The shift is the exact element mapping of attention.rel_left_shift for
# BOTH its causal (R = M+T) and non-causal (R = M+2T-1) variants (derived
# from its pad/flatten/reshape arithmetic; out-of-range → 0 like the XLA
# zero-padding). A per-row dynamic lane shift is an unsupported Mosaic
# relayout, so it runs as a BARREL SHIFTER: ceil(log2(T)) static
# pltpu.roll steps, selecting per row on the shift amount's bits — VPU
# work on a VMEM-resident [T, R] tile, no HBM.
#
# Masking: KV-column masks (padded keys / streaming memory slots) enter as
# one additive [B, 1, S] row, query-row validity as a [B, T, 1] column, and
# causal / chunked-streaming visibility (compute_streaming_mask) is rebuilt
# in-kernel from iota comparisons with static chunk parameters; the merge
# reproduces Keras's AND + single −1e9 semantics including its f32
# absorption (see _rel_scores). Backward emits dqc, dqp, dk, dv, dpos — no
# score-shaped gradient ever exists in HBM.
# --------------------------------------------------------------------------- #


def _rel_shift(w, t_true: int, s_cols: int, r_true: int, extra: int, reverse: bool):
    """Barrel shifter: row i of ``w [Tp, Rp]`` shifted left by
    (t_true-1-i) + ``extra`` (``reverse=False``), or the transpose-map right
    shift for the backward (``reverse=True``, input cols [0, s_cols)
    occupied). ``extra`` reproduces the XLA path's trailing ``[..., -S:]``
    column slice, which is non-trivial when relpe is longer than the actual
    key length needs (memory-configured encoder running without memory):
    extra = (R−T+1)−S non-causal, R−S causal-PE. Out-of-range lanes are
    zeroed to match rel_left_shift's zero padding."""
    tp, rp = w.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (tp, rp), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (tp, rp), 1)
    shift = jnp.maximum(t_true - 1 - row + extra, 0)  # padded rows: clamp, discarded later
    bit = 1
    while bit < max(t_true + extra, 1):
        sel = (shift & bit) != 0
        rolled = pltpu.roll(w, rp - bit if not reverse else bit, axis=1)
        w = jnp.where(sel, rolled, w)
        bit <<= 1
    if reverse:
        # dW[i, j] = ds[i, j - shift_i] for j-shift_i in [0, s_cols)
        valid = (col >= shift) & (col - shift < s_cols) & (col < r_true)
    else:
        # rel[i, s] = W[i, s + shift_i] for s + shift_i < r_true
        valid = col + shift < r_true
    return jnp.where(valid, w, 0.0)


def _inkernel_vis_bias(t: int, s: int, shape, causal: bool, chunk_size, history_size):
    """Additive −1e9 visibility term for causal/chunked-streaming attention
    (compute_streaming_mask semantics), built from iotas — [Tp, Sp] f32."""
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    frame = col - (s - t)  # prepended-memory columns sit at negative frames
    allowed = jnp.ones(shape, bool)
    if causal:
        allowed = frame <= row
    if chunk_size is not None and history_size is not None:
        hist = s if history_size < 0 else history_size
        chunk_start = (row // chunk_size) * chunk_size
        allowed = allowed & (frame >= chunk_start - hist) & (frame < chunk_start + chunk_size)
    return jnp.where(allowed, 0.0, -1e9)


def _rel_scores(qc_ref, qp_ref, k_ref, pos_ref, kvb_ref, qlen, *, t, s_true, r_true, extra, causal, chunk_size, history_size):
    f32 = jnp.float32
    qc = qc_ref[0]
    qp = qp_ref[0]
    k = k_ref[0]
    pos = pos_ref[0]
    s = jax.lax.dot_general(qc, k, (((1,), (1,)), ((), ())), preferred_element_type=f32)  # [Tp, Sp]
    w = jax.lax.dot_general(qp, pos, (((1,), (1,)), ((), ())), preferred_element_type=f32)  # [Tp, Rp]
    rel = _rel_shift(w, t, s_true, r_true, extra, reverse=False)[:, : s.shape[1]]
    s = s + rel
    # Keras-parity mask merge: the XLA path ANDs query/kv/visibility masks
    # then adds a single −1e9 in f32. Parity subtleties reproduced here:
    # stacked column terms clamp to −1e9 (AND, not sum), and a masked QUERY
    # row adds −1e9 to every column — which is NOT a softmax no-op in f32:
    # ulp(1e9)=64 absorbs O(1) score differences, so the reference's masked
    # rows attend ~uniformly. Adding the same −1e9 in-kernel (f32) absorbs
    # identically. The query-row validity arrives as a per-batch LENGTH in
    # the scalar-prefetch channel (rows < qlen) — a [B, T, 1] f32 operand
    # would lane-pad 128× (99 MB of HLO temp per block at bs128, the r4
    # bs128-OOM's second term).
    qvalid = None
    if qlen is not None:
        qvalid = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) < qlen
    add = None
    if kvb_ref is not None:
        add = jnp.broadcast_to(kvb_ref[0].astype(f32), s.shape)
    if causal or (chunk_size is not None and history_size is not None):
        visb = _inkernel_vis_bias(t, s_true, s.shape, causal, chunk_size, history_size)
        add = visb if add is None else add + visb
    if add is not None:
        add = jnp.maximum(add, -1e9)
        if qvalid is not None:
            add = jnp.where(qvalid, add, jnp.float32(-1e9))
        s = s + add
    elif qvalid is not None:
        s = s + jnp.where(qvalid, jnp.float32(0.0), jnp.float32(-1e9))
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    return jnp.where(col < s_true, s, NEG_PAD)


def _qlen_of(scal_ref, has_qlen: bool, heads: int):
    """Per-batch query length from the scalar-prefetch row ([seed, len_0..]),
    or None when no query mask was given."""
    if not has_qlen:
        return None
    return scal_ref[1 + pl.program_id(0) // heads]


def _rel_fwd_kernel(seed_ref, qc_ref, qp_ref, k_ref, v_ref, pos_ref, kvb_ref, o_ref, *, t, s_true, r_true, extra, causal, chunk_size, history_size, rate, has_qlen, heads):
    f32 = jnp.float32
    bh = pl.program_id(0)
    qlen = _qlen_of(seed_ref, has_qlen, heads)
    s = _rel_scores(qc_ref, qp_ref, k_ref, pos_ref, kvb_ref, qlen, t=t, s_true=s_true, r_true=r_true, extra=extra, causal=causal, chunk_size=chunk_size, history_size=history_size)
    pn, _, _ = _softmax_rows(s)
    if rate > 0.0:
        pn = pn * _dropout_mask(seed_ref[0] + bh * jnp.int32(40499), pn.shape, rate)
    v = v_ref[0]
    o_ref[0] = jax.lax.dot_general(pn.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=f32).astype(o_ref.dtype)


def _rel_bwd_kernel(
    seed_ref, qc_ref, qp_ref, k_ref, v_ref, pos_ref, kvb_ref, do_ref,
    dqc_ref, dqp_ref, dk_ref, dv_ref, dpos_ref,
    *, t, s_true, r_true, extra, causal, chunk_size, history_size, rate, has_qlen, heads,
):
    f32 = jnp.float32
    bh = pl.program_id(0)
    qlen = _qlen_of(seed_ref, has_qlen, heads)
    s = _rel_scores(qc_ref, qp_ref, k_ref, pos_ref, kvb_ref, qlen, t=t, s_true=s_true, r_true=r_true, extra=extra, causal=causal, chunk_size=chunk_size, history_size=history_size)
    pn, _, _ = _softmax_rows(s)  # stats recomputed, not loaded (see _softmax_rows)
    do = do_ref[0].astype(f32)
    v = v_ref[0]
    if rate > 0.0:
        keep = _dropout_mask(seed_ref[0] + bh * jnp.int32(40499), pn.shape, rate)
        pd = pn * keep
    else:
        pd = pn
    dv_ref[0] = jax.lax.dot_general(pd, do, (((0,), (0,)), ((), ())), preferred_element_type=f32).astype(dv_ref.dtype)
    dpn = jax.lax.dot_general(do, v.astype(f32), (((1,), (1,)), ((), ())), preferred_element_type=f32)
    if rate > 0.0:
        dpn = dpn * keep
    # delta = Σ_d do ⊙ out, with out RECOMPUTED (one extra small MXU pass)
    # rather than stored — see _bwd_kernel: a [BH, T, D] residual per block
    # tile-pads D=36→128 lanes (3.6×). Replaying the forward's dtype
    # round-trip keeps delta bit-identical to stored-out.
    o = jax.lax.dot_general(pd.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=f32)
    o = o.astype(qc_ref.dtype).astype(f32)
    delta = jnp.sum(do * o, axis=1, keepdims=True)  # [Tp, 1] in-register
    ds = pn * (dpn - delta)  # [Tp, Sp]

    qc = qc_ref[0]
    qp = qp_ref[0]
    k = k_ref[0]
    pos = pos_ref[0]
    dqc_ref[0] = jax.lax.dot_general(ds.astype(k.dtype), k, (((1,), (0,)), ((), ())), preferred_element_type=f32).astype(dqc_ref.dtype)
    dk_ref[0] = jax.lax.dot_general(ds.astype(qc.dtype), qc, (((0,), (0,)), ((), ())), preferred_element_type=f32).astype(dk_ref.dtype)

    # rel term backward: dW = reverse-shift(ds) zero-padded to [Tp, Rp]
    rp = pos.shape[0]
    sp = ds.shape[1]
    dspad = jnp.pad(ds, ((0, 0), (0, rp - sp))) if rp > sp else ds[:, :rp]
    dw = _rel_shift(dspad, t, s_true, r_true, extra, reverse=True)
    dqp_ref[0] = jax.lax.dot_general(dw.astype(pos.dtype), pos, (((1,), (0,)), ((), ())), preferred_element_type=f32).astype(dqp_ref.dtype)
    dpos_ref[0] = jax.lax.dot_general(dw.astype(qp.dtype), qp, (((0,), (0,)), ((), ())), preferred_element_type=f32).astype(dpos_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13))
def fused_rel_attention(qc, qp, k, v, pos, kv_bias, q_len, seed, rate: float = 0.0, causal: bool = False, chunk_size=None, history_size=None, interpret: bool = False, pe_causal: bool = False):
    """Transformer-XL relative attention, fully fused per (b·h) grid step.

    qc/qp: [BH, T, D] content/positional queries (bias-added, scaled);
    k/v: [BH, S, D]; pos: [BH, R, D] projected relative PE (R = M+2T-1
    non-causal, M+T causal); kv_bias: [B, 1, S] additive f32 (key-column
    mask term; H consecutive grid steps share one row) or None; q_len:
    s32[B] per-batch query VALID LENGTH (rows ≥ q_len[b] get −1e9 on every
    column — Keras-parity quirk, see _rel_scores; rides the scalar-prefetch
    channel so no lane-padded [B, T, 1] operand exists) or None; seed:
    int32 scalar for in-kernel probs dropout. Visibility (causal /
    chunk+history streaming) is rebuilt in-kernel from static params.
    Returns [BH, T, D] in qc.dtype.
    """
    out, _ = _rel_vjp_fwd(qc, qp, k, v, pos, kv_bias, q_len, seed, rate, causal, chunk_size, history_size, interpret, pe_causal)
    return out


def _rel_pack(qc, qp, k, v, pos, kv_bias):
    """Lane/sublane dims stay UNPADDED where Pallas block dims can equal the
    array dims (q/k/v head dim, T) — no pad/unpad copies in HBM. Two
    exceptions that must be physically 128-aligned: pos rows (they become
    the lane dim of the in-kernel [T, R] tensor that ``pltpu.roll``
    rotates) and k/v rows when S's physical padding would land on exactly
    384 lanes — the bisected axon hang bucket — which get bumped to 512
    (scores cols ≥ s_true are already masked)."""
    bh, t, d = qc.shape
    s = k.shape[1]
    r = pos.shape[1]
    sp = 512 if round_up(s, 128) == 384 else s
    rp = _lanes(r)
    pad_rows = lambda x, n: x if x.shape[1] == n else jnp.pad(x, ((0, 0), (0, n - x.shape[1]), (0, 0)))
    return (
        qc,
        qp,
        pad_rows(k, sp),
        pad_rows(v, sp),
        pad_rows(pos, rp),
        None if kv_bias is None else (kv_bias if sp == s else jnp.pad(kv_bias, ((0, 0), (0, 0), (0, sp - s)))),
        (bh, t, s, r, t, sp, rp, d),
    )


def _rel_build(heads, tp, sp, rp, dp, kvbp):
    """(specs, operands) for the optional mask inputs, shared fwd/bwd."""
    qspec = pl.BlockSpec((1, tp, dp), lambda i, *_: (i, 0, 0))
    kspec = pl.BlockSpec((1, sp, dp), lambda i, *_: (i, 0, 0))
    pspec = pl.BlockSpec((1, rp, dp), lambda i, *_: (i, 0, 0))
    opt_specs, opt_ops = [], []
    if kvbp is not None:
        opt_specs.append(pl.BlockSpec((1, 1, sp), lambda i, *_: (i // heads, 0, 0)))
        opt_ops.append(kvbp)
    return qspec, kspec, pspec, opt_specs, opt_ops


def _split_opt(refs, has_kvb, n_rest):
    """refs → (main..., kvb_r, rest...) given the optional layout."""
    n_main = 5
    i = n_main
    kvb_r = None
    if has_kvb:
        kvb_r = refs[i]
        i += 1
    return refs[:n_main], kvb_r, refs[i:]


def _scal_row(seed, q_len):
    """Scalar-prefetch row: [seed] or [seed, len_0..len_{B-1}] (s32)."""
    seed = jnp.asarray(seed, jnp.int32).reshape(1)
    if q_len is None:
        return seed
    return jnp.concatenate([seed, jnp.asarray(q_len, jnp.int32).reshape(-1)])


def _rel_vjp_fwd(qc, qp, k, v, pos, kv_bias, q_len, seed, rate, causal, chunk_size, history_size, interpret, pe_causal=False):
    interpret = interpret or jax.default_backend() == "cpu"
    qcp, qpp, kp, vp, posp, kvbp, (bh, t, s, r, tp, sp, rp, dp) = _rel_pack(qc, qp, k, v, pos, kv_bias)
    bdim = kv_bias.shape[0] if kv_bias is not None else (q_len.shape[0] if q_len is not None else bh)
    heads = max(1, bh // max(1, bdim))
    qspec, kspec, pspec, opt_specs, opt_ops = _rel_build(heads, tp, sp, rp, dp, kvbp)
    has_kvb, has_qv = kvbp is not None, q_len is not None
    extra = (r - s) if pe_causal else (r - t + 1 - s)  # XLA [..., -S:] slice offset
    assert extra >= 0, (t, s, r, pe_causal)

    def kern(seed_ref, *refs):
        (qc_r, qp_r, k_r, v_r, pos_r), kvb_r, rest = _split_opt(refs, has_kvb, 1)
        (o_r,) = rest
        _rel_fwd_kernel(
            seed_ref, qc_r, qp_r, k_r, v_r, pos_r, kvb_r, o_r,
            t=t, s_true=s, r_true=r, extra=extra, causal=causal, chunk_size=chunk_size, history_size=history_size, rate=rate,
            has_qlen=has_qv, heads=heads,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(bh,), in_specs=[qspec, qspec, kspec, kspec, pspec] + opt_specs, out_specs=qspec
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bh, tp, dp), qc.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(_scal_row(seed, q_len), qcp, qpp, kp, vp, posp, *opt_ops)
    out = out[:, :t, : qc.shape[2]]
    return out, (qc, qp, k, v, pos, kv_bias, q_len, seed)


def _rel_vjp_bwd(rate, causal, chunk_size, history_size, interpret, pe_causal, res, g):
    qc, qp, k, v, pos, kv_bias, q_len, seed = res
    interpret_ = interpret or jax.default_backend() == "cpu"
    qcp, qpp, kp, vp, posp, kvbp, (bh, t, s, r, tp, sp, rp, dp) = _rel_pack(qc, qp, k, v, pos, kv_bias)
    bdim = kv_bias.shape[0] if kv_bias is not None else (q_len.shape[0] if q_len is not None else bh)
    heads = max(1, bh // max(1, bdim))
    qspec, kspec, pspec, opt_specs, opt_ops = _rel_build(heads, tp, sp, rp, dp, kvbp)
    has_kvb, has_qv = kvbp is not None, q_len is not None
    dop = _pad3(g.astype(jnp.float32), tp, dp)

    extra = (r - s) if pe_causal else (r - t + 1 - s)

    def kern(seed_ref, *refs):
        (qc_r, qp_r, k_r, v_r, pos_r), kvb_r, rest = _split_opt(refs, has_kvb, 6)
        do_r, dqc_r, dqp_r, dk_r, dv_r, dpos_r = rest
        _rel_bwd_kernel(
            seed_ref, qc_r, qp_r, k_r, v_r, pos_r, kvb_r, do_r,
            dqc_r, dqp_r, dk_r, dv_r, dpos_r,
            t=t, s_true=s, r_true=r, extra=extra, causal=causal, chunk_size=chunk_size, history_size=history_size, rate=rate,
            has_qlen=has_qv, heads=heads,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh,),
        in_specs=[qspec, qspec, kspec, kspec, pspec] + opt_specs + [qspec],
        out_specs=[qspec, qspec, kspec, kspec, pspec],
    )
    dqc, dqp, dk, dv, dpos = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bh, tp, dp), jnp.float32),
            jax.ShapeDtypeStruct((bh, tp, dp), jnp.float32),
            jax.ShapeDtypeStruct((bh, sp, dp), jnp.float32),
            jax.ShapeDtypeStruct((bh, sp, dp), jnp.float32),
            jax.ShapeDtypeStruct((bh, rp, dp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret_,
    )(_scal_row(seed, q_len), qcp, qpp, kp, vp, posp, *opt_ops, dop)

    d = qc.shape[2]
    return (
        dqc[:, :t, :d].astype(qc.dtype),
        dqp[:, :t, :d].astype(qp.dtype),
        dk[:, :s, :d].astype(k.dtype),
        dv[:, :s, :d].astype(v.dtype),
        dpos[:, :r, :d].astype(pos.dtype),
        None,
        None,
        None,
    )


fused_rel_attention.defvjp(_rel_vjp_fwd, _rel_vjp_bwd)


def rel_attention_shapes_supported(t: int, s: int, r: int) -> bool:
    """VMEM budget: ~3 [Tp, Rp] + ~4 [Tp, Sp] f32 tiles live in bwd."""
    tp, sp, rp = _subl(t), _lanes(s), _lanes(r)
    return (3 * tp * rp + 4 * tp * sp) * 4 <= 64 * 1024 * 1024
