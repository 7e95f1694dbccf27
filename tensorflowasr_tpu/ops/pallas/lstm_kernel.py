"""Fused LSTM layer: the whole time loop inside one Pallas kernel.

Motivation (measured, v5e, Conformer-S bs16×16 s): the prediction network's
129-step LSTM costs 5-7 ms of the ~65 ms train step while its math is ~17 µs
of MXU work — `lax.scan` pays XLA per-iteration dispatch on every one of the
129 (×2 for bwd) steps. This kernel keeps the recurrent weights and the
(h, c) carry VMEM-resident and runs the entire sequence as an in-kernel
``fori_loop``.

The sequential chain is latency-bound, not throughput-bound (B=16 rows use
16/128 of the MXU), so the design minimizes per-step dependency latency:

  - the input projection ``x @ Wx + b`` has no sequential dependency and is
    hoisted OUT of the loop into one big XLA GEMM over [B·T, E];
  - per forward step the kernel issues ONE matmul ``h @ Wh_flat`` with the
    four gate blocks concatenated in lanes ([Hp, 4·Hp]) — v1 issued four
    serialized [Hp, Hp] matmuls and measured break-even with XLA's scan;
  - per backward step the kernel issues ONE matmul ``da @ Whᵀ_flat``; the
    weight gradient needs no recurrence at all and is computed OUTSIDE the
    kernel as a single MXU-sized GEMM ``hprevᵀ @ dxg`` over the whole
    sequence (K = B·T), removing four per-step outer products and the f32
    [4, Hp, Hp] VMEM accumulator from the loop.

Backward stores the activated gates + cell sequence from the forward pass
(no recompute: storing is ~10 MB at the flagship shape and the backward is
itself a sequential scan) and runs standard LSTM BPTT reversed.

Gate order and semantics match ``flax.linen.OptimizedLSTMCell`` (i, f, g, o;
``c' = σ(f)·c + σ(i)·tanh(g)``, ``h' = σ(o)·tanh(c')``) so the kernel is a
drop-in for the reference's Keras LSTM layers (`utils/layer_util.py:21-39`,
prediction net `models/transducer/base_transducer.py:38-173`).

Lane padding: H=320 rounds to 384 lanes — the bisected axon hang bucket
(rnnt_kernel._padded_lanes) — so H-lane arrays pad to 512 instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tensorflowasr_tpu.utils.math_util import round_up

_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _padded_h(h: int) -> int:
    """H=320 rounds to 384 lanes — the bisected axon ROW-OP hang bucket —
    so it defaults to 512 (1.7× more MXU passes on the latency-critical
    recurrent matmul). The joint-loss kernel has since shipped 384-lane
    matmul tiles + elementwise safely (joint_loss_kernel._lanes_j), so
    TFASR_LSTM_PAD384=384 opts this kernel into the tighter padding for
    on-chip measurement; per-gate slice offsets k·384 stay 128-aligned."""
    import os

    hp = round_up(h, 128)
    if hp == 384 and os.environ.get("TFASR_LSTM_PAD384", "512") != "384":
        return 512
    return hp


def _time_tile(t: int) -> int:
    return min(round_up(t, 8), 32)


def lstm_shapes_supported(b: int, t: int, h: int) -> bool:
    """VMEM budget: xg/gates/dxg blocks (TT·B·4Hp) + Wh ([Hp, 4Hp]) +
    carries + y/cseq blocks must fit with double buffering."""
    hp, tt = _padded_h(h), _time_tile(t)
    bp = round_up(b, 8)
    blocks = tt * bp * 4 * hp * (2 + 2 + 4 + 4 + 4)  # xg+gates bf16, dy/dc/dxg f32
    weights = hp * 4 * hp * (2 + 2)  # Wh + WhT bf16
    carries = 8 * bp * hp * 4
    seqs = tt * bp * hp * (2 * 4)  # y/cseq/cprev blocks and bwd reads
    return 2 * blocks + weights + carries + 2 * seqs <= 80 * 1024 * 1024


def _fwd_kernel(xg_ref, wh_ref, h0_ref, c0_ref, y_ref, cseq_ref, gates_ref, h_scr, c_scr, *, tt, hp):
    """One T-tile grid step: tt sequential LSTM steps, carry in VMEM scratch.

    xg_ref: [tt, B, 4Hp] precomputed x@Wx+b, gate blocks (i,f,g,o) in lanes
    wh_ref: [Hp, 4Hp] recurrent weights     h0/c0: [B, Hp] initial carry
    y_ref/cseq_ref: [tt, B, Hp] outputs     gates_ref: [tt, B, 4Hp] saved
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        h_scr[...] = h0_ref[...].astype(jnp.float32)
        c_scr[...] = c0_ref[...].astype(jnp.float32)

    cdt = xg_ref.dtype
    prec = None if cdt == jnp.bfloat16 else jax.lax.Precision.HIGHEST

    def step(t, _):
        h = h_scr[...]
        c = c_scr[...]
        a = xg_ref[t].astype(jnp.float32) + jnp.dot(
            h.astype(cdt), wh_ref[...], preferred_element_type=jnp.float32, precision=prec
        )
        ig = jax.nn.sigmoid(a[:, 0 * hp : 1 * hp])
        fg = jax.nn.sigmoid(a[:, 1 * hp : 2 * hp])
        gg = jnp.tanh(a[:, 2 * hp : 3 * hp])
        og = jax.nn.sigmoid(a[:, 3 * hp : 4 * hp])
        c_new = fg * c + ig * gg
        h_new = og * jnp.tanh(c_new)
        y_ref[t] = h_new.astype(y_ref.dtype)
        cseq_ref[t] = c_new.astype(cseq_ref.dtype)
        gates_ref[t] = jnp.concatenate([ig, fg, gg, og], axis=-1).astype(gates_ref.dtype)
        h_scr[...] = h_new
        c_scr[...] = c_new
        return 0

    jax.lax.fori_loop(0, tt, step, 0)


def _bwd_kernel(dy_ref, dc_ref, gates_ref, cseq_ref, cprev_ref, wht_ref, dxg_ref, dh0_ref, dc0_ref, dh_scr, dc_scr, *, tt, hp):
    """Reversed T-tile grid step: LSTM BPTT with ONE matmul per step
    (``da @ Whᵀ``); the weight gradient is a whole-sequence GEMM outside."""
    i = pl.program_id(0)
    last = pl.num_programs(0) - 1

    @pl.when(i == 0)
    def _init():
        dh_scr[...] = jnp.zeros_like(dh_scr)
        dc_scr[...] = jnp.zeros_like(dc_scr)

    cdt = cseq_ref.dtype
    prec = None if cdt == jnp.bfloat16 else jax.lax.Precision.HIGHEST

    def step(k, _):
        t = tt - 1 - k
        g = gates_ref[t].astype(jnp.float32)
        ig = g[:, 0 * hp : 1 * hp]
        fg = g[:, 1 * hp : 2 * hp]
        gg = g[:, 2 * hp : 3 * hp]
        og = g[:, 3 * hp : 4 * hp]
        tc = jnp.tanh(cseq_ref[t].astype(jnp.float32))
        dh = dy_ref[t].astype(jnp.float32) + dh_scr[...]
        do = dh * tc
        dct = dh * og * (1.0 - tc * tc) + dc_scr[...] + dc_ref[t].astype(jnp.float32)
        cprev = cprev_ref[t].astype(jnp.float32)
        da = jnp.concatenate(
            [
                dct * gg * ig * (1.0 - ig),  # i (sigmoid')
                dct * cprev * fg * (1.0 - fg),  # f
                dct * ig * (1.0 - gg * gg),  # g (tanh')
                do * og * (1.0 - og),  # o
            ],
            axis=-1,
        )
        dxg_ref[t] = da.astype(dxg_ref.dtype)
        dh_scr[...] = jnp.dot(da.astype(cdt), wht_ref[...], preferred_element_type=jnp.float32, precision=prec)
        dc_scr[...] = dct * fg
        return 0

    jax.lax.fori_loop(0, tt, step, 0)

    @pl.when(i == last)
    def _final():
        dh0_ref[...] = dh_scr[...]
        dc0_ref[...] = dc_scr[...]


def _to_kernel_layout(xg: jax.Array, h: int, hp: int, tpad: int, bp: int):
    """[B, T, 4H] → [Tpad, B', 4·Hp] (gate blocks padded in lanes)."""
    b, t, _ = xg.shape
    xk = xg.reshape(b, t, 4, h).transpose(1, 0, 2, 3)
    xk = jnp.pad(xk, ((0, tpad - t), (0, bp - b), (0, 0), (0, hp - h)))
    return xk.reshape(tpad, bp, 4 * hp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def lstm_core(xg: jax.Array, wh: jax.Array, h0: jax.Array, c0: jax.Array, interpret: bool = False):
    """Recurrent part of an LSTM layer over a full sequence, in one kernel.

    xg: [B, T, 4H] precomputed ``x @ Wx + b`` (gate order i,f,g,o)
    wh: [H, 4H] recurrent kernel (same gate order); h0/c0: [B, H]
    Returns (y [B, T, H], cseq [B, T, H]) in xg.dtype — the hidden and cell
    state sequences (cseq lets the caller select a length-indexed final
    carry outside this boundary, keeping its VJP automatic).
    """
    y, cseq, _ = _fwd_impl(xg, wh, h0, c0, interpret)
    return y, cseq


def _fwd_impl(xg, wh, h0, c0, interpret):
    interpret = interpret or jax.default_backend() == "cpu"
    b, t, g4 = xg.shape
    h = g4 // 4
    hp, tt, bp = _padded_h(h), _time_tile(t), round_up(b, 8)
    tpad = round_up(t, tt)
    tiles = tpad // tt

    xk = _to_kernel_layout(xg, h, hp, tpad, bp)
    whk = jnp.pad(wh.reshape(h, 4, h), ((0, hp - h), (0, 0), (0, hp - h))).reshape(hp, 4 * hp).astype(xg.dtype)
    h0k = jnp.pad(h0, ((0, bp - b), (0, hp - h))).astype(xg.dtype)
    c0k = jnp.pad(c0, ((0, bp - b), (0, hp - h))).astype(xg.dtype)

    wh_spec = pl.BlockSpec((hp, 4 * hp), lambda i: (0, 0))
    carry_spec = pl.BlockSpec((bp, hp), lambda i: (0, 0))
    seq_spec = pl.BlockSpec((tt, bp, hp), lambda i: (i, 0, 0))
    gate_spec = pl.BlockSpec((tt, bp, 4 * hp), lambda i: (i, 0, 0))

    y, cseq, gates = pl.pallas_call(
        functools.partial(_fwd_kernel, tt=tt, hp=hp),
        grid=(tiles,),
        in_specs=[gate_spec, wh_spec, carry_spec, carry_spec],
        out_specs=[seq_spec, seq_spec, gate_spec],
        out_shape=[
            jax.ShapeDtypeStruct((tpad, bp, hp), xg.dtype),
            jax.ShapeDtypeStruct((tpad, bp, hp), xg.dtype),
            jax.ShapeDtypeStruct((tpad, bp, 4 * hp), xg.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((bp, hp), jnp.float32), pltpu.VMEM((bp, hp), jnp.float32)],
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(xk, whk, h0k, c0k)

    yout = y[:t, :b, :h].transpose(1, 0, 2)
    cout = cseq[:t, :b, :h].transpose(1, 0, 2)
    # zero-size dtype carriers: residual pytrees may only hold JAX arrays,
    # and the bwd must emit cotangents in the PRIMAL dtypes (ADVICE r4)
    primal_dtypes = tuple(jnp.zeros((0,), a.dtype) for a in (xg, wh, h0, c0))
    return yout, cout, (y, cseq, gates, whk, h0k, c0k, (b, t, h), primal_dtypes)


def _vjp_fwd(xg, wh, h0, c0, interpret):
    y, cseq, res = _fwd_impl(xg, wh, h0, c0, interpret)
    return (y, cseq), res


def _vjp_bwd(interpret, res, cts):
    dy, dcseq = cts
    yk, cseqk, gatesk, whk, h0k, c0k, (b, t, h), dtype_carriers = res
    xg_dt, wh_dt, h0_dt, c0_dt = (a.dtype for a in dtype_carriers)
    interpret = interpret or jax.default_backend() == "cpu"
    hp, tt, bp = _padded_h(h), _time_tile(t), round_up(b, 8)
    tpad = round_up(t, tt)
    tiles = tpad // tt
    f32 = jnp.float32

    def pad_seq(x):  # [B, T, H] → [Tpad, B', Hp]
        return jnp.pad(x.transpose(1, 0, 2), ((0, tpad - t), (0, bp - b), (0, hp - h)))

    dyk = pad_seq(dy.astype(f32))
    dck = pad_seq(dcseq.astype(f32))
    cprev = jnp.concatenate([c0k.astype(cseqk.dtype)[None], cseqk[:-1]], axis=0)
    hprev = jnp.concatenate([h0k.astype(yk.dtype)[None], yk[:-1]], axis=0)
    whtk = whk.T  # [4·Hp, Hp]

    wht_spec = pl.BlockSpec((4 * hp, hp), lambda i: (0, 0))
    carry_spec = pl.BlockSpec((bp, hp), lambda i: (0, 0))
    rev = lambda i: tiles - 1 - i
    seq_spec = pl.BlockSpec((tt, bp, hp), lambda i: (rev(i), 0, 0))
    gate_spec = pl.BlockSpec((tt, bp, 4 * hp), lambda i: (rev(i), 0, 0))

    dxg, dh0, dc0 = pl.pallas_call(
        functools.partial(_bwd_kernel, tt=tt, hp=hp),
        grid=(tiles,),
        in_specs=[seq_spec, seq_spec, gate_spec, seq_spec, seq_spec, wht_spec],
        out_specs=[gate_spec, carry_spec, carry_spec],
        out_shape=[
            jax.ShapeDtypeStruct((tpad, bp, 4 * hp), f32),
            jax.ShapeDtypeStruct((bp, hp), f32),
            jax.ShapeDtypeStruct((bp, hp), f32),
        ],
        scratch_shapes=[pltpu.VMEM((bp, hp), jnp.float32), pltpu.VMEM((bp, hp), jnp.float32)],
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(dyk, dck, gatesk, cseqk, cprev, whtk)

    # Weight gradient has no recurrence: one whole-sequence GEMM
    # dWh = hprevᵀ @ dxg over K = Tpad·B' rows (padded rows contribute 0:
    # padded-t/-b cotangents are zero ⇒ their da rows are zero).
    dwh_flat = jax.lax.dot_general(
        hprev.reshape(tpad * bp, hp).astype(f32),
        dxg.reshape(tpad * bp, 4 * hp),
        (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    dwh_out = dwh_flat.reshape(hp, 4, hp)[:h, :, :h].reshape(h, 4 * h)

    dxg_out = dxg.reshape(tpad, bp, 4, hp)[:t, :b, :, :h].transpose(1, 0, 2, 3).reshape(b, t, 4 * h)
    # custom_vjp convention: cotangent dtype == primal dtype (the kernels
    # accumulate in f32; bf16 primals get bf16 cotangents — ADVICE r4)
    return (
        dxg_out.astype(xg_dt),
        dwh_out.astype(wh_dt),
        dh0[:b, :h].astype(h0_dt),
        dc0[:b, :h].astype(c0_dt),
    )


lstm_core.defvjp(_vjp_fwd, _vjp_bwd)


def lstm_layer_fused(x: jax.Array, cell_params, h0: jax.Array, c0: jax.Array, lengths=None, dtype=jnp.float32, interpret: bool = False):
    """Full LSTM layer on flax ``OptimizedLSTMCell`` params: one XLA GEMM for
    the input projection + the fused recurrent kernel + length-indexed final
    carry (flax ``nn.RNN(seq_lengths=...)`` semantics: outputs are NOT
    masked; only the final carry is taken at each row's ``length-1``).

    x: [B, T, E]; cell_params: dict with ii/if/ig/io (kernel) and
    hi/hf/hg/ho (kernel+bias); returns (y [B,T,H], (c_T, h_T)).
    """
    b, t, _ = x.shape
    order = ("i", "f", "g", "o")
    wx = jnp.concatenate([cell_params[f"i{k}"]["kernel"] for k in order], axis=1).astype(dtype)
    wh = jnp.concatenate([cell_params[f"h{k}"]["kernel"] for k in order], axis=1).astype(dtype)
    bias = jnp.concatenate([cell_params[f"h{k}"]["bias"] for k in order], axis=0).astype(dtype)
    xg = jnp.dot(x.astype(dtype), wx) + bias
    y, cseq = lstm_core(xg, wh, h0.astype(dtype), c0.astype(dtype), interpret)
    if lengths is None:
        return y, (cseq[:, -1], y[:, -1])
    # one-hot select at t == length-1 (length 0 → all-zero row → initial carry)
    lens = jnp.asarray(lengths, jnp.int32)
    onehot = (jnp.arange(t, dtype=jnp.int32)[None, :] == (lens - 1)[:, None]).astype(y.dtype)
    h_t = jnp.einsum("bt,bth->bh", onehot, y) + jnp.where((lens == 0)[:, None], h0.astype(y.dtype), 0)
    c_t = jnp.einsum("bt,bth->bh", onehot, cseq) + jnp.where((lens == 0)[:, None], c0.astype(y.dtype), 0)
    # Post-length outputs are zeroed: the kernel keeps evolving the carry
    # past each row's length (unlike flax nn.RNN(seq_lengths=...), which
    # freezes it), so without masking the two impls would return different
    # junk there. Zero is deterministic and downstream masks by lengths
    # anyway (ADVICE r4).
    y = jnp.where((jnp.arange(t, dtype=jnp.int32)[None, :] < lens[:, None])[:, :, None], y, 0)
    return y, (c_t, h_t)
