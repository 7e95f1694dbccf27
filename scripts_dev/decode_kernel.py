"""Fused single-kernel transducer greedy decode (Pallas TPU) — RECORDED
NEGATIVE RESULT, demoted from the shipping package (round 4).

It loses to the shipping XLA ``lax.while_loop`` WIND decode on v5e (numbers
below) because the on-device loop is latency-floor-bound; kept here with its
parity canary (decode_kernel_canary.py) for chips where the tradeoff flips.
See docs/design/fused_decode_negative_result.md for the full analysis.

The entire batched WIND greedy loop — windowed joint, non-blank scan, LSTM
prediction-network steps, token emission — runs inside ONE Pallas kernel:
the embedding table, LSTM/projection weights, and joint projections are
resident in VMEM for the whole decode, and the encoder projection
``enc @ W_enc + b`` (the only O(T·D·J) bulk work) is done outside as one
MXU matmul. Nothing touches HBM inside the loop except the final
token/state writes.

Measured on TPU v5e at Conformer-S sizes the fused kernel does NOT beat
the XLA ``lax.while_loop`` WIND path (ops/transducer_decode.py): 1.05 ms
vs 0.69 ms per 8-frame streaming chunk (B=1, 64-chunk scan), 0.187 s vs
0.164 s for batch-8 10 s utterances at worst-case emission density — the
XLA on-device loop is already latency-bound, and Mosaic's per-iteration
scalar-loop overhead outweighs the VMEM-residency win at these weight
sizes. Exactness vs
the XLA loop is tested token-for-token/state-for-state (interpret mode)
and emission-count-exact on device.

Replaces the reference's per-step ``tf.while_loop`` decode
(``models/transducer/base_transducer.py:496-575``) at the other extreme of
the design space; unsupported configs (GRU/SimpleRNN prediction nets,
one-hot label encoders, mul-mode or post-linear joints) always fall back.

Carry-out convention matches the sync/wind/beam paths: the returned
``(next_token, next_states)`` pair is "last token NOT yet consumed" — the
states handed out are the ones from BEFORE the final emission's LSTM step.

Lane padding rounds every minor dim to 128 multiples and bumps the 384
bucket to 512 (the axon-platform hang region, see rnnt_kernel._padded_lanes).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tensorflowasr_tpu.utils.math_util import round_up


def _lanes(n: int) -> int:
    p = round_up(max(n, 1), 128)
    return 512 if p == 384 else p


def _pad2(x, rows: int, cols: int, value=0.0):
    r, c = x.shape
    return jnp.pad(x, ((0, rows - r), (0, cols - c)), constant_values=value)


class FusedLayer(NamedTuple):
    """One prediction-net LSTM layer, lane-padded.

    wx/wh: [In, 4, H] / [H, 4, H] input/hidden kernels, gate order (i,f,g,o)
    b:     [1, 4, H] biases (flax puts LSTM biases on the hidden kernels)
    ln:    [2, H] LayerNorm scale row 0 / bias row 1, or None
    proj:  ([H, P], [1, P]) projection kernel/bias, or None
    """

    wx: jax.Array
    wh: jax.Array
    b: jax.Array
    ln: Optional[jax.Array]
    proj: Optional[Tuple[jax.Array, jax.Array]]


class FusedDecodeParams(NamedTuple):
    embed: jax.Array  # [V, E] label embedding table
    layers: Tuple[FusedLayer, ...]
    wp: jax.Array  # [P_last, J] prejoint prediction kernel
    bp: jax.Array  # [1, J]
    wv: jax.Array  # [J, V] vocab kernel (lane padding filled with -1e30 bias)
    bv: jax.Array  # [1, V]
    w_enc: jax.Array  # [E_enc, J] prejoint encoder kernel (used OUTSIDE the kernel)
    b_enc: jax.Array  # [J]
    hidden: int  # true (unpadded) rnn_units, for LN masking and state slicing
    ln_eps: float


def extract_decode_params(pc: dict, jc: dict, params: dict, compute_dtype=jnp.float32) -> Optional[FusedDecodeParams]:
    """Pull + pad the prediction/joint weights the kernel needs.

    pc/jc: the Transducer's prediction_config / joint_config dicts;
    params: the variables["params"] tree (needs "prediction" and "joint").
    Returns None when the model configuration is outside the fused kernel's
    support (caller falls back to the XLA WIND path)."""
    if pc.get("label_encoder_mode", "embedding") != "embedding":
        return None
    if pc.get("rnn_type", "lstm") != "lstm":
        return None
    if jc.get("joint_mode", "add") != "add" or jc.get("activation", "tanh") != "tanh":
        return None
    if jc.get("postjoint_linear", False):
        return None
    if not jc.get("prejoint_encoder_linear", True) or not jc.get("prejoint_prediction_linear", True):
        return None

    pred = params["prediction"]
    joint = params["joint"]
    dt = compute_dtype
    cast = lambda x: jnp.asarray(x, dt)

    num_rnns = int(pc.get("num_rnns", 1))
    units = int(pc.get("rnn_units", 512))
    use_ln = bool(pc.get("layer_norm", True))
    proj_units = int(pc.get("projection_units", 0))

    hp = _lanes(units)
    pp = _lanes(proj_units) if proj_units > 0 else hp
    embed_w = pred["embedding"]["embeddings"]["embedding"]  # [V, E]
    ep = _lanes(embed_w.shape[1])
    jp = _lanes(joint["vocab"]["kernel"].shape[0])
    vocab = joint["vocab"]["kernel"].shape[1]
    vp = _lanes(vocab)

    layers = []
    in_p = ep
    for i in range(num_rnns):
        cell = pred[f"rnn_{i}"]["cell"]
        wx = jnp.stack([_pad2(cell[g]["kernel"], in_p, hp) for g in ("ii", "if", "ig", "io")], axis=1)
        wh = jnp.stack([_pad2(cell[g]["kernel"], hp, hp) for g in ("hi", "hf", "hg", "ho")], axis=1)
        b = jnp.stack([jnp.pad(cell[g]["bias"], (0, hp - units))[None, :] for g in ("hi", "hf", "hg", "ho")], axis=1)
        ln = None
        if use_ln:
            lnp = pred[f"ln_{i}"]
            ln = jnp.stack([jnp.pad(lnp["scale"], (0, hp - units)), jnp.pad(lnp["bias"], (0, hp - units))])
        proj = None
        out_p = hp
        if proj_units > 0:
            pj = pred[f"projection_{i}"]
            proj = (_pad2(pj["kernel"], hp, pp), jnp.pad(pj["bias"], (0, pp - proj_units))[None, :])
            out_p = pp
        layers.append(FusedLayer(cast(wx), cast(wh), cast(b).astype(jnp.float32), ln if ln is None else ln.astype(jnp.float32), proj if proj is None else (cast(proj[0]), proj[1].astype(jnp.float32))))
        in_p = out_p

    wp = _pad2(joint["pred"]["kernel"], in_p, jp)
    bp = jnp.pad(joint["pred"]["bias"], (0, jp - joint["pred"]["bias"].shape[0]))[None, :]
    # vocab padding gets a -1e30 bias so argmax can never select a padded lane
    wv = _pad2(joint["vocab"]["kernel"], jp, vp)
    bv = jnp.pad(joint["vocab"]["bias"], (0, vp - vocab), constant_values=-1e30)[None, :]
    # rows padded to a sublane multiple: the kernel reads the table via a
    # one-hot matvec whose contraction dim is the (padded) vocab
    embed = _pad2(embed_w, round_up(embed_w.shape[0], 8), ep)

    return FusedDecodeParams(
        embed=cast(embed),
        layers=tuple(layers),
        wp=cast(wp),
        bp=bp.astype(jnp.float32),
        wv=cast(wv),
        bv=bv.astype(jnp.float32),
        w_enc=cast(joint["enc"]["kernel"]),
        b_enc=joint["enc"]["bias"].astype(jnp.float32),
        hidden=units,
        ln_eps=1e-3,
    )


def _decode_kernel(
    # scalar prefetch
    nframes_ref,
    tok0_ref,
    # tensor refs (order mirrors the wrapper's `inputs` list)
    *refs,
    layers_spec: Sequence[Tuple[bool, bool]],
    batch: int,
    hidden: int,
    ln_eps: float,
    blank: int,
    window: int,
    max_tokens: int,
    step_max: int,
):
    it = iter(range(len(refs)))
    enc_ref = refs[next(it)]  # [B, T, Jp]
    embed_ref = refs[next(it)]  # [Vp8, Ep]
    layer_refs = []
    for has_ln, has_proj in layers_spec:
        wx = refs[next(it)]
        wh = refs[next(it)]
        b = refs[next(it)]
        ln = refs[next(it)] if has_ln else None
        proj = (refs[next(it)], refs[next(it)]) if has_proj else None
        layer_refs.append((wx, wh, b, ln, proj))
    wp_ref = refs[next(it)]
    bp_ref = refs[next(it)]
    wv_ref = refs[next(it)]
    bv_ref = refs[next(it)]
    st0_ref = refs[next(it)]  # [2L*B, Hp] initial states: rows l*B..(l+1)*B-1
    #   hold layer l's c for l < L, then h for l >= L (flax carry order (c, h))
    tokens_ref = refs[next(it)]  # out [B, MTp] int32
    meta_ref = refs[next(it)]  # out [B, 128] int32: col 0 = count, col 1 = next token
    states_ref = refs[next(it)]  # out [2L*B, Hp] f32, same row layout as st0

    bsz = batch
    t_total = enc_ref.shape[1]
    # window loads must start at a 16-row-aligned offset (Mosaic cannot do
    # dynamic sublane indexing on (8/16, 128)-tiled refs), so the window is
    # widened by 16 and each example's start aligned down. Exactness vs the
    # unaligned WIND loop is preserved: per-frame argmax decisions are
    # independent of window placement, and scanning extra frames under an
    # unchanged prediction state changes nothing.
    k = min(window + 16, t_total)
    n_layers = len(layer_refs)
    f32 = jnp.float32

    h_iota = jax.lax.broadcasted_iota(jnp.int32, (bsz, layer_refs[0][0].shape[2]), 1)
    h_mask = h_iota < hidden
    e_iota = jax.lax.broadcasted_iota(jnp.int32, (bsz, embed_ref.shape[0]), 1)
    b_col = jax.lax.broadcasted_iota(jnp.int32, (bsz, 1), 0)

    def scalar_of(vec, i):
        """Extract vec[i, 0] as a scalar via a masked reduction (static i)."""
        return jnp.sum(jnp.where(b_col == i, vec, 0))

    def lstm_forward(tok_vec, states):
        """tok_vec [B,1] int32; states: tuple of (c [B,Hp], h [B,Hp]) per
        layer (flax carry order) → (pred_feat [B,*], new_states)."""
        onehot = (e_iota == tok_vec).astype(embed_ref.dtype)
        x = jnp.dot(onehot, embed_ref[...], preferred_element_type=f32)
        new_states = []
        for (wx, wh, b, ln, proj), (c, h) in zip(layer_refs, states):
            hx = h.astype(wh.dtype)
            xx = x.astype(wx.dtype)
            gates = [
                jnp.dot(xx, wx[:, g, :], preferred_element_type=f32)
                + jnp.dot(hx, wh[:, g, :], preferred_element_type=f32)
                + b[:, g, :]
                for g in range(4)
            ]
            gi = jax.nn.sigmoid(gates[0])
            gf = jax.nn.sigmoid(gates[1])
            gg = jnp.tanh(gates[2])
            go = jax.nn.sigmoid(gates[3])
            c2 = gf * c + gi * gg
            h2 = go * jnp.tanh(c2)
            new_states.append((c2, h2))
            y = h2
            if ln is not None:
                mean = jnp.sum(jnp.where(h_mask, y, 0.0), axis=1, keepdims=True) / hidden
                var = jnp.sum(jnp.where(h_mask, (y - mean) ** 2, 0.0), axis=1, keepdims=True) / hidden
                y = (y - mean) * jax.lax.rsqrt(var + ln_eps) * ln[0:1, :] + ln[1:2, :]
                y = jnp.where(h_mask, y, 0.0)
            if proj is not None:
                pw, pb = proj[0][...], proj[1][...]
                y = jnp.dot(y.astype(pw.dtype), pw, preferred_element_type=f32) + pb
            x = y
        return x, tuple(new_states)

    def pred_project(feat):
        return jnp.dot(feat.astype(wp_ref.dtype), wp_ref[...], preferred_element_type=f32) + bp_ref[...]

    # ------------------------------ init ---------------------------------- #
    tlen_vec = jnp.concatenate([jnp.full((1, 1), nframes_ref[i], jnp.int32) for i in range(bsz)], axis=0)
    tok0_vec = jnp.concatenate([jnp.full((1, 1), tok0_ref[i], jnp.int32) for i in range(bsz)], axis=0)
    init_states = tuple(
        (st0_ref[l * bsz : (l + 1) * bsz, :].astype(f32), st0_ref[(n_layers + l) * bsz : (n_layers + l + 1) * bsz, :].astype(f32))
        for l in range(n_layers)
    )
    feat0, cur0 = lstm_forward(tok0_vec, init_states)
    pred0 = pred_project(feat0)

    k_iota = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)
    v_iota_bk = jax.lax.broadcasted_iota(jnp.int32, (bsz * k, wv_ref.shape[1]), 1)
    mt_iota = jax.lax.broadcasted_iota(jnp.int32, (1, tokens_ref.shape[1]), 1)

    def flatten(states):
        return sum(states, ())

    def unflatten(flat):
        return tuple((flat[2 * l], flat[2 * l + 1]) for l in range(n_layers))

    def cond(carry):
        t, step = carry[0], carry[3]
        return jnp.any(t < tlen_vec) & (step < step_max)

    def body(carry):
        t, idx, prev, step, pred_p, tok_rows = carry[:6]
        rest = carry[6:]
        cur = unflatten(rest[: 2 * n_layers])
        lag = unflatten(rest[2 * n_layers :])

        start_vec = (jnp.clip(t, 0, t_total - k) // 16) * 16  # [B,1] aligned
        # per-example window rows, joint-merged with that example's pred_p;
        # static python loop over B — each load is an aligned dynamic slice
        z_parts = []
        for i in range(bsz):
            si = pl.multiple_of(scalar_of(start_vec, i), 16)
            enc_i = enc_ref[i, pl.ds(si, k), :].astype(f32)  # [k, Jp]
            z_parts.append(jnp.tanh(enc_i + pred_p[i : i + 1, :]))
        z = jnp.concatenate(z_parts, axis=0)  # [B*k, Jp]
        logits = jnp.dot(z.astype(wv_ref.dtype), wv_ref[...], preferred_element_type=f32) + bv_ref[...]
        row_max = jnp.max(logits, axis=1, keepdims=True)
        ids = jnp.min(jnp.where(logits == row_max, v_iota_bk, logits.shape[1]), axis=1, keepdims=True)  # [B*k,1]

        # per-example first-non-blank scan over its k rows
        tok_list, first_list, any_list = [], [], []
        for i in range(bsz):
            seg_ids = ids[i * k : (i + 1) * k, :]
            offs = scalar_of(start_vec, i) + k_iota
            valid = (offs >= scalar_of(t, i)) & (offs < scalar_of(tlen_vec, i))
            nb = (seg_ids != blank) & valid & (scalar_of(idx, i) < max_tokens)
            first_i = jnp.min(jnp.where(nb, k_iota, k))
            tok_i = jnp.sum(jnp.where(k_iota == first_i, seg_ids, 0))
            first_list.append(jnp.full((1, 1), first_i, jnp.int32))
            any_list.append(jnp.full((1, 1), (first_i < k).astype(jnp.int32), jnp.int32))
            tok_list.append(jnp.full((1, 1), tok_i, jnp.int32))
        first_vec = jnp.concatenate(first_list, axis=0)
        any_vec = jnp.concatenate(any_list, axis=0) > 0
        tok_vec = jnp.concatenate(tok_list, axis=0)

        emit = any_vec & (idx < max_tokens)
        write_pos = jnp.where(emit, idx, -1)
        tok_rows = jnp.where(mt_iota == write_pos, tok_vec, tok_rows)

        new_prev = jnp.where(emit, tok_vec, prev)
        new_idx = jnp.where(emit, idx + 1, idx)
        t_new = jnp.where(any_vec, start_vec + first_vec, jnp.minimum(start_vec + k, tlen_vec))
        t_new = jnp.maximum(t_new, t)

        feat, stepped = lstm_forward(new_prev, cur)
        pred_new = pred_project(feat)
        sel = lambda a, b: jnp.where(emit, a, b)
        pred_out = sel(pred_new, pred_p)
        new_cur = tuple((sel(sc, cc), sel(sh, ch)) for (sc, sh), (cc, ch) in zip(stepped, cur))
        new_lag = tuple((sel(cc, lc), sel(ch, lh)) for (cc, ch), (lc, lh) in zip(cur, lag))
        return (t_new, new_idx, new_prev, step + 1, pred_out, tok_rows) + flatten(new_cur) + flatten(new_lag)

    zero = jnp.asarray(0, jnp.int32)
    zvec = jnp.zeros((bsz, 1), jnp.int32)
    tok_rows0 = jnp.full((bsz, tokens_ref.shape[1]), blank, jnp.int32)
    carry0 = (zvec, zvec, tok0_vec, zero, pred0, tok_rows0) + flatten(cur0) + flatten(init_states)
    final = jax.lax.while_loop(cond, body, carry0)

    idx_vec, prev_vec = final[1], final[2]
    tokens_ref[...] = final[5]
    lag = unflatten(final[6 + 2 * n_layers :])
    meta_iota = jax.lax.broadcasted_iota(jnp.int32, (bsz, meta_ref.shape[1]), 1)
    meta_ref[...] = jnp.where(meta_iota == 0, idx_vec, jnp.where(meta_iota == 1, prev_vec, 0))
    for l, (c, h) in enumerate(lag):
        states_ref[l * bsz : (l + 1) * bsz, :] = c
        states_ref[(n_layers + l) * bsz : (n_layers + l + 1) * bsz, :] = h


def fused_greedy_decode(
    encoded: jax.Array,
    encoded_length: jax.Array,
    params: FusedDecodeParams,
    initial_tokens: jax.Array,
    initial_states,
    blank: int = 0,
    window: int = 16,
    max_token_factor: int = 2,
    interpret: bool = False,
):
    """Single-kernel batched WIND greedy decode.

    encoded: [B, T, E_enc] encoder output (pre joint projection)
    initial_states: tuple over layers of the flax LSTM carry (c [B,H], h [B,H])
    Returns (tokens [B, MT], lengths [B], next_tokens [B], next_states) with
    the shared "carried token not yet consumed" state convention.

    The whole batch decodes in ONE kernel instance: prediction-net steps and
    windowed joints are [B, ·] MXU matmuls, so the batch stays parallel (a
    per-utterance grid serializes B and loses to the batched XLA loop).
    """
    interpret = interpret or jax.default_backend() == "cpu"
    b, t, _ = encoded.shape
    max_tokens = max_token_factor * t + 1
    mtp = _lanes(max_tokens + 1)  # never-matching dump space for non-emitting steps
    jp = params.wp.shape[1]
    hp = params.layers[0].wh.shape[0]
    n_layers = len(params.layers)

    # bulk MXU work outside the kernel: encoder-side joint projection
    enc_p = jnp.dot(encoded.astype(params.w_enc.dtype), params.w_enc, preferred_element_type=jnp.float32)
    enc_p = enc_p + params.b_enc[None, None, : enc_p.shape[-1]]
    enc_p = jnp.pad(enc_p, ((0, 0), (0, 0), (0, jp - enc_p.shape[-1])))
    enc_p = enc_p.astype(params.wv.dtype)

    st0 = jnp.concatenate(
        [jnp.pad(c.astype(jnp.float32), ((0, 0), (0, hp - c.shape[1]))) for c, _ in initial_states]
        + [jnp.pad(h.astype(jnp.float32), ((0, 0), (0, hp - h.shape[1]))) for _, h in initial_states],
        axis=0,
    )  # [2L*B, Hp] — c rows first, then h (flax carry order)

    whole = lambda shape: pl.BlockSpec(shape, lambda *_: (0,) * len(shape))

    inputs = [enc_p, params.embed]
    in_specs = [whole(enc_p.shape), whole(params.embed.shape)]
    layers_spec = []
    for lyr in params.layers:
        inputs += [lyr.wx, lyr.wh, lyr.b]
        in_specs += [whole(lyr.wx.shape), whole(lyr.wh.shape), whole(lyr.b.shape)]
        if lyr.ln is not None:
            inputs.append(lyr.ln)
            in_specs.append(whole(lyr.ln.shape))
        if lyr.proj is not None:
            inputs += [lyr.proj[0], lyr.proj[1]]
            in_specs += [whole(lyr.proj[0].shape), whole(lyr.proj[1].shape)]
        layers_spec.append((lyr.ln is not None, lyr.proj is not None))
    inputs += [params.wp, params.bp, params.wv, params.bv, st0]
    in_specs += [whole(params.wp.shape), whole(params.bp.shape), whole(params.wv.shape), whole(params.bv.shape), whole(st0.shape)]

    kernel = functools.partial(
        _decode_kernel,
        layers_spec=tuple(layers_spec),
        batch=b,
        hidden=params.hidden,
        ln_eps=params.ln_eps,
        blank=blank,
        window=window,
        max_tokens=max_tokens,
        step_max=(max_token_factor + 1) * t + 1,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=in_specs,
        out_specs=[whole((b, mtp)), whole((b, 128)), whole((2 * n_layers * b, hp))],
    )
    tokens, meta, states_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, mtp), jnp.int32),
            jax.ShapeDtypeStruct((b, 128), jnp.int32),
            jax.ShapeDtypeStruct((2 * n_layers * b, hp), jnp.float32),
        ],
        # weights + encoder window + loop carries exceed the 16 MB default
        # scoped-vmem budget at Conformer-S sizes; v5e has far more physical
        # VMEM, so raise the compiler's cap for this kernel
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(encoded_length, jnp.int32), jnp.asarray(initial_tokens, jnp.int32), *inputs)

    h_true = params.hidden
    next_states = tuple(
        (states_out[l * b : (l + 1) * b, :h_true], states_out[(n_layers + l) * b : (n_layers + l + 1) * b, :h_true])
        for l in range(n_layers)
    )
    return tokens[:, :max_tokens], meta[:, 0], meta[:, 1], next_states
