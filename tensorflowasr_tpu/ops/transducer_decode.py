"""Transducer (RNN-T) decoding: batched greedy + beam search.

Greedy is the parity path with the reference's frame-synchronous
``tf.while_loop`` (``models/transducer/base_transducer.py:496-575``): one
joint evaluation per iteration, per-example frame pointers that advance on
blank, token emission otherwise, with the static ``2·T+1`` total-token bound
that keeps the loop TPU/compile-safe. The reference's beam search is dead
code (:841-842); ours is implemented from the ALSD/token-wise beam family
(see PAPERS.md) as an extension.

The decoder is model-agnostic: the caller supplies
``step_fn(enc_frame [B, E], prev_tokens [B], decoder_states) →
(logits [B, V], new_decoder_states)`` — one prediction-network step fused
with the joint at a single frame.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class _GreedyLoopState(NamedTuple):
    frame_idx: jax.Array  # [B] current encoder frame pointer
    prev_tokens: jax.Array  # [B] last non-blank token (feeds prediction net)
    decoder_states: tuple  # pytree of prediction-net states
    tokens: jax.Array  # [B, max_tokens] emitted tokens (blank padded)
    token_idx: jax.Array  # [B] write pointer into tokens (starts at 0)
    frame_symbols: jax.Array  # [B] tokens emitted at the current frame
    step: jax.Array  # [] iteration counter


def transducer_greedy_decode(
    encoded: jax.Array,
    encoded_length: jax.Array,
    step_fn: Callable,
    initial_tokens: jax.Array,
    initial_states,
    blank: int = 0,
    max_token_factor: int = 2,
    max_symbols_per_frame: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, tuple]:
    """Frame-synchronous greedy decode.

    Parameters
    ----------
    encoded : [B, T, E] encoder output
    encoded_length : [B] valid frames
    step_fn : (enc_frame [B, E], prev_tokens [B], states) → (logits [B, V], states)
    initial_tokens : [B] token fed at the start (blank, or carry-over when streaming)
    initial_states : prediction network states pytree (carried across chunks)
    max_token_factor : total token budget = factor · T + 1 (reference uses 2)
    max_symbols_per_frame : optional cap on consecutive emissions per frame
        (reference ``recognize_single`` uses 3, base_transducer.py:577); once
        hit, the frame is force-advanced

    Returns
    -------
    (tokens [B, max_tokens], lengths [B], next_tokens [B], next_states)
    """
    batch, max_frames, _ = encoded.shape
    max_tokens = max_token_factor * max_frames + 1
    nframes = jnp.asarray(encoded_length, jnp.int32)

    init = _GreedyLoopState(
        frame_idx=jnp.zeros((batch,), jnp.int32),
        prev_tokens=jnp.asarray(initial_tokens, jnp.int32),
        decoder_states=initial_states,
        tokens=jnp.full((batch, max_tokens), blank, jnp.int32),
        token_idx=jnp.zeros((batch,), jnp.int32),
        frame_symbols=jnp.zeros((batch,), jnp.int32),
        step=jnp.asarray(0, jnp.int32),
    )

    def cond(s: _GreedyLoopState):
        frames_left = jnp.any(s.frame_idx < nframes)
        budget_left = jnp.any(s.token_idx < max_tokens)
        # hard bound: every iteration either advances a frame pointer or
        # emits a token, so (1+factor)·T+1 iterations suffice; keep a static
        # safety bound for the compiler
        return frames_left & budget_left & (s.step < (max_token_factor + 1) * max_frames + 1)

    def body(s: _GreedyLoopState):
        safe_frame = jnp.minimum(s.frame_idx, max_frames - 1)
        enc_frame = jnp.take_along_axis(encoded, safe_frame[:, None, None], axis=1)[:, 0]  # [B, E]
        logits, new_states = step_fn(enc_frame, s.prev_tokens, s.decoder_states)
        current = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B]

        done = s.frame_idx >= nframes
        is_blank = (current == blank) | done | (s.token_idx >= max_tokens)
        if max_symbols_per_frame is not None:
            is_blank = is_blank | (s.frame_symbols >= max_symbols_per_frame)

        # emit non-blank tokens at token_idx (clamped); blanks write nowhere
        write_pos = jnp.where(is_blank, max_tokens, jnp.minimum(s.token_idx, max_tokens - 1))
        tokens = s.tokens.at[jnp.arange(batch), write_pos].set(jnp.where(is_blank, blank, current), mode="drop")
        token_idx = jnp.where(is_blank, s.token_idx, jnp.minimum(s.token_idx + 1, max_tokens))

        frame_idx = jnp.where(is_blank, s.frame_idx + 1, s.frame_idx)
        frame_symbols = jnp.where(is_blank, 0, s.frame_symbols + 1)
        prev_tokens = jnp.where(is_blank, s.prev_tokens, current)

        # only advance decoder state where a token was emitted
        def merge(new, old):
            mask = is_blank.reshape((batch,) + (1,) * (new.ndim - 1))
            return jnp.where(mask, old, new)

        decoder_states = jax.tree_util.tree_map(merge, new_states, s.decoder_states)
        return _GreedyLoopState(frame_idx, prev_tokens, decoder_states, tokens, token_idx, frame_symbols, s.step + 1)

    final = jax.lax.while_loop(cond, body, init)
    return final.tokens, final.token_idx, final.prev_tokens, final.decoder_states


class _BeamState(NamedTuple):
    tokens: jax.Array  # [B, W, max_tokens]
    lengths: jax.Array  # [B, W]
    scores: jax.Array  # [B, W] log prob
    prev_tokens: jax.Array  # [B, W]
    decoder_states: tuple  # pytree with leading dims [B, W, ...]


def transducer_beam_search_decode(
    encoded: jax.Array,
    encoded_length: jax.Array,
    step_fn: Callable,
    initial_tokens: jax.Array,
    initial_states,
    beam_width: int = 4,
    blank: int = 0,
    max_symbols_per_frame: int = 3,
) -> Tuple[jax.Array, jax.Array, jax.Array, tuple]:
    """Batched time-synchronous beam search (ALSD-style, fixed expansions).

    Per frame, each of the W hypotheses runs up to ``max_symbols_per_frame``
    expansion rounds: every round evaluates the joint for all hypotheses,
    either emitting a top token (score += log p(token)) or closing the frame
    with blank (score += log p(blank)). Hypotheses that chose blank stop
    expanding for this frame. This keeps all shapes static (TPU-safe) while
    matching token-wise beam search quality on typical ASR (references in
    PAPERS.md: token-wise beam, WIND).

    Returns (best tokens [B, max_tokens], lengths [B], next_tokens [B],
    next_decoder_states) — the last two are the best hypothesis' carried
    prediction-net feed/state so chunked streaming with beam decoding
    continues from the winning hypothesis (not a reset state).
    """
    batch, max_frames, enc_dim = encoded.shape
    w = beam_width
    max_tokens = 2 * max_frames + 1
    nframes = jnp.asarray(encoded_length, jnp.int32)

    def tile_states(states):
        return jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x[:, None], (batch, w) + x.shape[1:]), states)

    neg = jnp.asarray(-1e30, jnp.float32)
    init = _BeamState(
        tokens=jnp.full((batch, w, max_tokens), blank, jnp.int32),
        lengths=jnp.zeros((batch, w), jnp.int32),
        scores=jnp.concatenate([jnp.zeros((batch, 1)), jnp.full((batch, w - 1), neg)], axis=1),
        prev_tokens=jnp.broadcast_to(jnp.asarray(initial_tokens, jnp.int32)[:, None], (batch, w)),
        decoder_states=tile_states(initial_states),
    )

    def flat_step(enc_frame_bw, prev_tokens_bw, states_bw):
        """Run step_fn over [B, W] flattened to [B*W]."""
        flat = lambda x: x.reshape((batch * w,) + x.shape[2:])
        unflat = lambda x: x.reshape((batch, w) + x.shape[1:])
        logits, new_states = step_fn(flat(enc_frame_bw), flat(prev_tokens_bw), jax.tree_util.tree_map(flat, states_bw))
        return unflat(logits), jax.tree_util.tree_map(unflat, new_states)

    def frame_body(state: _BeamState, t):
        active_frame = (t < nframes)[:, None]  # [B, 1]
        enc_frame = jnp.take_along_axis(encoded, jnp.minimum(t, max_frames - 1)[None].repeat(batch)[:, None, None], axis=1)[:, 0]
        enc_frame_bw = jnp.broadcast_to(enc_frame[:, None], (batch, w, enc_dim))

        def expansion_round(carry, _):
            st, open_mask = carry  # open_mask [B, W]: still expanding this frame
            logits, new_states = flat_step(enc_frame_bw, st.prev_tokens, st.decoder_states)
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)  # [B, W, V]

            lp_blank = lp[..., blank]  # [B, W]
            lp_tok = lp.at[..., blank].set(neg)
            best_lp, best_tok = jax.lax.top_k(lp_tok, 1)  # [B, W, 1]
            best_lp, best_tok = best_lp[..., 0], best_tok[..., 0]

            # candidates per hypothesis: (a) close frame with blank, (b) emit best token
            cand_scores = jnp.stack(
                [
                    st.scores + jnp.where(open_mask, lp_blank, 0.0),
                    jnp.where(open_mask & (st.lengths < max_tokens), st.scores + best_lp, neg),
                ],
                axis=2,
            ).reshape(batch, 2 * w)
            top_scores, top_idx = jax.lax.top_k(cand_scores, w)
            parent = top_idx // 2
            emitted = (top_idx % 2) == 1  # [B, W]

            g2 = lambda arr: jnp.take_along_axis(arr, parent, axis=1)
            par_tokens = jnp.take_along_axis(st.tokens, parent[:, :, None], axis=1)
            par_len = g2(st.lengths)
            par_prev = g2(st.prev_tokens)
            tok = g2(best_tok)

            new_tokens = par_tokens.at[jnp.arange(batch)[:, None], jnp.arange(w)[None, :], jnp.minimum(par_len, max_tokens - 1)].set(
                jnp.where(emitted, tok, par_tokens[jnp.arange(batch)[:, None], jnp.arange(w)[None, :], jnp.minimum(par_len, max_tokens - 1)])
            )
            sel_states = jax.tree_util.tree_map(
                lambda ns, os: jnp.where(
                    emitted.reshape((batch, w) + (1,) * (ns.ndim - 2)),
                    jnp.take_along_axis(ns, parent.reshape((batch, w) + (1,) * (ns.ndim - 2)), axis=1),
                    jnp.take_along_axis(os, parent.reshape((batch, w) + (1,) * (os.ndim - 2)), axis=1),
                ),
                new_states,
                st.decoder_states,
            )
            nxt = _BeamState(
                tokens=new_tokens,
                lengths=jnp.where(emitted, jnp.minimum(par_len + 1, max_tokens), par_len),
                scores=top_scores,
                prev_tokens=jnp.where(emitted, tok, par_prev),
                decoder_states=sel_states,
            )
            new_open = jnp.take_along_axis(open_mask, parent, axis=1) & emitted
            # frames past the end never change state
            keep = lambda n, o: jnp.where(active_frame.reshape((batch, 1) + (1,) * (n.ndim - 2)), n, o)
            merged = _BeamState(*(jax.tree_util.tree_map(keep, n, o) for n, o in zip(nxt, st)))
            return (merged, new_open & active_frame), None

        open0 = jnp.ones((batch, w), bool) & active_frame
        (state, _), _ = jax.lax.scan(expansion_round, (state, open0), jnp.arange(max_symbols_per_frame))
        return state, None

    state, _ = jax.lax.scan(frame_body, init, jnp.arange(max_frames))
    best = jnp.argmax(state.scores, axis=1)
    tokens = jnp.take_along_axis(state.tokens, best[:, None, None], axis=1)[:, 0]
    lengths = jnp.take_along_axis(state.lengths, best[:, None], axis=1)[:, 0]
    next_tokens = jnp.take_along_axis(state.prev_tokens, best[:, None], axis=1)[:, 0]
    next_states = jax.tree_util.tree_map(
        lambda x: jnp.take_along_axis(x, best.reshape((batch, 1) + (1,) * (x.ndim - 2)), axis=1)[:, 0],
        state.decoder_states,
    )
    return tokens, lengths, next_tokens, next_states


class _WindLoopState(NamedTuple):
    frame_idx: jax.Array  # [B]
    prev_tokens: jax.Array  # [B]
    decoder_states: tuple  # states AFTER consuming prev_tokens (scoring states)
    lag_states: tuple  # states BEFORE consuming prev_tokens (the carry-out
    #   convention shared with the sync/beam paths: the next call's
    #   pred_step(prev_tokens, lag_states) re-derives decoder_states)
    pred_out: jax.Array  # [B, P] cached prediction-net output
    tokens: jax.Array  # [B, max_tokens]
    token_idx: jax.Array  # [B]
    step: jax.Array


def transducer_greedy_decode_wind(
    encoded: jax.Array,
    encoded_length: jax.Array,
    pred_step_fn: Callable,
    joint_window_fn: Callable,
    initial_tokens: jax.Array,
    initial_states,
    blank: int = 0,
    window: int = 16,
    max_token_factor: int = 2,
) -> Tuple[jax.Array, jax.Array, jax.Array, tuple]:
    """WIND-accelerated greedy decode (Windowed Inference for Non-blank
    Detection, PAPERS.md arXiv:2505.13765) — EXACTLY equivalent to
    frame-synchronous greedy, but each loop iteration evaluates the joint for
    a ``window`` of frames under the cached prediction state and jumps
    straight to the first non-blank frame. Sequential steps drop from
    O(T + emissions) to O(T/window + emissions), and the per-step joint
    becomes a [window, V] matmul that actually feeds the MXU.

    pred_step_fn : (prev_tokens [B], states) → (pred_out [B, P], states)
    joint_window_fn : (enc_window [B, K, E], pred_out [B, P]) → logits [B, K, V]
    """
    batch, max_frames, enc_dim = encoded.shape
    k = min(window, max_frames)
    max_tokens = max_token_factor * max_frames + 1
    nframes = jnp.asarray(encoded_length, jnp.int32)

    pred0, states0 = pred_step_fn(jnp.asarray(initial_tokens, jnp.int32), initial_states)
    init = _WindLoopState(
        frame_idx=jnp.zeros((batch,), jnp.int32),
        prev_tokens=jnp.asarray(initial_tokens, jnp.int32),
        decoder_states=states0,
        lag_states=initial_states,
        pred_out=pred0,
        tokens=jnp.full((batch, max_tokens), blank, jnp.int32),
        token_idx=jnp.zeros((batch,), jnp.int32),
        step=jnp.asarray(0, jnp.int32),
    )

    def cond(s: _WindLoopState):
        return jnp.any(s.frame_idx < nframes) & jnp.any(s.token_idx < max_tokens) & (
            s.step < (max_token_factor + 1) * max_frames + 1
        )

    def body(s: _WindLoopState):
        start = jnp.minimum(s.frame_idx, jnp.maximum(max_frames - k, 0))  # [B]
        # gather the window [B, K, E] starting at each example's pointer
        offs = start[:, None] + jnp.arange(k)[None, :]  # [B, K]
        offs_safe = jnp.minimum(offs, max_frames - 1)
        enc_win = jnp.take_along_axis(encoded, offs_safe[:, :, None], axis=1)  # [B, K, E]

        logits = joint_window_fn(enc_win, s.pred_out)  # [B, K, V]
        ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, K]
        frame_valid = (offs >= s.frame_idx[:, None]) & (offs < nframes[:, None])
        # budget-exhausted examples treat everything as blank (reference
        # semantics: ignore + advance), so they drain their frames
        nonblank = (ids != blank) & frame_valid & (s.token_idx < max_tokens)[:, None]
        # first non-blank position in the window (k if none)
        first = jnp.argmax(nonblank, axis=1)
        any_nb = jnp.any(nonblank, axis=1)
        first = jnp.where(any_nb, first, k)

        # frames consumed: up to the first non-blank (exclusive); the window
        # may start before frame_idx when clamped near the end — advance
        # relative to the true pointer
        emit_frame = start + first  # [B] absolute frame of emission (if any)
        advance_to = jnp.where(any_nb, emit_frame, jnp.minimum(start + k, nframes))
        advance_to = jnp.maximum(advance_to, s.frame_idx)  # never move back

        done = s.frame_idx >= nframes
        emits = any_nb & ~done & (s.token_idx < max_tokens)

        tok = jnp.take_along_axis(ids, jnp.minimum(first, k - 1)[:, None], axis=1)[:, 0]
        write_pos = jnp.where(emits, jnp.minimum(s.token_idx, max_tokens - 1), max_tokens)
        tokens = s.tokens.at[jnp.arange(batch), write_pos].set(jnp.where(emits, tok, blank), mode="drop")
        token_idx = jnp.where(emits, jnp.minimum(s.token_idx + 1, max_tokens), s.token_idx)
        prev_tokens = jnp.where(emits, tok, s.prev_tokens)
        frame_idx = jnp.where(done, s.frame_idx, advance_to)

        # prediction-net step only where a token was emitted; the pre-step
        # states become the lagged carry-out for that example
        new_pred, new_states = pred_step_fn(prev_tokens, s.decoder_states)
        sel = lambda new, old: jnp.where(emits.reshape((batch,) + (1,) * (new.ndim - 1)), new, old)
        pred_out = sel(new_pred, s.pred_out)
        lag_states = jax.tree_util.tree_map(sel, s.decoder_states, s.lag_states)
        decoder_states = jax.tree_util.tree_map(sel, new_states, s.decoder_states)
        return _WindLoopState(frame_idx, prev_tokens, decoder_states, lag_states, pred_out, tokens, token_idx, s.step + 1)

    final = jax.lax.while_loop(cond, body, init)
    # carry out (prev_tokens, lag_states): the same "last token not yet
    # consumed" convention as the sync and beam paths, so the next chunk's
    # init pred_step re-consumes it exactly once (not twice)
    return final.tokens, final.token_idx, final.prev_tokens, final.lag_states
