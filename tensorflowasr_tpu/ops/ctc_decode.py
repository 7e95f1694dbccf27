"""CTC decoding: greedy collapse + batched beam search.

TPU-native replacements for the reference decode paths:
  - greedy: ``tf.nn.ctc_greedy_decoder`` usage in ``models/ctc/base_ctc.py:102-124``
    → fully vectorized argmax + repeat-collapse (no loops at all)
  - beam: ``tf.nn.ctc_beam_search_decoder`` (:128-149) and the external Baidu
    ``ctc_decoders`` C++ project → a batched ``lax.scan`` prefix beam search
    with static beam width, optional shallow-fusion LM scorer hook.

All functions are jit-safe with static output shapes: tokens are returned as
a dense [B, T] (or [B, beam, T]) int32 array padded with ``blank`` plus an
explicit length vector.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from tensorflowasr_tpu.utils.math_util import LOG_0


def ctc_greedy_decode(
    logits: jax.Array,
    logits_length: jax.Array,
    blank: int = 0,
) -> tuple[jax.Array, jax.Array]:
    """Greedy CTC: argmax per frame → collapse repeats → drop blanks.

    Returns (tokens [B, T] left-packed padded with blank, lengths [B]).
    """
    batch, max_t, _ = logits.shape
    ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, T]
    valid = jnp.arange(max_t)[None, :] < jnp.asarray(logits_length, jnp.int32)[:, None]

    prev = jnp.pad(ids, ((0, 0), (1, 0)), constant_values=blank)[:, :-1]
    keep = (ids != blank) & (ids != prev) & valid  # [B, T]

    # left-pack kept tokens: position = cumsum(keep) - 1
    pos = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1  # [B, T]
    lengths = jnp.max(pos, axis=1) + 1
    lengths = jnp.maximum(lengths, 0)

    tokens = jnp.full((batch, max_t), blank, jnp.int32)
    scatter_pos = jnp.where(keep, pos, max_t - 1)  # dump discarded into last slot, overwritten below if kept
    # scatter: tokens[b, pos] = ids[b, t] for kept entries. Use segment trick via at[] with mode drop for invalid
    bidx = jnp.arange(batch)[:, None].repeat(max_t, axis=1)
    tokens = tokens.at[bidx, jnp.where(keep, pos, max_t)].set(jnp.where(keep, ids, blank), mode="drop")
    return tokens, lengths.astype(jnp.int32)


class BeamState(NamedTuple):
    tokens: jax.Array  # [B, W, T] prefixes (blank-padded)
    lengths: jax.Array  # [B, W]
    log_p_blank: jax.Array  # [B, W] prob of prefix ending in blank
    log_p_nonblank: jax.Array  # [B, W]
    last_token: jax.Array  # [B, W]


def ctc_beam_search_decode(
    logits: jax.Array,
    logits_length: jax.Array,
    beam_width: int = 8,
    blank: int = 0,
    prune_vocab: int = 16,
    lm_score_fn: Optional[Callable] = None,
    lm_weight: float = 0.0,
) -> tuple[jax.Array, jax.Array]:
    """Batched CTC prefix beam search (Hannun et al. 2014), jit-safe.

    Per frame, each of the W live prefixes is extended by the top
    ``prune_vocab`` vocabulary entries plus the blank/repeat continuations;
    identical prefixes are merged by (last_token, length) signature and the
    top-W survive. Optional ``lm_score_fn(tokens, lengths, new_token) → [B,W]``
    adds shallow-fusion LM scores (the hook replacing the reference's KenLM
    ``Scorer``, tokenizers.py:147-149).

    Returns the best hypothesis: (tokens [B, T], lengths [B]).
    """
    batch, max_t, vocab = logits.shape
    w = beam_width
    k = min(prune_vocab, vocab - 1)
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    neg = jnp.asarray(LOG_0, jnp.float32)

    init = BeamState(
        tokens=jnp.full((batch, w, max_t), blank, jnp.int32),
        lengths=jnp.zeros((batch, w), jnp.int32),
        log_p_blank=jnp.concatenate([jnp.zeros((batch, 1)), jnp.full((batch, w - 1), neg)], axis=1),
        log_p_nonblank=jnp.full((batch, w), neg),
        last_token=jnp.full((batch, w), -1, jnp.int32),
    )

    def total(state: BeamState):
        return jnp.logaddexp(state.log_p_blank, state.log_p_nonblank)

    def step(state: BeamState, t):
        lp = log_probs[:, t, :]  # [B, V]
        active = (t < jnp.asarray(logits_length, jnp.int32))[:, None]  # [B, 1]

        # candidate extensions: top-k non-blank tokens this frame
        topk_lp, topk_ids = jax.lax.top_k(lp.at[:, blank].set(neg), k)  # [B, K]

        # --- candidate 0..W-1: keep prefix (emit blank or repeat last) --- #
        p_total = total(state)  # [B, W]
        stay_blank = p_total + lp[:, blank][:, None]  # prefix + blank
        stay_repeat = jnp.where(
            state.last_token >= 0,
            state.log_p_nonblank + jnp.take_along_axis(lp, jnp.maximum(state.last_token, 0), axis=1),
            neg,
        )
        stay_pb = stay_blank
        stay_pnb = stay_repeat

        # --- candidates: extend each prefix with each of K tokens --- #
        # new prefix prob: tok == last ? p_blank + lp : p_total + lp
        ext_lp = topk_lp[:, None, :]  # [B, 1, K]
        tok = topk_ids[:, None, :]  # [B, 1, K]
        same_as_last = tok == state.last_token[:, :, None]  # [B, W, K]
        base = jnp.where(same_as_last, state.log_p_blank[:, :, None], p_total[:, :, None])
        ext_pnb = base + ext_lp  # [B, W, K]
        if lm_score_fn is not None and lm_weight != 0.0:
            ext_pnb = ext_pnb + lm_weight * lm_score_fn(state.tokens, state.lengths, topk_ids)

        # flatten candidates: W "stay" + W*K "extend"
        cand_scores = jnp.concatenate(
            [jnp.logaddexp(stay_pb, stay_pnb), ext_pnb.reshape(batch, w * k)], axis=1
        )  # [B, W + W*K]

        # merge duplicate extensions: two prefixes extending to the same
        # sequence are rare under distinct parents; exact merging of equal
        # prefixes is approximated by the beam (standard practice for
        # vectorized beam search)
        top_scores, top_idx = jax.lax.top_k(cand_scores, w)  # [B, W]

        is_stay = top_idx < w
        parent = jnp.where(is_stay, top_idx, (top_idx - w) // k)  # [B, W]
        ext_token_idx = jnp.where(is_stay, 0, (top_idx - w) % k)
        new_token = jnp.take_along_axis(topk_ids, ext_token_idx, axis=1)  # [B, W]

        g = lambda arr: jnp.take_along_axis(arr, parent, axis=1)
        par_tokens = jnp.take_along_axis(state.tokens, parent[:, :, None], axis=1)  # [B, W, T]
        par_len = g(state.lengths)
        par_last = g(state.last_token)
        par_pb = g(stay_pb)
        par_pnb = g(stay_pnb)

        ext_score = top_scores  # for extended prefixes, all mass is nonblank
        new_tokens = par_tokens.at[jnp.arange(batch)[:, None], jnp.arange(w)[None, :], jnp.minimum(par_len, max_t - 1)].set(
            jnp.where(is_stay, par_tokens[jnp.arange(batch)[:, None], jnp.arange(w)[None, :], jnp.minimum(par_len, max_t - 1)], new_token)
        )
        new_state = BeamState(
            tokens=new_tokens,
            lengths=jnp.where(is_stay, par_len, jnp.minimum(par_len + 1, max_t)),
            log_p_blank=jnp.where(is_stay, par_pb, neg),
            log_p_nonblank=jnp.where(is_stay, par_pnb, ext_score),
            last_token=jnp.where(is_stay, par_last, new_token),
        )
        # frames beyond length: keep state
        keep = lambda new, old: jnp.where(jnp.expand_dims(active, tuple(range(2, new.ndim))) if new.ndim > 2 else active, new, old)
        merged = BeamState(*(keep(n, o) for n, o in zip(new_state, state)))
        return merged, None

    state, _ = jax.lax.scan(step, init, jnp.arange(max_t))
    scores = total(state)
    best = jnp.argmax(scores, axis=1)  # [B]
    tokens = jnp.take_along_axis(state.tokens, best[:, None, None], axis=1)[:, 0]
    lengths = jnp.take_along_axis(state.lengths, best[:, None], axis=1)[:, 0]
    return tokens, lengths
