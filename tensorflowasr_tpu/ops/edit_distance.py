"""Batched edit distance on device (jittable).

In-graph parity with the reference's WER/CER machinery
(``callbacks.py:38-52`` tf.edit_distance on token sequences,
``metrics/error_rates.py:18``): a vectorized Levenshtein DP over padded
token arrays — one ``lax.scan`` over hypothesis positions, with the DP row
carried. Use for on-device WER during evaluation without host round trips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def edit_distance(ref: jax.Array, ref_len: jax.Array, hyp: jax.Array, hyp_len: jax.Array) -> jax.Array:
    """Levenshtein distance per batch element.

    ref: [B, U] int tokens, ref_len: [B]
    hyp: [B, V] int tokens, hyp_len: [B]
    returns [B] int32 distances
    """
    b, u = ref.shape
    v = hyp.shape[1]
    ref_len = jnp.asarray(ref_len, jnp.int32)
    hyp_len = jnp.asarray(hyp_len, jnp.int32)

    # row[j] = distance(ref[:j], hyp[:i]) — carried over scan of i
    positions = jnp.arange(u + 1)[None, :]  # [1, U+1]
    init_row = jnp.broadcast_to(positions, (b, u + 1)).astype(jnp.int32)

    def step(row, i):
        hyp_tok = jnp.take_along_axis(hyp, jnp.minimum(i, v - 1)[None].repeat(b)[:, None], axis=1)[:, 0]  # [B]
        sub_cost = (ref != hyp_tok[:, None]).astype(jnp.int32)  # [B, U]
        # new_row[0] = i+1; new_row[j] = min(row[j]+1, new_row[j-1]+1, row[j-1]+sub)
        # the dependence on new_row[j-1] makes it a scan along j — use the
        # classic two-pass trick: first compute candidates independent of
        # new_row, then fix up with a cumulative min over (new_row[j-1]+1)
        cand = jnp.minimum(row[:, 1:] + 1, row[:, :-1] + sub_cost)  # [B, U]
        first = jnp.full((b, 1), 0, jnp.int32) + (i + 1)
        # prefix fix-up: new_row[j] = min over k<=j of (cand[k] + (j-k)) and first + j
        # computed via a cumulative min of (cand[j] - j) then + j
        offs = jnp.arange(u)[None, :]
        shifted = jnp.minimum(cand - offs, first - 0)  # include the boundary as k=-1 term ≈ first - (-1+1)
        run_min = jax.lax.associative_scan(jnp.minimum, shifted, axis=1)
        new_tail = run_min + offs
        new_row = jnp.concatenate([first, new_tail], axis=1)
        # rows past hyp_len stay frozen
        active = (i < hyp_len)[:, None]
        return jnp.where(active, new_row, row), None

    final_row, _ = jax.lax.scan(step, init_row, jnp.arange(v))
    return jnp.take_along_axis(final_row, ref_len[:, None], axis=1)[:, 0]


def wer_on_device(ref, ref_len, hyp, hyp_len):
    """(sum of edit distances, sum of reference lengths) for streaming WER."""
    d = edit_distance(ref, ref_len, hyp, hyp_len)
    return jnp.sum(d), jnp.sum(jnp.asarray(ref_len, jnp.int32))
