"""Decoding tests: CTC greedy/beam, transducer greedy/beam."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflowasr_tpu.ops import ctc_decode, transducer_decode


def _logits_from_ids(ids, vocab, scale=10.0):
    """[T] ids → [1, T, V] near-one-hot logits."""
    t = len(ids)
    out = np.zeros((1, t, vocab), np.float32)
    out[0, np.arange(t), ids] = scale
    return out


def test_ctc_greedy_collapse_and_blanks():
    # path: b a a b b c c c → collapsed "a b? ..." blank=0: ids [0,1,1,0,2,2,0,3]
    ids = [0, 1, 1, 0, 2, 2, 0, 3]
    logits = _logits_from_ids(ids, vocab=5)
    tokens, lengths = ctc_decode.ctc_greedy_decode(jnp.asarray(logits), jnp.asarray([len(ids)]))
    assert int(lengths[0]) == 3
    np.testing.assert_array_equal(np.asarray(tokens[0, :3]), [1, 2, 3])


def test_ctc_greedy_repeat_after_blank_kept():
    ids = [1, 0, 1]  # a, blank, a → "aa"
    logits = _logits_from_ids(ids, vocab=3)
    tokens, lengths = ctc_decode.ctc_greedy_decode(jnp.asarray(logits), jnp.asarray([3]))
    assert int(lengths[0]) == 2
    np.testing.assert_array_equal(np.asarray(tokens[0, :2]), [1, 1])


def test_ctc_greedy_respects_length():
    ids = [1, 0, 2, 0, 3]
    logits = _logits_from_ids(ids, vocab=5)
    tokens, lengths = ctc_decode.ctc_greedy_decode(jnp.asarray(logits), jnp.asarray([3]))
    assert int(lengths[0]) == 2
    np.testing.assert_array_equal(np.asarray(tokens[0, :2]), [1, 2])


def test_ctc_greedy_batch_jit():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((4, 30, 10)).astype(np.float32)
    f = jax.jit(ctc_decode.ctc_greedy_decode)
    tokens, lengths = f(jnp.asarray(logits), jnp.asarray([30, 20, 10, 1]))
    assert tokens.shape == (4, 30)
    assert (np.asarray(lengths) <= 30).all()


def test_ctc_beam_matches_greedy_on_peaked_logits():
    ids = [0, 1, 1, 0, 2, 0, 3, 3]
    logits = _logits_from_ids(ids, vocab=5, scale=20.0)
    gt, gl = ctc_decode.ctc_greedy_decode(jnp.asarray(logits), jnp.asarray([len(ids)]))
    bt, bl = ctc_decode.ctc_beam_search_decode(jnp.asarray(logits), jnp.asarray([len(ids)]), beam_width=4)
    assert int(bl[0]) == int(gl[0])
    np.testing.assert_array_equal(np.asarray(bt[0, : int(bl[0])]), np.asarray(gt[0, : int(gl[0])]))


def test_ctc_beam_sums_alignments():
    # classic case where beam (sum over alignments) beats best-path:
    # two frames, p(a)=0.4, p(blank)=0.6 each → best path "" (0.36) but
    # p("a") = 0.4*0.6 + 0.6*0.4 + 0.4*0.4 = 0.64
    p = np.log(np.asarray([[[0.6, 0.4], [0.6, 0.4]]], np.float32))
    tokens, lengths = ctc_decode.ctc_beam_search_decode(jnp.asarray(p), jnp.asarray([2]), beam_width=4, prune_vocab=1)
    assert int(lengths[0]) == 1
    assert int(tokens[0, 0]) == 1


# ------------------------------ transducer greedy ----------------------------- #


def _toy_step_fn(vocab=4, suppress=25.0):
    """Emits the frame's favored token once, then blank (prev-token suppression)."""

    def step_fn(enc_frame, prev_tokens, states):
        nonblank = (prev_tokens != 0).astype(enc_frame.dtype)[:, None]
        logits = enc_frame - suppress * jax.nn.one_hot(prev_tokens, vocab) * nonblank
        return logits, jax.tree_util.tree_map(lambda x: x + 1, states)

    return step_fn


def test_transducer_greedy_emits_one_token_per_voiced_frame():
    vocab = 4
    # frames favor tokens [1, 0(blank), 2, 3]
    enc = np.zeros((1, 4, vocab), np.float32)
    enc[0, 0, 1] = 10.0
    enc[0, 1, 0] = 10.0
    enc[0, 2, 2] = 10.0
    enc[0, 3, 3] = 10.0
    states = (jnp.zeros((1, 2)),)
    tokens, lengths, next_tok, next_states = transducer_decode.transducer_greedy_decode(
        jnp.asarray(enc), jnp.asarray([4]), _toy_step_fn(vocab), jnp.zeros((1,), jnp.int32), states
    )
    assert int(lengths[0]) == 3
    np.testing.assert_array_equal(np.asarray(tokens[0, :3]), [1, 2, 3])
    assert int(next_tok[0]) == 3


def test_transducer_greedy_respects_encoded_length():
    vocab = 4
    enc = np.zeros((2, 4, vocab), np.float32)
    enc[:, 0, 1] = 10.0  # alternating favored tokens so prev-suppression
    enc[:, 1, 2] = 10.0  # doesn't carry across frames
    enc[:, 2, 1] = 10.0
    enc[:, 3, 2] = 10.0
    states = (jnp.zeros((2, 2)),)
    tokens, lengths, _, _ = transducer_decode.transducer_greedy_decode(
        jnp.asarray(enc), jnp.asarray([4, 2]), _toy_step_fn(vocab), jnp.zeros((2,), jnp.int32), states
    )
    # one emission per valid frame (then suppressed → blank → advance)
    assert int(lengths[0]) == 4
    assert int(lengths[1]) == 2
    np.testing.assert_array_equal(np.asarray(tokens[0, :4]), [1, 2, 1, 2])


def test_transducer_greedy_state_advances_only_on_emit():
    vocab = 4
    enc = np.zeros((1, 3, vocab), np.float32)
    enc[0, 0, 0] = 10.0  # blank
    enc[0, 1, 2] = 10.0  # token
    enc[0, 2, 0] = 10.0  # blank
    states = (jnp.zeros((1, 1)),)
    _, lengths, _, final_states = transducer_decode.transducer_greedy_decode(
        jnp.asarray(enc), jnp.asarray([3]), _toy_step_fn(vocab), jnp.zeros((1,), jnp.int32), states
    )
    assert int(lengths[0]) == 1
    # toy step_fn increments state each call, but only emit steps keep it
    assert float(final_states[0][0, 0]) == 1.0


def test_transducer_greedy_jit():
    vocab = 6
    rng = np.random.default_rng(1)
    enc = rng.standard_normal((3, 10, vocab)).astype(np.float32)
    states = (jnp.zeros((3, 2)),)
    fn = jax.jit(
        lambda e, l: transducer_decode.transducer_greedy_decode(
            e, l, _toy_step_fn(vocab), jnp.zeros((3,), jnp.int32), states
        )
    )
    tokens, lengths, _, _ = fn(jnp.asarray(enc), jnp.asarray([10, 5, 0]))
    assert tokens.shape == (3, 21)
    assert int(lengths[2]) == 0


def test_transducer_beam_matches_greedy_on_peaked():
    vocab = 4
    enc = np.zeros((1, 4, vocab), np.float32)
    enc[0, 0, 1] = 10.0
    enc[0, 1, 0] = 10.0
    enc[0, 2, 2] = 10.0
    enc[0, 3, 3] = 10.0
    states = (jnp.zeros((1, 2)),)
    gt, gl, _, _ = transducer_decode.transducer_greedy_decode(
        jnp.asarray(enc), jnp.asarray([4]), _toy_step_fn(vocab), jnp.zeros((1,), jnp.int32), states
    )
    bt, bl, bnt, bns = transducer_decode.transducer_beam_search_decode(
        jnp.asarray(enc), jnp.asarray([4]), _toy_step_fn(vocab), jnp.zeros((1,), jnp.int32), states, beam_width=2
    )
    assert int(bl[0]) == int(gl[0])
    np.testing.assert_array_equal(np.asarray(bt[0, : int(bl[0])]), np.asarray(gt[0, : int(gl[0])]))
    # carried state matches greedy: last token fed forward + states advanced per emission
    assert int(bnt[0]) == int(gt[0, int(gl[0]) - 1])
    assert bns[0].shape == states[0].shape


def test_transducer_beam_streaming_chunks_equal_full():
    """Chunked beam (states carried across chunks) == full-utterance beam."""
    vocab = 4
    enc = np.zeros((1, 6, vocab), np.float32)
    for t, tok in enumerate([1, 0, 2, 3, 0, 1]):
        enc[0, t, tok] = 10.0
    states = (jnp.zeros((1, 2)),)
    step_fn = _toy_step_fn(vocab)

    ft, fl, _, _ = transducer_decode.transducer_beam_search_decode(
        jnp.asarray(enc), jnp.asarray([6]), step_fn, jnp.zeros((1,), jnp.int32), states, beam_width=2
    )

    prev_tok = jnp.zeros((1,), jnp.int32)
    st = states
    got = []
    for lo in (0, 3):
        ct, cl, prev_tok, st = transducer_decode.transducer_beam_search_decode(
            jnp.asarray(enc[:, lo : lo + 3]), jnp.asarray([3]), step_fn, prev_tok, st, beam_width=2
        )
        got.extend(np.asarray(ct[0, : int(cl[0])]).tolist())
    np.testing.assert_array_equal(got, np.asarray(ft[0, : int(fl[0])]))


def test_transducer_greedy_max_symbols_per_frame():
    vocab = 4
    # frame 0 always wants token 1, never suppressed → without a cap the
    # decoder would burn the whole token budget on frame 0
    enc = np.zeros((1, 3, vocab), np.float32)
    enc[0, :, 1] = 10.0

    def step_fn(enc_frame, prev_tokens, states):
        return enc_frame, states

    states = (jnp.zeros((1, 2)),)
    tokens, lengths, _, _ = transducer_decode.transducer_greedy_decode(
        jnp.asarray(enc), jnp.asarray([3]), step_fn, jnp.zeros((1,), jnp.int32), states, max_symbols_per_frame=2
    )
    # 2 symbols per frame × 3 frames
    assert int(lengths[0]) == 6


# ------------------------------- WIND decode ------------------------------- #


def _toy_rnn_pred(vocab=6, pdim=5, seed=3):
    """A tiny stateful toy prediction net: state' = tanh(A·state + embed[tok]),
    pred_out = state'. Decisions depend on the FULL consumed-token history, so
    any chunk-boundary state mishandling (double/zero consumption of the
    carried token) changes downstream tokens."""
    r = np.random.default_rng(seed)
    a = jnp.asarray(r.standard_normal((pdim, pdim)) * 0.5, jnp.float32)
    embed = jnp.asarray(r.standard_normal((vocab, pdim)), jnp.float32)
    wj = jnp.asarray(r.standard_normal((pdim, vocab)) * 2.0, jnp.float32)

    def pred_step_fn(tok, states):
        (s,) = states
        s2 = jnp.tanh(s @ a.T + embed[tok])
        return s2, (s2,)

    def joint_window_fn(enc_win, pred_out):
        return enc_win + (pred_out @ wj)[:, None, :]

    def step_fn(enc_frame, prev_tokens, states):
        pred, st = pred_step_fn(prev_tokens, states)
        return joint_window_fn(enc_frame[:, None, :], pred)[:, 0], st

    return pred_step_fn, joint_window_fn, step_fn, pdim


def test_wind_equals_sync_greedy():
    vocab = 6
    pred_step_fn, joint_window_fn, step_fn, pdim = _toy_rnn_pred(vocab)
    enc_np0 = np.random.default_rng(0).standard_normal((2, 14, vocab)) * 3.0
    enc_np0[:, :, 0] += 2.0
    enc = jnp.asarray(enc_np0, jnp.float32)
    lens = jnp.asarray([14, 9])
    tok0 = jnp.zeros((2,), jnp.int32)
    st0 = (jnp.zeros((2, pdim)),)
    wt, wl, wn, ws = transducer_decode.transducer_greedy_decode_wind(
        enc, lens, pred_step_fn, joint_window_fn, tok0, st0, window=4
    )
    gt, gl, gn, gs = transducer_decode.transducer_greedy_decode(enc, lens, step_fn, tok0, st0)
    np.testing.assert_array_equal(np.asarray(wl), np.asarray(gl))
    for b in range(2):
        np.testing.assert_array_equal(np.asarray(wt[b, : int(wl[b])]), np.asarray(gt[b, : int(gl[b])]))
    np.testing.assert_array_equal(np.asarray(wn), np.asarray(gn))
    np.testing.assert_allclose(np.asarray(ws[0]), np.asarray(gs[0]), rtol=1e-6)


def test_wind_streaming_chunks_equal_full_exactly():
    """Chunked WIND with carried (token, states) == full-utterance WIND,
    token-for-token AND state-for-state. Catches the carry-out convention
    bug where the chunk boundary re-consumes the last emitted token."""
    vocab = 6
    pred_step_fn, joint_window_fn, _, pdim = _toy_rnn_pred(vocab)
    for seed, bias in ((5, 4.0), (7, 4.5)):
        enc_np = np.random.default_rng(seed).standard_normal((1, 16, vocab)) * 3.0
        enc_np[:, :, 0] += bias  # bias toward blank: sparse emissions keep every
        # per-chunk token budget slack, so chunked == full is exact, not capped
        enc = jnp.asarray(enc_np, jnp.float32)

        ft, fl, fn_, fs = transducer_decode.transducer_greedy_decode_wind(
            enc, jnp.asarray([16]), pred_step_fn, joint_window_fn, jnp.zeros((1,), jnp.int32), (jnp.zeros((1, pdim)),), window=4
        )
        full = np.asarray(ft[0, : int(fl[0])]).tolist()

        got = []
        tok = jnp.zeros((1,), jnp.int32)
        st = (jnp.zeros((1, pdim)),)
        for lo, hi in ((0, 6), (6, 16)):
            ct, cl, tok, st = transducer_decode.transducer_greedy_decode_wind(
                enc[:, lo:hi], jnp.asarray([hi - lo]), pred_step_fn, joint_window_fn, tok, st, window=4
            )
            got.extend(np.asarray(ct[0, : int(cl[0])]).tolist())

        assert got == full, (seed, got, full)
        assert int(tok[0]) == int(fn_[0])
        np.testing.assert_allclose(np.asarray(st[0]), np.asarray(fs[0]), rtol=1e-6)
