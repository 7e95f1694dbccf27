"""N-gram LM tests: corpus building, ARPA loading, shallow-fusion beam."""

import jax.numpy as jnp
import numpy as np
import pytest

from tensorflowasr_tpu.lm import NGramLM
from tensorflowasr_tpu.ops import ctc_decode


def test_bigram_from_corpus_probabilities():
    # corpus: 1 always followed by 2
    seqs = [[1, 2, 1, 2, 1, 2], [1, 2, 1, 2]]
    lm = NGramLM.from_token_corpus(seqs, vocab_size=4, order=2, add_k=0.01, interpolation=0.0)
    probs = np.exp(np.asarray(lm.table))
    np.testing.assert_allclose(probs.sum(axis=-1), 1.0, atol=1e-5)
    assert probs[1, 2] > 0.9  # p(2|1) high
    assert probs[1, 3] < 0.05


def test_trigram_score_shapes():
    seqs = [[1, 2, 3, 1, 2, 3]]
    lm = NGramLM.from_token_corpus(seqs, vocab_size=5, order=3)
    ctx = jnp.asarray([[1, 2]], jnp.int32)  # [B=1, 2]
    s = lm.score(ctx, jnp.asarray([[0, 1, 2, 3, 4]], jnp.int32))
    assert s.shape == (1, 5)
    assert float(s[0, 3]) > float(s[0, 4])  # 3 follows (1,2) in corpus


def test_beam_score_fn_shapes():
    lm = NGramLM.from_token_corpus([[1, 2, 1, 2]], vocab_size=4, order=2)
    fn = lm.beam_score_fn()
    tokens = jnp.zeros((2, 3, 10), jnp.int32)
    lengths = jnp.asarray([[0, 1, 2], [3, 0, 1]], jnp.int32)
    cands = jnp.asarray([[1, 2], [2, 3]], jnp.int32)
    out = fn(tokens, lengths, cands)
    assert out.shape == (2, 3, 2)


def test_beam_with_lm_changes_ranking():
    # acoustics slightly prefer token 2 after 1, LM strongly prefers 3 after 1
    logp = np.full((1, 2, 4), -8.0, np.float32)
    logp[0, 0, 1] = -0.05  # frame 0: token 1
    logp[0, 1, 2] = -0.6   # frame 1: token 2 slightly better...
    logp[0, 1, 3] = -0.8   # ...than token 3
    lm = NGramLM.from_token_corpus([[1, 3] * 50], vocab_size=4, order=2, interpolation=0.0)
    t_no, l_no = ctc_decode.ctc_beam_search_decode(jnp.asarray(logp), jnp.asarray([2]), beam_width=4)
    t_lm, l_lm = ctc_decode.ctc_beam_search_decode(
        jnp.asarray(logp), jnp.asarray([2]), beam_width=4, lm_score_fn=lm.beam_score_fn(), lm_weight=1.0
    )
    assert int(t_no[0, 1]) == 2  # acoustics win without LM
    assert int(t_lm[0, 1]) == 3  # LM flips the second token


def test_arpa_roundtrip(tmp_path):
    arpa = tmp_path / "lm.arpa"
    arpa.write_text(
        "\\data\\\n"
        "ngram 1=3\n"
        "ngram 2=2\n"
        "\n\\1-grams:\n"
        "-0.5\ta\t-0.3\n"
        "-0.7\tb\t-0.2\n"
        "-1.0\tc\t0.0\n"
        "\n\\2-grams:\n"
        "-0.1\ta b\n"
        "-0.4\tb c\n"
        "\n\\end\\\n"
    )
    lm = NGramLM.from_arpa(str(arpa), {"a": 0, "b": 1, "c": 2}, order=2)
    # p(b|a) from explicit bigram: 10^-0.1
    got = float(lm.score(jnp.asarray([0]), jnp.asarray([1]))[0])
    np.testing.assert_allclose(got, -0.1 * np.log(10), atol=1e-5)
    # p(c|a) backs off: backoff(a) + p(c) = -0.3 + -1.0 in log10
    got2 = float(lm.score(jnp.asarray([0]), jnp.asarray([2]))[0])
    np.testing.assert_allclose(got2, (-0.3 - 1.0) * np.log(10), atol=1e-5)


def test_sequence_logprob():
    lm = NGramLM.from_token_corpus([[1, 2, 1, 2]], vocab_size=4, order=2)
    lp_likely = lm.sequence_logprob([1, 2, 1, 2])
    lp_unlikely = lm.sequence_logprob([3, 3, 3, 3])
    assert lp_likely > lp_unlikely
