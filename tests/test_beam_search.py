"""Batched device beam search vs the host prefix-search oracle
(VERDICT r2 next #4: the Python implementation stays as the semantics
oracle; the lax.scan search must match it)."""

import numpy as np
import pytest

from tpu_asr.ops.beam_search import ctc_beam_search_batched
from tpu_asr.ops.ctc import ctc_greedy_decode
from tpu_asr.ops.decoding import CTCDecoding, ctc_prefix_beam_search

B, T, V = 4, 25, 8          # blank = V-1; oracle's top-2W pruning is a no-op
W = 8                       # when 2W >= V, so both searches are exhaustive


def _rand_log_probs(seed, b=B, t=T, v=V):
    rng = np.random.default_rng(seed)
    x = rng.normal(scale=2.0, size=(b, t, v)).astype(np.float32)
    return x - np.log(np.exp(x).sum(-1, keepdims=True))


def _oracle(lp, lens, **kw):
    return [ctc_prefix_beam_search(lp[i], int(lens[i]), W, **kw)
            for i in range(lp.shape[0])]


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_beam_parity_no_lm(seed):
    lp = _rand_log_probs(seed)
    lens = np.asarray([T, T - 3, T - 7, 5], np.int32)
    tokens, tok_lens, scores = ctc_beam_search_batched(
        lp, lens, beam_width=W)
    ref = _oracle(lp, lens)
    for i in range(B):
        got = tokens[i, 0, :tok_lens[i, 0]].tolist()
        assert got == ref[i][0].y_sequence, f"row {i}"
        np.testing.assert_allclose(float(scores[i, 0]), ref[i][0].score,
                                   rtol=1e-4, atol=1e-4)


def test_beam_parity_word_bonus():
    lp = _rand_log_probs(11)
    lens = np.full((B,), T, np.int32)
    tokens, tok_lens, scores = ctc_beam_search_batched(
        lp, lens, beam_width=W, word_bonus=0.8)
    ref = _oracle(lp, lens, word_bonus=0.8)
    for i in range(B):
        assert tokens[i, 0, :tok_lens[i, 0]].tolist() == ref[i][0].y_sequence
        np.testing.assert_allclose(float(scores[i, 0]), ref[i][0].score,
                                   rtol=1e-4, atol=1e-4)


def test_beam_parity_bigram_lm():
    rng = np.random.default_rng(5)
    lm = rng.normal(scale=0.5, size=(V, V)).astype(np.float32)
    blank = V - 1
    lp = _rand_log_probs(6)
    lens = np.asarray([T, T - 2, 9, T], np.int32)

    def lm_fn(prefix, c):
        prev = prefix[-1] if prefix else blank       # BOS row = blank
        return float(lm[prev, c])

    tokens, tok_lens, scores = ctc_beam_search_batched(
        lp, lens, beam_width=W, bigram_lm=lm, lm_weight=0.7)
    ref = _oracle(lp, lens, lm_score_fn=lm_fn, lm_weight=0.7)
    for i in range(B):
        assert tokens[i, 0, :tok_lens[i, 0]].tolist() == ref[i][0].y_sequence
        np.testing.assert_allclose(float(scores[i, 0]), ref[i][0].score,
                                   rtol=1e-4, atol=1e-4)


def test_beam_topk_beams_are_distinct_and_sorted():
    lp = _rand_log_probs(7)
    lens = np.full((B,), T, np.int32)
    tokens, tok_lens, scores = ctc_beam_search_batched(lp, lens, beam_width=W)
    scores = np.asarray(scores)
    for i in range(B):
        assert all(scores[i, j] >= scores[i, j + 1] for j in range(W - 1))
        live = [tuple(tokens[i, j, :tok_lens[i, j]].tolist())
                for j in range(W) if scores[i, j] > -1e29]
        assert len(live) == len(set(live)), "duplicate surviving prefixes"


def test_beam_matches_greedy_on_peaked_probs():
    """With near-one-hot frame posteriors the beam search must return the
    greedy collapse."""
    rng = np.random.default_rng(9)
    ids = rng.integers(0, V, size=(B, T))
    lp = np.full((B, T, V), -12.0, np.float32)
    for i in range(B):
        lp[i, np.arange(T), ids[i]] = -1e-3
    lens = np.full((B,), T, np.int32)
    g_tokens, g_lens = ctc_greedy_decode(lp, lens)
    tokens, tok_lens, _ = ctc_beam_search_batched(lp, lens, beam_width=4)
    for i in range(B):
        assert (tokens[i, 0, :tok_lens[i, 0]].tolist()
                == np.asarray(g_tokens)[i, :np.asarray(g_lens)[i]].tolist())


class _IdTok:
    def ids_to_text(self, ids):
        return " ".join(map(str, ids))

    def text_to_ids(self, text):
        return [int(x) for x in text.split()]


def test_ctcdecoding_beam_batch_strategy():
    lp = _rand_log_probs(3)
    lens = np.full((B,), T, np.int32)
    dec_host = CTCDecoding(_IdTok(), "beam", beam_width=W)
    dec_dev = CTCDecoding(_IdTok(), "beam_batch", beam_width=W)
    assert dec_dev.ctc_decoder_predictions_tensor(lp, lens) == \
        dec_host.ctc_decoder_predictions_tensor(lp, lens)
    with pytest.raises(ValueError, match="beam_batch"):
        CTCDecoding(_IdTok(), "beam_batch", lexicon_words=["1 2"])


@pytest.mark.parametrize("seed", [0, 7])
def test_beam_parity_tiny_vocab_wide_beam(seed):
    """Degenerate regime: beam wider than the finite-candidate pool (V=3,
    W=8). Early steps keep -inf leftover slots, and merged-away extend slots
    can be re-selected as duplicate beams — the step-start canonicalization
    (sort-free merge, ops/beam_search.py) must fold those so scores match
    the host oracle exactly."""
    v, w, t = 3, 8, 12                 # 2 real tokens + blank
    lp = _rand_log_probs(seed, b=3, t=t, v=v)
    lens = np.asarray([t, t - 4, 3], np.int32)
    tokens, tok_lens, scores = ctc_beam_search_batched(
        lp, lens, beam_width=w, blank=v - 1)
    ref = [ctc_prefix_beam_search(lp[i], int(lens[i]), w) for i in range(3)]
    for i in range(3):
        got = tokens[i, 0, :tok_lens[i, 0]].tolist()
        assert got == ref[i][0].y_sequence, f"row {i}"
        np.testing.assert_allclose(float(scores[i, 0]), ref[i][0].score,
                                   rtol=1e-4, atol=1e-4)
        # the full beam's score list must match too (mass must not split
        # across duplicate slots)
        finite = [h.score for h in ref[i] if np.isfinite(h.score)]
        got_s = [float(s) for s in scores[i] if float(s) > -1e29]
        np.testing.assert_allclose(sorted(got_s, reverse=True)[:len(finite)],
                                   sorted(finite, reverse=True)[:len(got_s)],
                                   rtol=1e-4, atol=1e-4)


def _train_tiny_lm(order=3, vocab=V - 1, n_seqs=40, seed=9):
    from tpu_asr.ops.ngram_lm import NgramLM
    rng = np.random.default_rng(seed)
    seqs = [rng.integers(0, vocab, size=rng.integers(3, 12)).tolist()
            for _ in range(n_seqs)]
    return NgramLM.train(seqs, order=order)


def test_dense_automaton_query_parity():
    """to_dense_automaton must reproduce lm_score_fn exactly: walking the
    automaton over any history yields the same backoff-resolved scores."""
    lm = _train_tiny_lm()
    scores, nxt, init = lm.to_dense_automaton(V)
    fn = lm.lm_score_fn()
    rng = np.random.default_rng(3)
    for _ in range(50):
        hist = rng.integers(0, V - 1, size=rng.integers(0, 9)).tolist()
        s = init
        for tok in hist:
            s = int(nxt[s, tok])
        tok = int(rng.integers(0, V - 1))
        np.testing.assert_allclose(float(scores[s, tok]),
                                   fn(tuple(hist), tok), rtol=1e-6, atol=1e-6)


def test_beam_parity_ngram_lm():
    """Device beam with the compiled ARPA/backoff automaton == host beam
    with the NgramLM callback (full-fusion parity, not just bigram)."""
    lm = _train_tiny_lm()
    tables = lm.to_dense_automaton(V)
    lp = _rand_log_probs(17)
    lens = np.asarray([T, T - 4, 7, T], np.int32)
    tokens, tok_lens, scores = ctc_beam_search_batched(
        lp, lens, beam_width=W, ngram_tables=tables, lm_weight=0.6)
    ref = _oracle(lp, lens, lm_score_fn=lm.lm_score_fn(), lm_weight=0.6)
    for i in range(B):
        assert tokens[i, 0, :tok_lens[i, 0]].tolist() == ref[i][0].y_sequence
        np.testing.assert_allclose(float(scores[i, 0]), ref[i][0].score,
                                   rtol=1e-4, atol=1e-4)


def test_ctcdecoding_beam_batch_ngram_lm_roundtrip(tmp_path):
    """CTCDecoding(strategy='beam_batch', ngram_lm=<ARPA path>) compiles the
    LM to the automaton lazily and matches strategy='beam' with the same LM."""
    lm = _train_tiny_lm()
    arpa = tmp_path / "lm.arpa"
    lm.save_arpa(str(arpa))

    class _Tok:
        vocab_size = V - 1

        def ids_to_text(self, ids):
            return " ".join(str(i) for i in ids)

    lp = _rand_log_probs(23)
    lens = np.full((B,), T, np.int32)
    dev = CTCDecoding(_Tok(), strategy="beam_batch", beam_width=W,
                      ngram_lm=str(arpa), lm_weight=0.5)
    host = CTCDecoding(_Tok(), strategy="beam", beam_width=W,
                       ngram_lm=str(arpa), lm_weight=0.5)
    got = dev.ctc_decoder_predictions_tensor(lp, lens)
    ref = host.ctc_decoder_predictions_tensor(lp, lens)
    assert got == ref
