"""CTC decoding-strategy tests (mirrors NeMo tests/collections/asr/decoding/
test_ctc_decoding.py coverage class: greedy vs beam, hypothesis contract,
path-merging correctness — SURVEY.md §4)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_asr.data.tokenizer import train_bpe
from tpu_asr.ops.ctc import ctc_greedy_decode
from tpu_asr.ops.decoding import (CTCDecoding, Hypothesis,
                                  ctc_prefix_beam_search)


def _logsm(x):
    x = np.asarray(x, np.float32)
    return x - np.log(np.exp(x - x.max(-1, keepdims=True)).sum(-1, keepdims=True)) \
        - x.max(-1, keepdims=True)


def test_beam_merges_paths_where_greedy_fails():
    """Classic CTC example: per-frame argmax picks blank, but the summed
    probability of paths emitting token 0 is higher — beam search must find
    it while greedy returns empty."""
    # V=3: tokens {0, 1}, blank=2
    probs = np.array([[0.4, 0.0, 0.6],
                      [0.4, 0.0, 0.6]], np.float32)
    lp = np.log(probs + 1e-9)
    hyps = ctc_prefix_beam_search(lp, beam_width=4)
    # P(empty) = 0.6*0.6 = 0.36; P([0]) = 0.4*0.6 + 0.6*0.4 + 0.4*0.4 = 0.64
    assert hyps[0].y_sequence == [0]
    np.testing.assert_allclose(math.exp(hyps[0].score), 0.64, rtol=1e-4)
    empty = [h for h in hyps if h.y_sequence == []][0]
    np.testing.assert_allclose(math.exp(empty.score), 0.36, rtol=1e-4)

    greedy_tokens, n = ctc_greedy_decode(jnp.asarray(lp)[None], jnp.asarray([2]))
    assert int(n[0]) == 0                      # greedy collapses to empty


def test_beam_matches_greedy_on_peaked_distributions():
    rng = np.random.default_rng(0)
    v, t = 8, 12
    # near-one-hot distributions -> beam and greedy must agree
    ids = rng.integers(0, v, size=t)
    lp = np.full((t, v), -20.0, np.float32)
    lp[np.arange(t), ids] = -1e-4
    hyps = ctc_prefix_beam_search(lp, beam_width=8)
    greedy_tokens, n = ctc_greedy_decode(jnp.asarray(lp)[None],
                                         jnp.asarray([t]))
    greedy_seq = np.asarray(greedy_tokens)[0][: int(n[0])].tolist()
    assert hyps[0].y_sequence == greedy_seq


def test_ctc_decoding_api_greedy_and_beam():
    tok = train_bpe(["ab ab ab", "b a"], vocab_size=16)
    v = tok.vocab_size + 1
    t = 6
    rng = np.random.default_rng(1)
    lp = _logsm(rng.normal(size=(2, t, v)).astype(np.float32))

    for strategy in ("greedy", "beam"):
        dec = CTCDecoding(tok, strategy=strategy, beam_width=4)
        texts = dec.ctc_decoder_predictions_tensor(lp, np.asarray([t, t]))
        assert len(texts) == 2 and all(isinstance(s, str) for s in texts)
        hyps = dec.ctc_decoder_predictions_tensor(lp, np.asarray([t, t]),
                                                  return_hypotheses=True)
        assert all(isinstance(h, Hypothesis) for h in hyps)
        assert all(h.text is not None for h in hyps)


def test_beam_respects_seq_len():
    lp = np.full((10, 3), np.log(1 / 3), np.float32)
    lp[5:, 0] = 0.0      # strong token after t=5
    hyps_full = ctc_prefix_beam_search(lp, beam_width=4)
    hyps_trunc = ctc_prefix_beam_search(lp, seq_len=5, beam_width=4)
    assert hyps_full[0].y_sequence != [] or hyps_trunc[0].y_sequence == []
    # truncated search never sees the late token mass
    assert all(h.score <= 0 for h in hyps_trunc)


def test_beam_lm_hook_biases_output():
    # uniform acoustics; LM prefers token 1
    lp = np.log(np.full((4, 3), 1 / 3, np.float32))
    lm = lambda prefix, c: (1.0 if c == 1 else -1.0)
    hyps = ctc_prefix_beam_search(lp, beam_width=8, lm_score_fn=lm,
                                  lm_weight=2.0)
    assert 1 in hyps[0].y_sequence
    assert 0 not in hyps[0].y_sequence


def test_greedy_timestamps():
    from tpu_asr.ops.ctc import ctc_greedy_decode_with_timestamps

    # frames: tok1 at t=0 (repeat at t=1 collapsed), blank, tok0 at t=3
    v = 3   # blank = 2
    lp = np.full((1, 5, v), -10.0, np.float32)
    lp[0, 0, 1] = 0.0
    lp[0, 1, 1] = 0.0
    lp[0, 2, 2] = 0.0
    lp[0, 3, 0] = 0.0
    lp[0, 4, 2] = 0.0
    tokens, n, frames = ctc_greedy_decode_with_timestamps(
        jnp.asarray(lp), jnp.asarray([5]))
    assert int(n[0]) == 2
    assert np.asarray(tokens)[0, :2].tolist() == [1, 0]
    assert np.asarray(frames)[0, :2].tolist() == [0, 3]

    # wired through CTCDecoding
    tok = train_bpe(["a b"], vocab_size=8)
    dec = CTCDecoding(tok, "greedy", compute_timestamps=True)
    v2 = tok.vocab_size + 1
    lp2 = np.full((1, 4, v2), -10.0, np.float32)
    lp2[0, :, v2 - 1] = 0.0          # blank everywhere...
    lp2[0, 1, v2 - 1] = -10.0
    lp2[0, 1, 1] = 0.0               # ...except token 1 at frame 1
    hyp = dec.ctc_decoder_predictions_tensor(
        jnp.asarray(lp2), np.asarray([4]), return_hypotheses=True)[0]
    # NeMo dict shape (test_timestamps.py:142-153): timestep/char/word/segment
    assert hyp.timestamp["timestep"] == [1]
    assert hyp.timestamp["char"][0]["start_offset"] == 1
    assert hyp.timestamp["char"][0]["end_offset"] == 1
    words = [w["word"] for w in hyp.timestamp["word"]]
    assert " ".join(words) == hyp.text


def test_lexicon_constrains_beam():
    """Lexicon-constrained search (flashlight strategy): the acoustically
    best token string is off-lexicon; the constrained beam returns the best
    IN-lexicon string, the unconstrained beam returns the raw one."""
    from tpu_asr.ops.decoding import Lexicon

    # V=4: tokens {0,1,2}, blank=3. Acoustics prefer [0, 2] but the lexicon
    # only contains words (0,1) and (2,).
    probs = np.array([[0.6, 0.25, 0.1, 0.05],
                      [0.05, 0.1, 0.05, 0.8],
                      [0.1, 0.25, 0.6, 0.05]], np.float32)
    lp = np.log(probs + 1e-9)
    unconstrained = ctc_prefix_beam_search(lp, beam_width=8)
    assert unconstrained[0].y_sequence == [0, 2]

    lex = Lexicon([[0, 1], [2]])
    constrained = ctc_prefix_beam_search(lp, beam_width=8, lexicon=lex)
    # every hypothesis must be a concatenation of lexicon words
    def in_lex(seq):
        i = 0
        while i < len(seq):
            if seq[i] == 0:
                if i + 1 >= len(seq) or seq[i + 1] != 1:
                    return False
                i += 2
            elif seq[i] == 2:
                i += 1
            else:
                return False
        return True
    assert all(in_lex(h.y_sequence) for h in constrained)
    assert constrained[0].y_sequence != unconstrained[0].y_sequence
    # trie chaining: a completed word may start another
    lex2 = Lexicon([[0], [2]])
    chained = ctc_prefix_beam_search(lp, beam_width=8, lexicon=lex2)
    assert chained[0].y_sequence == [0, 2]


def test_ctc_decoding_lexicon_words_api():
    """CTCDecoding(lexicon_words=...) builds the trie via the tokenizer and
    only emits words from the list."""
    corpus = ["ab ba aa", "ab aa", "ba ab"]
    tok = train_bpe(corpus, vocab_size=16)
    dec = CTCDecoding(tok, strategy="beam", beam_width=8,
                      lexicon_words=["ab", "ba"])
    v = tok.vocab_size + 1                      # + blank
    rng = np.random.default_rng(0)
    lp = _logsm(rng.normal(size=(2, 12, v)).astype(np.float32))
    texts = dec.ctc_decoder_predictions_tensor(lp, np.asarray([12, 12]))
    for s in texts:
        assert all(w in ("ab", "ba") for w in s.split()), s
