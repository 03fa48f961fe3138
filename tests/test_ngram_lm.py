"""N-gram LM tests: Kneser-Ney normalization, backoff query semantics, ARPA
round-trip, and the headline capability — beam search + LM beats greedy when
acoustics are ambiguous (the KenLM/pyctcdecode use case, SURVEY.md N10)."""

import math

import numpy as np
import pytest

from tpu_asr.ops.decoding import CTCDecoding, ctc_prefix_beam_search
from tpu_asr.ops.ngram_lm import BOS, EOS, NgramLM


CORPUS = [
    [0, 1, 2, 3],
    [0, 1, 2, 4],
    [0, 1, 2, 3],
    [5, 1, 2, 3],
    [0, 1, 6, 3],
    [0, 1, 2, 3, 4, 5],
]
VOCAB = list(range(7))


@pytest.fixture(scope="module")
def lm():
    return NgramLM.train(CORPUS, order=3)


def test_distribution_normalizes(lm):
    """p(.|h) over the vocab + EOS must sum to <= 1 (leftover = unk mass)."""
    for ctx in [(), (0,), (1, 2), (9, 9), (0, 1)]:
        total = sum(math.exp(lm.log_prob(ctx, w)) for w in VOCAB + [EOS])
        assert total <= 1.0 + 1e-6, (ctx, total)
        assert total > 0.5, (ctx, total)   # most mass accounted for


def test_seen_ngram_beats_backoff(lm):
    # "1 2 -> 3" is frequent; "1 2 -> 6" never seen
    assert lm.log_prob((1, 2), 3) > lm.log_prob((1, 2), 6)
    # unseen context backs off to the Kneser-Ney continuation unigram, which
    # prefers tokens seen after MORE distinct predecessors (3 follows {2, 6})
    assert lm.log_prob((9, 9), 3) > lm.log_prob((9, 9), 6)


def test_score_sequence_prefers_corpus_sentences(lm):
    good = lm.score_sequence([0, 1, 2, 3])
    bad = lm.score_sequence([3, 6, 5, 0])
    assert good > bad


def test_arpa_round_trip(tmp_path, lm):
    path = str(tmp_path / "lm.arpa")
    lm.save_arpa(path)
    lm2 = NgramLM.load_arpa(path)
    assert lm2.order == lm.order
    for ctx, w in [((), 0), ((1, 2), 3), ((0, 1), 2), ((9, 9), 1)]:
        np.testing.assert_allclose(lm2.log_prob(ctx, w), lm.log_prob(ctx, w),
                                   atol=1e-5)
    s1 = lm.score_sequence([0, 1, 2, 3])
    s2 = lm2.score_sequence([0, 1, 2, 3])
    np.testing.assert_allclose(s1, s2, atol=1e-4)


def _ambiguous_log_probs(target, wrong, v=8, frames_per_tok=2):
    """Acoustic log-probs where `target[i]` vs `wrong[i]` are nearly tied
    (wrong slightly favored), so greedy picks wrong and only an LM fixes it."""
    blank = v
    rows = []
    for tgt, wr in zip(target, wrong):
        p = np.full(v + 1, 1e-4)
        if tgt == wr:
            p[tgt] = 0.9
        else:
            p[tgt] = 0.44
            p[wr] = 0.46          # acoustically the wrong token wins
        p[blank] = 0.08
        p /= p.sum()
        for _ in range(frames_per_tok):
            rows.append(np.log(p))
        b = np.full(v + 1, 1e-4)
        b[blank] = 1.0
        b /= b.sum()
        rows.append(np.log(b))
    return np.asarray(rows, np.float32)


def test_beam_with_lm_beats_greedy(lm):
    target = [0, 1, 2, 3]
    wrong = [0, 1, 6, 3]          # token 6 acoustically favored at position 2
    # make "0 1 6" unlikely: corpus has "0 1 2" 4x vs "0 1 6" 1x
    lp = _ambiguous_log_probs(target, wrong)

    greedy = []
    prev = -1
    for t in range(lp.shape[0]):
        c = int(np.argmax(lp[t]))
        if c != prev and c != lp.shape[1] - 1:
            greedy.append(c)
        prev = c
    assert greedy == wrong        # greedy is fooled

    hyps = ctc_prefix_beam_search(lp, beam_width=8,
                                  lm_score_fn=lm.lm_score_fn(),
                                  lm_weight=0.8)
    assert hyps[0].y_sequence == target


def test_ctc_decoding_accepts_ngram_lm(lm, tmp_path):
    class IdTok:
        def ids_to_text(self, ids):
            return " ".join(map(str, ids))

    dec = CTCDecoding(IdTok(), "beam", beam_width=8, ngram_lm=lm,
                      lm_weight=0.8)
    lp = _ambiguous_log_probs([0, 1, 2, 3], [0, 1, 6, 3])
    out = dec.ctc_decoder_predictions_tensor(lp[None], np.array([lp.shape[0]]))
    assert out[0] == "0 1 2 3"
    # ARPA-path constructor
    path = str(tmp_path / "lm.arpa")
    lm.save_arpa(path)
    dec2 = CTCDecoding(IdTok(), "beam", beam_width=8, ngram_lm=path,
                       lm_weight=0.8)
    out2 = dec2.ctc_decoder_predictions_tensor(lp[None], np.array([lp.shape[0]]))
    assert out2[0] == "0 1 2 3"
