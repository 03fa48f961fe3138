"""Confidence estimation + timestamp-offset tests.

Mirrors the reference's pinned contracts for the snapshot-stripped
`asr_confidence_utils` (NeMo/tests/collections/asr/confidence/
test_asr_confidence_primitives.py) and the CTCDecoding word/segment offset
rules (NeMo/tests/collections/asr/decoding/test_timestamps.py,
test_ctc_decoding.py:207-287)."""

import math

import numpy as np
import pytest

from tpu_asr.ops.confidence import (ConfidenceConfig, ConfidenceMethodConfig,
                                    get_confidence_aggregation_bank,
                                    get_confidence_measure_bank)

VOCABS = (100, 1000)
ALPHAS = (0.25, 0.5, 1.0)
TOL = 1e-6


def _logsm(x):
    x = np.asarray(x, np.float64)
    m = x.max(-1, keepdims=True)
    return x - m - np.log(np.exp(x - m).sum(-1, keepdims=True))


def _one_hot_lp(v):
    # two rows, probability-one at different positions (reference fixture
    # construction: log-probs with -inf replaced by a huge negative)
    lp = np.full((2, v), -1e4, np.float64)
    lp[0, 0] = 0.0
    lp[1, v - 3] = 0.0
    return lp


def _uniform_lp(v):
    return np.full((2, v), math.log(1.0 / v), np.float64)


@pytest.mark.parametrize("vocab", VOCABS)
@pytest.mark.parametrize("alpha", ALPHAS)
@pytest.mark.parametrize("name", sorted(get_confidence_measure_bank()))
def test_measure_one_hot_is_one(name, alpha, vocab):
    measure = get_confidence_measure_bank()[name]
    out = np.asarray(measure(_one_hot_lp(vocab), vocab, alpha))
    np.testing.assert_allclose(out, [1.0, 1.0], atol=TOL)


@pytest.mark.parametrize("vocab", VOCABS)
@pytest.mark.parametrize("alpha", ALPHAS)
@pytest.mark.parametrize("name", sorted(get_confidence_measure_bank()))
def test_measure_uniform_is_zero(name, alpha, vocab):
    measure = get_confidence_measure_bank()[name]
    out = np.asarray(measure(_uniform_lp(vocab), vocab, alpha))
    np.testing.assert_allclose(out, [0.0, 0.0], atol=TOL)


@pytest.mark.parametrize("vocab", VOCABS)
@pytest.mark.parametrize("alpha", ALPHAS)
@pytest.mark.parametrize("name", sorted(get_confidence_measure_bank()))
def test_measure_partial_order(name, alpha, vocab):
    """A peakier distribution must score strictly higher, within [0, 1]
    (reference partial-order contract: rand softmax vs the same logits with
    one entry boosted by +vocab)."""
    rng = np.random.default_rng(0)
    logits = rng.uniform(0.0, 1.0, size=(1, vocab))
    overfit = logits.copy()
    overfit[0, 0] += vocab
    measure = get_confidence_measure_bank()[name]
    lo = round(float(np.asarray(measure(_logsm(logits), vocab, alpha))[0]), 6)
    hi = round(float(np.asarray(measure(_logsm(overfit), vocab, alpha))[0]), 6)
    assert 0.0 <= lo < hi <= 1.0, (name, alpha, vocab, lo, hi)


def test_aggregation_bank():
    bank = get_confidence_aggregation_bank()
    xs = [0.0, 0.5, 1.0]
    assert bank["mean"](xs) == pytest.approx(0.5)
    assert bank["min"](xs) == 0.0
    assert bank["max"](xs) == 1.0
    assert bank["prod"](xs) == 0.0
    assert bank["prod"]([0.5, 0.5]) == pytest.approx(0.25)
    assert bank["mean"]([]) == 0.0


# ---- decoding integration --------------------------------------------------


def _make_decoding(**kw):
    from tpu_asr.data.tokenizer import train_bpe
    from tpu_asr.ops.decoding import CTCDecoding
    tok = train_bpe(["ab ba abba", "b a bb"], vocab_size=16)
    return tok, CTCDecoding(tok, "greedy", **kw)


def _peaked_lp(frames, v):
    """(1, T, V) log-probs with prob ~1 on the given id per frame."""
    t = len(frames)
    lp = np.full((1, t, v), -15.0, np.float32)
    for i, c in enumerate(frames):
        lp[0, i, c] = -1e-3
    return _logsm(lp).astype(np.float32)


def test_greedy_confidence_fields():
    cfg = ConfidenceConfig(preserve_frame_confidence=True,
                           preserve_token_confidence=True,
                           preserve_word_confidence=True)
    tok, dec = _make_decoding(confidence_cfg=cfg, compute_timestamps=True)
    v = tok.vocab_size + 1
    blank = v - 1
    # tok1 tok1 blank tok2 blank
    lp = _peaked_lp([1, 1, blank, 2, blank], v)
    hyp = dec.ctc_decoder_predictions_tensor(
        lp, np.asarray([5]), return_hypotheses=True)[0]
    assert hyp.y_sequence == [1, 2]
    assert len(hyp.frame_confidence) == 5
    assert all(0.0 <= c <= 1.0 for c in hyp.frame_confidence)
    # peaked frames are near-certain
    assert min(hyp.frame_confidence) > 0.9
    assert len(hyp.token_confidence) == 2
    # one word-confidence entry per word offset
    assert len(hyp.word_confidence) == len(hyp.timestamp["word"])


def test_token_confidence_exclude_blank_semantics():
    """exclude_blank=True pools only the token's own emission-run frames;
    False extends the pool to the following blank frames."""
    tok, _ = _make_decoding()
    v = tok.vocab_size + 1
    blank = v - 1
    # certain token frame, then two very UNCERTAIN blank frames
    lp = np.full((1, 3, v), -15.0, np.float32)
    lp[0, 0, 1] = -1e-3
    lp[0, 1, :] = 0.0            # uniform -> confidence ~0
    lp[0, 1, blank] = 0.5        # argmax still blank
    lp[0, 2, :] = 0.0
    lp[0, 2, blank] = 0.5
    lp = _logsm(lp).astype(np.float32)

    from tpu_asr.ops.decoding import CTCDecoding
    out = {}
    for exclude in (True, False):
        cfg = ConfidenceConfig(preserve_token_confidence=True,
                               exclude_blank=exclude, aggregation="min")
        dec = CTCDecoding(tok, "greedy", confidence_cfg=cfg)
        hyp = dec.ctc_decoder_predictions_tensor(
            lp, np.asarray([3]), return_hypotheses=True)[0]
        assert hyp.y_sequence == [1]
        out[exclude] = hyp.token_confidence[0]
    assert out[True] > 0.9            # only the certain emission frame
    assert out[False] < 0.5           # min over the uncertain blank frames


def test_preserve_alignments():
    tok, dec = _make_decoding(preserve_alignments=True)
    v = tok.vocab_size + 1
    blank = v - 1
    lp = _peaked_lp([blank, 3, blank, 3], v)
    hyp = dec.ctc_decoder_predictions_tensor(
        lp, np.asarray([4]), return_hypotheses=True)[0]
    labels, frame_lp = hyp.alignments
    assert labels.tolist() == [blank, 3, blank, 3]
    assert frame_lp.shape == (4, v)
    np.testing.assert_allclose(frame_lp, lp[0], atol=1e-6)


def test_confidence_rejects_beam():
    tok, _ = _make_decoding()
    from tpu_asr.ops.decoding import CTCDecoding
    with pytest.raises(ValueError):
        CTCDecoding(tok, "beam",
                    confidence_cfg=ConfidenceConfig(
                        preserve_frame_confidence=True))


def test_method_cfg_names():
    assert ConfidenceMethodConfig().measure_name() == "entropy_tsallis_exp"
    assert ConfidenceMethodConfig(name="max_prob").measure_name() == "max_prob"
    assert ConfidenceMethodConfig(
        entropy_type="renyi", entropy_norm="lin").measure_name() \
        == "entropy_renyi_lin"
    with pytest.raises(ValueError):
        ConfidenceMethodConfig(name="nope").measure_name()


# ---- word / segment offsets -------------------------------------------------


def _char_decoding():
    from tpu_asr.data.tokenizer import CharTokenizer
    from tpu_asr.ops.decoding import CTCDecoding
    tok = CharTokenizer.from_corpus(["hi yo. ok?"])
    return CTCDecoding(tok, "greedy")


def test_word_offsets_chars_and_punctuation_merge():
    dec = _char_decoding()
    # "hi yo ." with the '.' standing alone -> merges into 'yo.'
    char_offsets = [
        {"char": "h", "start_offset": 0, "end_offset": 0},
        {"char": "i", "start_offset": 1, "end_offset": 2},
        {"char": " ", "start_offset": 3, "end_offset": 3},
        {"char": "y", "start_offset": 4, "end_offset": 4},
        {"char": "o", "start_offset": 5, "end_offset": 6},
        {"char": " ", "start_offset": 7, "end_offset": 7},
        {"char": ".", "start_offset": 8, "end_offset": 9},
    ]
    words = dec.get_words_offsets(char_offsets=char_offsets,
                                  encoded_char_offsets=None,
                                  word_delimiter_char=" ",
                                  supported_punctuation={".", "!", "?"})
    assert words == [
        {"word": "hi", "start_offset": 0, "end_offset": 2},
        {"word": "yo.", "start_offset": 4, "end_offset": 9},
    ]


def test_word_offsets_chars_other_delimiter():
    dec = _char_decoding()
    # delimiter '.' -> spaces stay inside words
    char_offsets = [
        {"char": "a", "start_offset": 0, "end_offset": 0},
        {"char": " ", "start_offset": 1, "end_offset": 1},
        {"char": "b", "start_offset": 2, "end_offset": 2},
        {"char": ".", "start_offset": 3, "end_offset": 3},
        {"char": "c", "start_offset": 4, "end_offset": 5},
    ]
    words = dec.get_words_offsets(char_offsets=char_offsets,
                                  encoded_char_offsets=None,
                                  word_delimiter_char=".",
                                  supported_punctuation={".", "!", "?"})
    assert words == [
        {"word": "a b", "start_offset": 0, "end_offset": 2},
        {"word": "c", "start_offset": 4, "end_offset": 5},
    ]


def test_word_offsets_subword():
    """BPE path: word start = first piece's start_offset, end = last
    constituent piece's end_offset; a custom delimiter groups the units
    between delimiter matches into one space-joined word."""
    from tpu_asr.data.tokenizer import train_bpe
    from tpu_asr.ops.decoding import CTCDecoding
    tok = train_bpe(["abba c abba", "c abba cc"], vocab_size=24)
    dec = CTCDecoding(tok, "greedy")

    ids_abba = tok.text_to_ids("abba")
    ids_c = tok.text_to_ids("c")
    ids = ids_abba + ids_c + ids_abba
    # synthetic frame extents: token j spans [2j, 2j+1]
    enc = [{"char": t, "start_offset": 2 * j, "end_offset": 2 * j + 1}
           for j, t in enumerate(ids)]
    words = dec.get_words_offsets(char_offsets=None,
                                  encoded_char_offsets=enc,
                                  word_delimiter_char=" ",
                                  supported_punctuation={".", "!", "?"})
    assert [w["word"] for w in words] == ["abba", "c", "abba"]
    na = len(ids_abba)
    assert words[0] == {"word": "abba", "start_offset": 0,
                        "end_offset": 2 * (na - 1) + 1}
    assert words[1]["start_offset"] == 2 * na

    # custom delimiter 'c' drops the matching unit and merges across it
    words2 = dec.get_words_offsets(char_offsets=None,
                                   encoded_char_offsets=enc,
                                   word_delimiter_char="c",
                                   supported_punctuation={".", "!", "?"})
    assert [w["word"] for w in words2] == ["abba", "abba"]
    assert words2[1]["start_offset"] == 2 * (na + len(ids_c))


def test_segment_offsets_delimiter_and_gap():
    dec = _char_decoding()
    words = [
        {"word": "hi", "start_offset": 0, "end_offset": 2},
        {"word": "yo.", "start_offset": 4, "end_offset": 9},
        {"word": "ok?", "start_offset": 12, "end_offset": 15},
    ]
    segs = dec._get_segment_offsets(words, [".", "?", "!"], {".", "?", "!"})
    assert segs == [
        {"segment": "hi yo.", "start_offset": 0, "end_offset": 9},
        {"segment": "ok?", "start_offset": 12, "end_offset": 15},
    ]
    # gap-based: only the 9->12 gap (3) exceeds threshold 2
    segs_gap = dec._get_segment_offsets(words, [], {},
                                        segment_gap_threshold=2)
    assert segs_gap == [
        {"segment": "hi yo.", "start_offset": 0, "end_offset": 9},
        {"segment": "ok?", "start_offset": 12, "end_offset": 15},
    ]
    segs_nogap = dec._get_segment_offsets(words, [], {},
                                          segment_gap_threshold=10)
    assert [s["segment"] for s in segs_nogap] == ["hi yo. ok?"]


def test_greedy_timestamp_dict_end_offsets():
    """End offset = last frame of the token's emission run (repeats +
    boundary truncation)."""
    tok, dec = _make_decoding(compute_timestamps=True)
    v = tok.vocab_size + 1
    blank = v - 1
    # tok2 x3 frames, blank, tok3 runs to the length boundary
    lp = _peaked_lp([2, 2, 2, blank, 3, 3], v)
    hyp = dec.ctc_decoder_predictions_tensor(
        lp, np.asarray([5]), return_hypotheses=True)[0]
    assert hyp.y_sequence == [2, 3]
    chars = hyp.timestamp["char"]
    assert (chars[0]["start_offset"], chars[0]["end_offset"]) == (0, 2)
    # length=5 truncates the second run at frame 4
    assert (chars[1]["start_offset"], chars[1]["end_offset"]) == (4, 4)
