"""WER metric tests (contract from reference wer.py:35-208)."""

import numpy as np
import pytest

from tpu_asr.utils.wer import (
    WERMetric,
    edit_distance,
    word_error_rate,
    word_error_rate_detail,
    word_error_rate_per_utt,
)


def test_edit_distance():
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance([], []) == 0
    assert edit_distance(["a"], []) == 1
    assert edit_distance([1, 2, 3], [1, 3]) == 1


def test_word_error_rate():
    assert word_error_rate(["the cat sat"], ["the cat sat"]) == 0.0
    # 1 sub out of 3 ref words
    assert word_error_rate(["the dog sat"], ["the cat sat"]) == pytest.approx(1 / 3)
    # aggregate: sum distances / sum ref words
    wer = word_error_rate(["a b", "x"], ["a b c", "x y"])
    assert wer == pytest.approx(2 / 5)
    # CER
    assert word_error_rate(["abc"], ["abd"], use_cer=True) == pytest.approx(1 / 3)


def test_word_error_rate_detail():
    wer, words, ins, dels, subs = word_error_rate_detail(["the dog sat down"], ["the cat sat"])
    assert words == 3
    assert wer == pytest.approx(2 / 3)
    assert ins == pytest.approx(1 / 3)
    assert subs == pytest.approx(1 / 3)
    assert dels == 0.0


def test_word_error_rate_per_utt():
    wers, agg = word_error_rate_per_utt(["a b", "x y"], ["a b", "x z"])
    assert wers == [0.0, 0.5]
    assert agg == pytest.approx(1 / 4)


def test_wer_metric_accumulate_and_merge():
    m1 = WERMetric()
    m1.update(["the dog"], ["the cat"])
    m2 = WERMetric()
    m2.update(["hello world"], ["hello world"])
    m1.merge(m2)
    assert m1.compute() == pytest.approx(1 / 4)
    m1.reset()
    assert m1.words == 0
