"""Non-builder-authored oracles (VERDICT.md round-1 item 4: de-circularize the
parity tests). Every oracle here is independent third-party code or a
published spec, NOT a re-derivation by this repo's author:

- HuggingFace `tokenizers` (Rust): independent Unigram-Viterbi and BPE-merge
  implementations — cross-checks data/tokenizer.py's SentencePiece encode.
- torch.stft / scipy hann: the exact frontend library the reference wraps
  (NeMo FilterbankFeatures uses torch.stft) — frame-length contract replicated
  from the reference's own test
  (/root/reference/NeMo/tests/collections/asr/test_asr_filterbankfeatures_seq_len.py:24-55).
- Slaney mel-scale published constants (librosa.filters.mel(htk=False) spec):
  breakpoint 1000 Hz, linear slope 200/3, log step ln(6.4)/27, area
  normalization 2/(f[i+2]-f[i]) — property-checks ops/features.mel_filterbank
  against the spec rather than against itself.
- Classic Wagner-Fischer DP written from the textbook recurrence —
  cross-checks the native editdistance C extension.
"""

import math

import numpy as np
import pytest
import torch

from tpu_asr.data.tokenizer import SentencePieceBPETokenizer
from tpu_asr.ops.features import mel_filterbank
from tpu_asr.utils.wer import word_error_rate

tokenizers = pytest.importorskip("tokenizers")
from tokenizers import Tokenizer
from tokenizers.models import BPE, Unigram

WS = "▁"   # ▁


# --------------------------------------------------------------------------
# SentencePiece encode vs HuggingFace tokenizers (independent Rust impl)
# --------------------------------------------------------------------------

UNI_VOCAB = [
    ("<unk>", 0.0),
    (WS, -4.1), (WS + "a", -2.0), (WS + "ab", -1.9), (WS + "b", -3.3),
    ("a", -2.8), ("b", -3.0), ("c", -3.6), ("ab", -2.5), ("bc", -2.9),
    ("abc", -4.4), (WS + "abc", -4.05), ("ca", -3.2),
]


@pytest.fixture(scope="module")
def uni_pair():
    mine = SentencePieceBPETokenizer(
        [("<unk>", 0.0, 2)] + [(p, s, 1) for p, s in UNI_VOCAB[1:]],
        model_type="unigram")
    hf = Tokenizer(Unigram(UNI_VOCAB, unk_id=0, byte_fallback=False))
    return mine, hf


@pytest.mark.parametrize("text", [
    "ab", "abc", "a", "b a", "ab ab", "abc ab a", "cab", "abcabc",
    "a b c", "ab c a b", "abca", "b",
])
def test_unigram_viterbi_matches_hf_tokenizers(uni_pair, text):
    mine, hf = uni_pair
    meta = WS + text.replace(" ", WS)
    want = hf.encode(meta).tokens
    got = mine.encode_pieces(text)
    assert got == want, (text, got, want)


def test_bpe_merges_match_hf_tokenizers():
    merges = [(WS, "a"), ("a", "b"), (WS + "a", "b"), ("b", "c"),
              (WS, "b"), ("ab", "c")]
    alphabet = [WS, "a", "b", "c"]
    vocab_list = alphabet + [a + b for a, b in merges]
    hf_vocab = {p: i for i, p in enumerate(vocab_list)}
    hf = Tokenizer(BPE(hf_vocab, merges, unk_token=None))
    # SentencePiece BPE: greedy highest-score merge == HF lowest-rank merge
    # when merged-piece score = -rank
    pieces = [("<unk>", 0.0, 2)]
    pieces += [(p, -1000.0, 1) for p in alphabet]
    pieces += [(a + b, -float(r), 1) for r, (a, b) in enumerate(merges)]
    mine = SentencePieceBPETokenizer(pieces, model_type="bpe")
    for text in ["ab", "abc", "a b", "ab ab c", "b ab", "cab", "abcb",
                 "c c c", "a ab abc"]:
        meta = WS + text.replace(" ", WS)
        want = hf.encode(meta, is_pretokenized=False).tokens
        got = mine.encode_pieces(text)
        assert got == want, (text, got, want)


# --------------------------------------------------------------------------
# Frame-length contract: the reference's own filterbank test, replicated
# --------------------------------------------------------------------------

def test_seq_len_contract_from_reference_testfile():
    """Replicates test_asr_filterbankfeatures_seq_len.py:36-55 numerically:
    for random (n_fft, win, hop, L), frames == torch.stft(center=True) frames
    == L // hop + 1, and our featurizer's length math agrees."""
    from tpu_asr.config import PreprocessorConfig
    from tpu_asr.ops.features import FilterbankFeatures, stft_seq_len
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    for _ in range(5):
        nfft = 2 ** int(rng.integers(7, 12))
        win = int(rng.integers(100, nfft))
        hop = int(rng.integers(64, win))
        L = int(rng.integers(nfft, 2 ** 14))
        x = torch.randn(1, L)
        spec = torch.stft(x, n_fft=nfft, hop_length=hop, win_length=win,
                          window=torch.hann_window(win), center=True,
                          return_complex=True)
        torch_frames = spec.shape[2]
        ours = int(stft_seq_len(jnp.asarray([L]), nfft, hop)[0])
        assert ours == torch_frames == L // hop + 1, (nfft, win, hop, L)


# --------------------------------------------------------------------------
# Slaney mel filterbank vs the published spec constants
# --------------------------------------------------------------------------

def _slaney_hz_to_mel(f):
    """Published Slaney (Auditory Toolbox) mel scale: linear below 1 kHz at
    3/200 mel/Hz, logarithmic above with step ln(6.4)/27 per mel."""
    f = np.asarray(f, np.float64)
    mel = f * 3.0 / 200.0
    log_region = f >= 1000.0
    safe = np.where(log_region, f, 1000.0)
    mel = np.where(log_region,
                   15.0 + np.log(safe / 1000.0) / (np.log(6.4) / 27.0), mel)
    return mel


def _slaney_mel_to_hz(m):
    m = np.asarray(m, np.float64)
    f = m * 200.0 / 3.0
    log_region = m >= 15.0
    return np.where(log_region, 1000.0 * np.exp((np.log(6.4) / 27.0) *
                                                (m - 15.0)), f)


def test_mel_filterbank_matches_slaney_spec():
    sr, n_fft, n_mels = 16000, 512, 80
    fb = np.asarray(mel_filterbank(sr, n_fft, n_mels), np.float64)
    assert fb.shape == (n_mels, n_fft // 2 + 1)

    # independent construction straight from the published formula
    fft_freqs = np.linspace(0.0, sr / 2.0, n_fft // 2 + 1)
    mel_pts = np.linspace(_slaney_hz_to_mel(0.0), _slaney_hz_to_mel(sr / 2.0),
                          n_mels + 2)
    hz_pts = _slaney_mel_to_hz(mel_pts)
    want = np.zeros_like(fb)
    for m in range(n_mels):
        lo, ctr, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (fft_freqs - lo) / (ctr - lo)
        down = (hi - fft_freqs) / (hi - ctr)
        tri = np.maximum(0.0, np.minimum(up, down))
        want[m] = tri * 2.0 / (hi - lo)        # slaney area normalization
    np.testing.assert_allclose(fb, want, atol=1e-6)


# --------------------------------------------------------------------------
# Edit distance: textbook Wagner-Fischer DP vs the native C extension
# --------------------------------------------------------------------------

def _wagner_fischer(a, b):
    m, n = len(a), len(b)
    d = np.zeros((m + 1, n + 1), np.int64)
    d[:, 0] = np.arange(m + 1)
    d[0, :] = np.arange(n + 1)
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            d[i, j] = min(d[i - 1, j] + 1, d[i, j - 1] + 1,
                          d[i - 1, j - 1] + (a[i - 1] != b[j - 1]))
    return int(d[m, n])


def test_word_error_rate_matches_textbook_dp():
    rng = np.random.default_rng(1)
    vocab = ["the", "cat", "sat", "on", "mat", "dog", "ran", "far"]
    for _ in range(20):
        ref = " ".join(rng.choice(vocab, size=rng.integers(1, 10)))
        hyp = " ".join(rng.choice(vocab, size=rng.integers(0, 10)))
        want = _wagner_fischer(hyp.split(), ref.split()) / max(
            len(ref.split()), 1)
        got = word_error_rate([hyp], [ref])
        np.testing.assert_allclose(got, want, atol=1e-9)


def test_wordpiece_matches_hf_tokenizers():
    """WordPieceTokenizer vs HuggingFace's Rust WordPiece on the same vocab:
    greedy longest-match with '##' continuations, whole-word [UNK]."""
    from tokenizers.models import WordPiece as HFWordPiece
    from tokenizers.pre_tokenizers import Whitespace

    from tpu_asr.data.tokenizer import WordPieceTokenizer

    vocab = (["[UNK]"] + [c for c in "abcdehilnorstuw"]
             + ["##" + c for c in "abcdehilnorstuw"]
             + ["the", "hello", "wor", "##ld", "##llo", "he"])
    ours = WordPieceTokenizer(vocab, lowercase=True)

    hf = Tokenizer(HFWordPiece({p: i for i, p in enumerate(vocab)},
                               unk_token="[UNK]"))
    hf.pre_tokenizer = Whitespace()

    for text in ("hello world", "the dazzler hello", "worst northода"):
        got = ours.text_to_ids(text)
        want = hf.encode(text.lower()).ids
        assert got == want, (text, got, want)
    # round trip through ids_to_text re-joins '##' continuations
    assert ours.ids_to_text(ours.text_to_ids("hello wor")) == "hello wor"
