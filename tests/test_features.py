"""Mel frontend parity tests.

The reference's FilterbankFeatures source is stripped from the NeMo snapshot; its
semantics are pinned here against a torch-CPU STFT reference implementation (the same
contract NeMo's own test_asr_filterbankfeatures_seq_len.py pins against librosa).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tpu_asr.config import PreprocessorConfig
from tpu_asr.ops.features import FilterbankFeatures, mel_filterbank, stft_seq_len, _hz_to_mel_slaney, _mel_to_hz_slaney


def torch_logmel_reference(sig: np.ndarray, length: np.ndarray, cfg: PreprocessorConfig):
    """NeMo FilterbankFeatures semantics re-derived in torch (CPU) for parity checking."""
    x = torch.tensor(sig, dtype=torch.float32)
    # preemphasis
    x = torch.cat([x[:, :1], x[:, 1:] - cfg.preemph * x[:, :-1]], dim=1)
    win = torch.hann_window(cfg.win_length, periodic=False)
    spec = torch.stft(
        x,
        n_fft=cfg.n_fft,
        hop_length=cfg.hop_length,
        win_length=cfg.win_length,
        window=win,
        center=True,
        pad_mode="reflect",
        return_complex=True,
    )
    power = spec.real**2 + spec.imag**2                     # (B, F, T)
    fb = torch.tensor(mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.features))
    mel = torch.einsum("mf,bft->bmt", fb, power)
    mel = torch.log(mel + cfg.log_zero_guard_value)
    seq_len = torch.tensor(length) // cfg.hop_length + 1
    # per-feature normalization over valid frames (Bessel-corrected std, +1e-5)
    out = torch.zeros_like(mel)
    for b in range(mel.shape[0]):
        n = int(seq_len[b])
        seg = mel[b, :, :n]
        mean = seg.mean(dim=1, keepdim=True)
        std = seg.std(dim=1, keepdim=True) + 1e-5
        out[b, :, :n] = (seg - mean) / std
    return out.numpy(), seq_len.numpy()


def test_seq_len_matches_torch_stft():
    cfg = PreprocessorConfig()
    for n in [1600, 16000, 16001, 26711, 267120]:
        x = torch.randn(1, n)
        spec = torch.stft(
            x, n_fft=cfg.n_fft, hop_length=cfg.hop_length, win_length=cfg.win_length,
            window=torch.hann_window(cfg.win_length, periodic=False),
            center=True, pad_mode="reflect", return_complex=True,
        )
        frames = spec.shape[-1]
        got = int(stft_seq_len(jnp.array([n]), cfg.n_fft, cfg.hop_length)[0])
        assert got == frames, (n, got, frames)


def test_logmel_parity_with_torch(rng):
    cfg = PreprocessorConfig(dither=0.0)
    fbf = FilterbankFeatures(cfg)
    b = 3
    max_len = 16000
    lengths = np.array([16000, 12000, 8777])
    sig = rng.standard_normal((b, max_len)).astype(np.float32) * 0.1
    for i, l in enumerate(lengths):
        sig[i, l:] = 0.0

    ref, ref_len = torch_logmel_reference(sig, lengths, cfg)
    got, got_len = fbf(jnp.asarray(sig), jnp.asarray(lengths), train=False)
    got = np.asarray(got)

    np.testing.assert_array_equal(np.asarray(got_len), ref_len)
    for i, l in enumerate(ref_len):
        np.testing.assert_allclose(got[i, :, :l], ref[i, :, :l], atol=2e-3, rtol=1e-3)
    # padded frames zeroed
    for i, l in enumerate(ref_len):
        assert np.all(got[i, :, l:] == 0.0)


def test_mel_filterbank_structure():
    fb = mel_filterbank(16000, 512, 80)
    assert fb.shape == (80, 257)
    assert np.all(fb >= 0)
    # linear region of the slaney scale: 200/3 Hz per mel
    np.testing.assert_allclose(_hz_to_mel_slaney(np.array([200.0 / 3])), [1.0])
    np.testing.assert_allclose(_mel_to_hz_slaney(np.array([15.0])), [1000.0])
    # each filter is a single triangle: nonzero support is contiguous
    for m in range(80):
        nz = np.nonzero(fb[m])[0]
        assert len(nz) > 0
        assert np.all(np.diff(nz) == 1)


def test_normalization_stats():
    cfg = PreprocessorConfig(dither=0.0)
    fbf = FilterbankFeatures(cfg)
    sig = np.random.default_rng(1).standard_normal((2, 16000)).astype(np.float32)
    mel, seq_len = fbf(jnp.asarray(sig), jnp.asarray([16000, 16000]))
    mel = np.asarray(mel)
    n = int(seq_len[0])
    assert abs(mel[0, :, :n].mean()) < 1e-3
    stds = mel[0, :, :n].std(axis=1)
    np.testing.assert_allclose(stds, np.ones_like(stds), atol=2e-2)


def test_spec_augment_masks():
    import jax
    from tpu_asr.config import SpecAugmentConfig
    from tpu_asr.ops.specaug import spec_augment

    spec = jnp.ones((4, 80, 100))
    length = jnp.array([100, 80, 60, 40])
    cfg = SpecAugmentConfig(freq_masks=2, time_masks=10, freq_width=27, time_width=0.05)
    out = np.asarray(spec_augment(spec, length, cfg, jax.random.PRNGKey(0)))
    assert out.shape == (4, 80, 100)
    # some masking happened, but not everything masked
    frac = (out == 0.0).mean()
    assert 0.0 < frac < 0.9
    # masked values are exactly the mask value; others untouched
    assert set(np.unique(out)).issubset({0.0, 1.0})
