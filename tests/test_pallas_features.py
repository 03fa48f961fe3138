"""Parity: the fused Pallas log-mel kernel (interpret mode on CPU).

Tolerance design (see the kernel docstring): log(x + 2^-24) amplifies ANY
rounding difference without bound as x approaches the guard, including pure
fp32 summation-order differences between the kernel's single K-wide matmul
and the XLA path's per-chunk accumulation. So:
- LINEAR mel (log=False) is compared tightly — this pins the block
  decomposition indexing, the basis/mel constants, and the power fusion;
- log-domain comparisons are restricted to live bins (log argument well
  above the guard), tight for passes=0 (fp32 operands) and loose for
  passes=1 (bf16 operands — the TPU default, same numeric class as XLA's
  default TPU matmul precision).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_asr.config import PreprocessorConfig
from tpu_asr.ops.features import FilterbankFeatures
from tpu_asr.ops.pallas_features import fused_logmel


def _prep(cfg, rng, seconds=3, b=2):
    sig = (rng.normal(size=(b, seconds * cfg.sample_rate)) * 0.1).astype(np.float32)
    x = jnp.asarray(sig)
    # pre-emphasis as in FilterbankFeatures.__call__
    x = jnp.concatenate([x[:, :1], x[:, 1:] - cfg.preemph * x[:, :-1]], axis=1)
    pad = cfg.n_fft // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = (xp.shape[1] - cfg.n_fft) // cfg.hop_length + 1
    return x, xp, n_frames


def _xla_mel(cfg, x, take_log):
    """Unnormalized (log-)mel via the XLA block-decomposed path (fp32)."""
    fb = FilterbankFeatures(cfg, backend="xla")
    power = fb._block_stft_power(x)
    mel = jnp.einsum("btf,fm->btm", power, fb._fb_t,
                     preferred_element_type=jnp.float32)
    if take_log:
        mel = jnp.log(mel + cfg.log_zero_guard_value)
    return mel


@pytest.mark.parametrize("cfg", [
    PreprocessorConfig(),                                     # 400/160/512, r=32
    PreprocessorConfig(window_size=0.032, window_stride=0.016,
                       n_fft=512, features=64),               # hop 256 | 512, r=0
])
def test_fused_mel_fp32_matches_xla_linear(cfg, rng):
    cfg_lin = dataclasses.replace(cfg, log=False)
    x, xp, n_frames = _prep(cfg_lin, rng)
    got = fused_logmel(xp, n_frames, cfg_lin, interpret=True, passes=0)
    want = _xla_mel(cfg_lin, x, take_log=False)
    assert got.shape == want.shape
    # rtol covers the bulk; atol covers cancellation bins where the fp32
    # error is relative to the partial sums, not the (tiny) result
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-5)


def test_fused_logmel_fp32_matches_on_live_bins(rng):
    cfg = PreprocessorConfig()
    x, xp, n_frames = _prep(cfg, rng)
    got = np.asarray(fused_logmel(xp, n_frames, cfg, interpret=True, passes=0))
    want = np.asarray(_xla_mel(cfg, x, take_log=True))
    live = want > np.log(cfg.log_zero_guard_value) + 8.0
    assert live.mean() > 0.5
    np.testing.assert_allclose(got[live], want[live], rtol=0, atol=2e-3)


def test_fused_logmel_bf16_matches_on_live_bins(rng):
    cfg = PreprocessorConfig()
    x, xp, n_frames = _prep(cfg, rng, seconds=2)
    got = np.asarray(fused_logmel(xp, n_frames, cfg, interpret=True, passes=1))
    want = np.asarray(_xla_mel(cfg, x, take_log=True))
    live = want > np.log(cfg.log_zero_guard_value) + 8.0
    assert live.mean() > 0.5
    d = np.abs(got[live] - want[live])
    # bf16 operand rounding: ~1% power error -> ~1e-2 in log on live bins,
    # with a tail where moderate cancellation amplifies it
    assert np.max(d) < 0.5, np.max(d)
    assert np.median(d) < 1e-2
    assert np.percentile(d, 99) < 0.1


def test_full_frontend_pallas_backend_matches_xla(rng):
    """Backend wiring end-to-end (shapes, lengths, normalization glue).

    Normalized features at near-silent bins inherit the log-amplified
    reassociation noise, so the bulk must match tightly but the max is
    bounded loosely."""
    cfg = PreprocessorConfig()
    sig = (rng.normal(size=(2, 16000)) * 0.1).astype(np.float32)
    length = jnp.asarray([16000, 12000], jnp.int32)

    import tpu_asr.ops.pallas_features as pf
    # route the pallas backend through interpret mode on CPU, fp32 operands
    orig = pf.fused_logmel
    pf.fused_logmel = lambda x, n, c, interpret=False, passes=1: orig(
        x, n, c, interpret=True, passes=0)
    try:
        out_p, len_p = FilterbankFeatures(cfg, backend="pallas")(
            jnp.asarray(sig), length)
    finally:
        pf.fused_logmel = orig
    out_x, len_x = FilterbankFeatures(cfg, backend="xla")(jnp.asarray(sig), length)
    np.testing.assert_array_equal(np.asarray(len_p), np.asarray(len_x))
    d = np.abs(np.asarray(out_p) - np.asarray(out_x))
    assert np.median(d) < 1e-4
    assert np.percentile(d, 99) < 1e-2
    assert np.max(d) < 0.5, np.max(d)
