"""Parity: the fused Pallas log-mel kernel (interpret mode on CPU) must match
the XLA FilterbankFeatures path bit-for-bit-ish (fp32 tolerance) on the real
config AND on hop-divides-n_fft configs (r == 0 path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_asr.config import PreprocessorConfig
from tpu_asr.ops.features import FilterbankFeatures, frame_signal
from tpu_asr.ops.pallas_features import fused_logmel


@pytest.mark.parametrize("cfg", [
    PreprocessorConfig(),                                     # 400/160/512, r=32
    PreprocessorConfig(window_size=0.032, window_stride=0.016,
                       n_fft=512, features=64),               # hop 256 | 512, r=0
])
def test_fused_logmel_matches_xla(cfg, rng):
    b, seconds = 2, 3
    sig = (rng.normal(size=(b, seconds * cfg.sample_rate)) * 0.1).astype(np.float32)
    x = jnp.asarray(sig)
    # pre-emphasis as in FilterbankFeatures.__call__
    x = jnp.concatenate([x[:, :1], x[:, 1:] - cfg.preemph * x[:, :-1]], axis=1)

    pad = cfg.n_fft // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = (xp.shape[1] - cfg.n_fft) // cfg.hop_length + 1

    got = fused_logmel(xp, n_frames, cfg, interpret=True)

    fb = FilterbankFeatures(cfg, backend="xla")
    frames = frame_signal(x, cfg.n_fft, cfg.hop_length)
    re = jnp.einsum("btn,nf->btf", frames, fb._cos)
    im = jnp.einsum("btn,nf->btf", frames, fb._sin)
    mel = jnp.einsum("btf,fm->btm", re * re + im * im, fb._fb_t)
    want = jnp.log(mel + cfg.log_zero_guard_value)

    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_full_frontend_pallas_backend_matches_xla(rng):
    cfg = PreprocessorConfig()
    sig = (rng.normal(size=(2, 16000)) * 0.1).astype(np.float32)
    length = jnp.asarray([16000, 12000], jnp.int32)

    import tpu_asr.ops.features as feats
    import tpu_asr.ops.pallas_features as pf
    # route the pallas backend through interpret mode on CPU
    orig = pf.fused_logmel
    pf.fused_logmel = lambda x, n, c, interpret=False: orig(x, n, c, interpret=True)
    try:
        out_p, len_p = FilterbankFeatures(cfg, backend="pallas")(
            jnp.asarray(sig), length)
    finally:
        pf.fused_logmel = orig
    out_x, len_x = FilterbankFeatures(cfg, backend="xla")(jnp.asarray(sig), length)
    np.testing.assert_array_equal(np.asarray(len_p), np.asarray(len_x))
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=1e-4, atol=1e-4)
