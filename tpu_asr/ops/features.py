"""Mel-spectrogram frontend — TPU-native AudioToMelSpectrogramPreprocessor.

Rebuilds the behavior of NeMo's `AudioToMelSpectrogramPreprocessor` /
`FilterbankFeatures` (reference: NeMo/nemo/collections/asr/modules/audio_preprocessing.py:111-304;
the FilterbankFeatures source itself is stripped from the snapshot — its length contract is
pinned by NeMo/tests/collections/asr/test_asr_filterbankfeatures_seq_len.py:24-55 and
reproduced here) as a pure-JAX pipeline designed for the MXU:

  dither -> preemphasis -> framed matmul-DFT STFT (center/reflect padded, hann window)
  -> |.|^2 -> mel filterbank (librosa-compatible slaney scale+norm, computed locally)
  -> log(x + 2^-24) -> per-feature masked normalization -> zero padded frames

Instead of an FFT (which XLA lowers poorly on TPU for these sizes), the STFT is a dense
(win -> freq) matmul per frame: frames are extracted with `conv_general_dilated_patches`
and contracted against precomputed DFT cos/sin bases — two MXU matmuls that XLA fuses
with the mel projection. The whole frontend is jit-compatible with static shapes.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu_asr.config import PreprocessorConfig

LOG_ZERO_GUARD = 2.0 ** -24


# ---------------------------------------------------------------------------
# Mel filterbank (librosa-compatible, slaney scale + slaney norm)
# ---------------------------------------------------------------------------

def _hz_to_mel_slaney(freqs: np.ndarray) -> np.ndarray:
    freqs = np.asarray(freqs, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freqs - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = freqs >= min_log_hz
    mels = np.where(log_t, min_log_mel + np.log(np.maximum(freqs, 1e-10) / min_log_hz) / logstep, mels)
    return mels


def _mel_to_hz_slaney(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = mels >= min_log_mel
    freqs = np.where(log_t, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)
    return freqs


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
) -> np.ndarray:
    """Triangular mel filterbank, shape (n_mels, 1 + n_fft//2).

    Matches `librosa.filters.mel(htk=False, norm='slaney')`, which is what NeMo's
    FilterbankFeatures uses for this config.
    """
    if fmax is None:
        fmax = sample_rate / 2.0
    n_freqs = 1 + n_fft // 2
    fftfreqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    mel_min, mel_max = _hz_to_mel_slaney(np.array([fmin, fmax]))
    mel_pts = _mel_to_hz_slaney(np.linspace(mel_min, mel_max, n_mels + 2))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # slaney area normalization
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _dft_basis(n_fft: int, win_length: int, window: str = "hann") -> Tuple[np.ndarray, np.ndarray]:
    """Windowed DFT cos/sin bases, each shape (n_fft, 1 + n_fft//2).

    The window (hann, symmetric/periodic=False — NeMo passes periodic=False) is folded
    into the basis so framing needs no separate elementwise multiply.
    """
    n_freqs = 1 + n_fft // 2
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_freqs)[None, :]
    angle = -2.0 * np.pi * n * k / n_fft
    if window == "hann":
        win = np.hanning(win_length)  # symmetric hann == torch.hann_window(periodic=False)
    elif window in (None, "ones", "none"):
        win = np.ones(win_length)
    else:
        raise ValueError(f"unsupported window: {window}")
    # center the window inside n_fft (torch.stft pads the window symmetrically)
    pad_left = (n_fft - win_length) // 2
    win_full = np.zeros(n_fft)
    win_full[pad_left : pad_left + win_length] = win
    cos_b = (np.cos(angle) * win_full[:, None]).astype(np.float32)
    sin_b = (np.sin(angle) * win_full[:, None]).astype(np.float32)
    return cos_b, sin_b


def stft_seq_len(audio_len: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """Number of STFT frames for a center-padded STFT.

    NeMo get_seq_len: floor((len + 2*(n_fft//2) - n_fft) / hop) + 1 == len // hop + 1
    (contract pinned by NeMo/tests/.../test_asr_filterbankfeatures_seq_len.py).
    """
    pad_amount = 2 * (n_fft // 2)
    return (audio_len + pad_amount - n_fft) // hop_length + 1


def frame_signal(x: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """Center-pad (reflect) and extract frames. x: (B, L) -> (B, T, n_fft).

    Gather-based framing: exact (a conv-patches extraction runs at reduced precision
    on some backends) and cheap — the gather indices are static so XLA emits a single
    dynamic-slice-free gather that fuses with the downstream DFT matmul.
    """
    pad = n_fft // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = (x.shape[1] - n_fft) // hop_length + 1
    idx = jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
    return x[:, idx]


class FilterbankFeatures:
    """wav (B, L) float32 -> log-mel (B, n_mels, T) + frame lengths (B,).

    Stateless; all filter constants are precomputed numpy and closed over, so the
    __call__ is a pure jittable function.
    """

    def __init__(self, cfg: Optional[PreprocessorConfig] = None,
                 backend: str = "auto", pallas_passes: int = 1):
        """backend: 'xla' | 'pallas' | 'auto'.

        'pallas' runs the fused block-DFT+mel+log kernel
        (ops/pallas_features.py); normalization/masking stay here either
        way. Measured DEVICE time on v5e-1 (B=32 x 15 s): XLA 1.04 ms vs
        kernel 0.72 ms — the kernel keeps the (B, T, 2F) DFT accumulator in
        VMEM where the XLA path round-trips it through HBM once per hop
        chunk — so 'auto' resolves to 'pallas' on TPU (same bf16 numeric
        class as XLA's default matmul precision; `pallas_passes` buys more
        accuracy, see the kernel docstring) and 'xla' elsewhere.
        """
        self.cfg = cfg or PreprocessorConfig()
        c = self.cfg
        self.n_fft = c.n_fft
        self.hop_length = c.hop_length
        self.win_length = c.win_length
        self.n_mels = c.features
        if backend == "auto":
            import jax as _jax
            backend = "pallas" if _jax.default_backend() == "tpu" else "xla"
        self.backend = backend
        self.pallas_passes = pallas_passes
        cos_b, sin_b = _dft_basis(c.n_fft, c.win_length, c.window)
        fb = mel_filterbank(c.sample_rate, c.n_fft, c.features, c.lowfreq, c.highfreq)
        self._cos = jnp.asarray(cos_b)
        self._sin = jnp.asarray(sin_b)
        self._fb_t = jnp.asarray(fb.T)  # (n_freqs, n_mels)
        # hop-aligned chunks of the combined [cos | sin] basis for the
        # block-decomposed STFT (see _block_stft_power)
        basis = np.concatenate([cos_b, sin_b], axis=1)     # (n_fft, 2F)
        hop = self.hop_length
        self._n_chunks = (self.n_fft + hop - 1) // hop
        chunks = []
        for j in range(self._n_chunks):
            ks = basis[j * hop:(j + 1) * hop]
            if ks.shape[0] < hop:
                ks = np.pad(ks, ((0, hop - ks.shape[0]), (0, 0)))
            chunks.append(jnp.asarray(ks))
        self._basis_chunks = chunks

    def seq_len(self, audio_len: jnp.ndarray) -> jnp.ndarray:
        return stft_seq_len(audio_len, self.n_fft, self.hop_length)

    def _block_stft_power(self, x: jnp.ndarray) -> jnp.ndarray:
        """STFT power via hop-aligned block decomposition.

        The overlapped (B, T, n_fft) framing gather is replaced by a
        non-overlapping (B, nb, hop) reshape and ceil(n_fft/hop) t-shifted
        matmuls against hop-row slices of the windowed [cos|sin] DFT basis:
        frame t = sum_j blocks[t+j] @ basis[j*hop:(j+1)*hop]. No frame tensor
        ever exists in HBM and no gather is issued (measured 3.4 -> 2.5 ms at
        B=32 x 15 s on v5e-1; bit-equal up to fp32 re-association)."""
        b = x.shape[0]
        hop = self.hop_length
        pad = self.n_fft // 2
        xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
        n_frames = (xp.shape[1] - self.n_fft) // hop + 1
        nb = n_frames + self._n_chunks - 1
        need = nb * hop
        if need > xp.shape[1]:
            xp = jnp.pad(xp, ((0, 0), (0, need - xp.shape[1])))
        blocks = xp[:, :need].reshape(b, nb, hop)
        acc = None
        for j, cj in enumerate(self._basis_chunks):
            s = jnp.einsum("btn,nf->btf", blocks[:, j:j + n_frames], cj,
                           preferred_element_type=jnp.float32)
            acc = s if acc is None else acc + s
        f = acc.shape[-1] // 2
        re, im = acc[..., :f], acc[..., f:]
        return re * re + im * im

    def __call__(
        self,
        signal: jnp.ndarray,
        length: jnp.ndarray,
        *,
        train: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        c = self.cfg
        x = signal.astype(jnp.float32)
        if train and c.dither > 0.0 and rng is not None:
            x = x + c.dither * jax.random.normal(rng, x.shape, dtype=x.dtype)
        if c.preemph is not None and c.preemph > 0.0:
            x = jnp.concatenate([x[:, :1], x[:, 1:] - c.preemph * x[:, :-1]], axis=1)

        if self.backend == "pallas":
            from tpu_asr.ops.pallas_features import fused_logmel
            pad = self.n_fft // 2
            xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
            n_frames = (xp.shape[1] - self.n_fft) // self.hop_length + 1
            mel = fused_logmel(xp, n_frames, c,
                               passes=self.pallas_passes)              # (B, T, M)
        else:
            power = self._block_stft_power(x)               # (B, T, n_freqs)
            if c.mag_power != 2.0:
                power = jnp.power(jnp.sqrt(jnp.maximum(power, 0.0)), c.mag_power)
            mel = jnp.einsum("btf,fm->btm", power, self._fb_t, preferred_element_type=jnp.float32)
            if c.log:
                mel = jnp.log(mel + c.log_zero_guard_value)

        seq_len = self.seq_len(length)
        t_idx = jnp.arange(mel.shape[1])[None, :]                       # (1, T)
        valid = (t_idx < seq_len[:, None]).astype(mel.dtype)            # (B, T)

        if c.normalize == "per_feature":
            n = jnp.maximum(seq_len.astype(mel.dtype), 2.0)[:, None, None]
            mean = jnp.sum(mel * valid[..., None], axis=1, keepdims=True) / n
            var = jnp.sum(jnp.square(mel - mean) * valid[..., None], axis=1, keepdims=True) / (n - 1.0)
            std = jnp.sqrt(jnp.maximum(var, 0.0)) + 1e-5
            mel = (mel - mean) / std
        elif c.normalize == "all_features":
            n = jnp.maximum(seq_len.astype(mel.dtype), 2.0)[:, None, None] * mel.shape[2]
            mean = jnp.sum(mel * valid[..., None], axis=(1, 2), keepdims=True) / n
            var = jnp.sum(jnp.square(mel - mean) * valid[..., None], axis=(1, 2), keepdims=True) / (n - 1.0)
            std = jnp.sqrt(jnp.maximum(var, 0.0)) + 1e-5
            mel = (mel - mean) / std
        elif c.normalize in (None, "none"):
            pass
        else:
            raise ValueError(f"unknown normalize mode: {c.normalize}")

        mel = mel * valid[..., None] + c.pad_value * (1.0 - valid[..., None])
        out = jnp.transpose(mel, (0, 2, 1))                             # (B, n_mels, T)
        if c.pad_to > 1:
            t = out.shape[-1]
            rem = t % c.pad_to
            if rem != 0:
                out = jnp.pad(out, ((0, 0), (0, 0), (0, c.pad_to - rem)), constant_values=c.pad_value)
        return out, seq_len
