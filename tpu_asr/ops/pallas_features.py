"""Fused spectrogram kernel: windowed matmul-DFT -> |.|^2 -> mel -> log in one
Pallas TPU kernel.

The north-star feature fusion from BASELINE.json, structured for Mosaic's
layout rules: framing stays in XLA (a static gather that XLA fuses into the
HBM read), and the kernel consumes (TILE_T, n_fft) frame blocks through a
pipelined BlockSpec grid — per block it runs three MXU matmuls entirely in
VMEM, so the (B, T, n_freq) complex spectrum and power tensors never
materialize in HBM (they are ~2x the frame tensor and would otherwise round-
trip between the STFT, power, and mel stages).

A fully-DMA'd variant that also fuses framing was tried and rejected: the
10 ms hop (160 samples) is not lane-aligned (128), so chunk slicing violates
Mosaic's memref tiling constraints on every layout we found (see git history).

Constants come from ops/features.py (same DFT/mel math). Parity with the XLA
path is pinned by tests/test_pallas_features.py (interpret mode on CPU) and
exercised on real TPU by bench.py. Normalization/masking stay in XLA.

Ref: reference preprocessor semantics at
NeMo/nemo/collections/asr/modules/audio_preprocessing.py:111-304 (cuFFT STFT
replaced per SURVEY.md §2.3).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_asr.config import PreprocessorConfig
from tpu_asr.ops.features import _dft_basis, frame_signal, mel_filterbank

TILE_T = 128          # frames per grid step
LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.lru_cache(maxsize=8)
def _padded_constants(sample_rate: int, n_fft: int, win_length: int,
                      n_mels: int, window: str, lowfreq: float,
                      highfreq) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(cos, sin) windowed bases (n_fft, Fp) and mel^T (Fp, Mp), zero-padded
    to lane-aligned Fp/Mp widths."""
    cos_b, sin_b = _dft_basis(n_fft, win_length, window)
    fb = mel_filterbank(sample_rate, n_fft, n_mels, lowfreq, highfreq)
    n_freq = cos_b.shape[1]
    fp = _round_up(n_freq, LANE)
    mp = _round_up(n_mels, LANE)
    cos_p = np.zeros((n_fft, fp), np.float32)
    sin_p = np.zeros((n_fft, fp), np.float32)
    cos_p[:, :n_freq] = cos_b
    sin_p[:, :n_freq] = sin_b
    fb_p = np.zeros((fp, mp), np.float32)
    fb_p[:n_freq, :n_mels] = fb.T
    return cos_p, sin_p, fb_p


def _logmel_kernel(frames_ref, cos_ref, sin_ref, fb_ref, out_ref, *,
                   log_guard: float, mag_power: float, take_log: bool):
    frames = frames_ref[0]                                # (TILE_T, n_fft)
    re = jnp.dot(frames, cos_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(frames, sin_ref[:], preferred_element_type=jnp.float32)
    power = re * re + im * im
    if mag_power != 2.0:
        power = jnp.power(jnp.sqrt(jnp.maximum(power, 0.0)), mag_power)
    mel = jnp.dot(power, fb_ref[:], preferred_element_type=jnp.float32)
    if take_log:
        mel = jnp.log(mel + log_guard)
    out_ref[0] = mel


def fused_logmel(x_padded: jnp.ndarray, n_frames: int,
                 cfg: PreprocessorConfig, interpret: bool = False
                 ) -> jnp.ndarray:
    """Pre-emphasized, center-padded audio (B, Lp) -> log-mel (B, T, n_mels).

    `x_padded` must already be reflect-padded by n_fft//2 on both sides (the
    XLA wrapper in FilterbankFeatures does this).
    """
    c = cfg
    hop, n_fft = c.hop_length, c.n_fft
    b = x_padded.shape[0]
    n_tiles = pl.cdiv(n_frames, TILE_T)
    t_pad = n_tiles * TILE_T
    # static-gather framing in XLA (fuses into the kernel's input pipeline)
    idx = jnp.arange(t_pad)[:, None] * hop + jnp.arange(n_fft)[None, :]
    need = int((t_pad - 1) * hop + n_fft)
    if need > x_padded.shape[1]:
        x_padded = jnp.pad(x_padded, ((0, 0), (0, need - x_padded.shape[1])))
    frames = x_padded.astype(jnp.float32)[:, idx]         # (B, Tp, n_fft)

    cos_p, sin_p, fb_p = _padded_constants(
        c.sample_rate, n_fft, c.win_length, c.features, c.window,
        c.lowfreq, c.highfreq)
    mp = fb_p.shape[1]

    kernel = functools.partial(
        _logmel_kernel, log_guard=float(c.log_zero_guard_value),
        mag_power=float(c.mag_power), take_log=bool(c.log))

    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, TILE_T, n_fft), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(cos_p.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(sin_p.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(fb_p.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_T, mp), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, mp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t_pad * n_fft * cos_p.shape[1] * 2
            + 2 * b * t_pad * cos_p.shape[1] * mp,
            bytes_accessed=frames.size * 4 + b * t_pad * mp * 4,
            transcendentals=b * t_pad * mp,
        ),
        interpret=interpret,
    )(frames, jnp.asarray(cos_p), jnp.asarray(sin_p), jnp.asarray(fb_p))
    return out[:, :n_frames, :c.features]
