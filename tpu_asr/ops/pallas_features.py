"""Fused spectrogram kernel: block-decomposed matmul-DFT -> |.|^2 -> mel ->
log in one Pallas TPU kernel.

The north-star feature fusion from BASELINE.json. Three ideas make this
version fast where the previous one (frames-tensor input, see git history)
was not:

1. BLOCK DECOMPOSITION. The hop-aligned identity
   frame[t] @ basis = sum_j blocks[t+j] @ basis[j*hop:(j+1)*hop]
   (blocks = the non-overlapped (B, nb, hop) reshape of the padded audio)
   replaces the overlapped (B, T, n_fft) framing gather. The XLA path
   (ops/features.py::_block_stft_power) computes the same sum as 4 separate
   einsums and round-trips the (B, T, 2F) fp32 accumulator through HBM once
   per chunk — at B=32 x 15 s that traffic (~790 MB) is most of the cost of
   the frontend.

2. ONE ALIGNED MATMUL PER TILE. The wrapper concatenates the 4 hop-shifted
   block views along the last axis in XLA (static slices, bf16, ~2x the
   audio bytes) giving a (B, T, 4*hop) operand whose contraction dim is a
   lane multiple — the kernel then runs a single
   (TILE_T, 4*hop) @ (4*hop, 2Fp) MXU matmul per frame tile with the
   accumulator, power, mel, and log stages all VMEM-resident. An earlier
   revision sliced the 4 shifts inside the kernel; the sublane-misaligned
   reads cost ~2x (1.38 -> 0.66 ms measured).

3. SPLIT-PRECISION OPTION. v5e MXU runs fp32 matmuls ~8x slower than bf16;
   XLA's DEFAULT TPU precision therefore truncates fp32 operands to a single
   bf16 pass. `passes` picks the accuracy/speed point:
     0 — fp32 operands, no bf16 casts (parity-test mode; slow on TPU);
     1 — single bf16 pass (same numeric class as the XLA path's default);
     2 — signal split hi/lo (x ~ xh + xl; x@b ~ xh@b + xl@b): the signal is
         exact, only the windowed basis is bf16-rounded;
     3 — basis split too (+ xh@bl): ~fp32 operand accuracy.
   fp32 accumulation throughout. Note: with bf16 operands (any of 1-3, and
   equally the XLA default path), log-mel values at near-silent bins carry
   O(0.1) error vs a float64 oracle — power errors are amplified by
   log(x + 2^-24) when x approaches the guard (measured p99 0.14 for both
   this kernel at passes=1 and the XLA path; passes=3 trims it to 0.11).

Measured DEVICE time (v5e-1, B=32 x 15 s, from jax.profiler traces — wall
clock of a standalone sub-ms program is dispatch-floor-bound and useless):
XLA frontend 1.04 ms -> passes=1 0.72 ms. passes=2 measured 1.64 ms: the
hi/lo operand build in XLA costs more than the saved accuracy is worth, so
the default (FilterbankFeatures backend='auto' on TPU) is passes=1 — same
accuracy class as the XLA path at 0.7x the device time.

Constants come from ops/features.py (same DFT/mel math). Parity is pinned by
tests/test_pallas_features.py (interpret mode on CPU) and exercised on real
TPU by bench.py. Normalization/masking stay in XLA (negligible cost).

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
from tpu_asr.ops.features import _dft_basis, mel_filterbank

TILE_T = 512          # frames per grid step
LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _split_np(a: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    hi = a.astype(np.float32).astype(jnp.bfloat16)
    lo = (a.astype(np.float32) - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
    return np.asarray(hi), np.asarray(lo)


@functools.lru_cache(maxsize=8)
def _padded_constants(sample_rate: int, n_fft: int, win_length: int,
                      n_mels: int, window: str, hop: int, lowfreq: float,
                      highfreq):
    """Windowed [cos|sin] DFT basis stacked over hop chunks (Kp, 2Fp) as bf16
    hi/lo, and the mel filterbank transpose (Fp, Mp) as bf16 hi/lo. Row block
    j of the basis multiplies the j-hop-shifted block view; cos columns sit
    in lanes [0, Fp), sin in [Fp, 2Fp) — lane-aligned re/im split."""
    cos_b, sin_b = _dft_basis(n_fft, win_length, window)
    fb = mel_filterbank(sample_rate, n_fft, n_mels, lowfreq, highfreq)
    n_freq = cos_b.shape[1]
    fp = _round_up(n_freq, LANE)
    mp = _round_up(n_mels, LANE)
    n_chunks = (n_fft + hop - 1) // hop
    kp = n_chunks * hop
    basis = np.zeros((kp, 2 * fp), np.float32)
    basis[:n_fft, :n_freq] = cos_b
    basis[:n_fft, fp:fp + n_freq] = sin_b
    fb_p = np.zeros((fp, mp), np.float32)
    fb_p[:n_freq, :n_mels] = fb.T
    bh, bl = _split_np(basis)
    fh, fl = _split_np(fb_p)
    return bh, bl, fh, fl, fp, mp, n_chunks


def _logmel_kernel(*refs, passes: int, fp: int, log_guard: float,
                   mag_power: float, take_log: bool):
    """One program = one (batch row, frame tile). wide (TILE_T, Kp) bf16
    (hi[, lo]) — or fp32 at passes=0 — -> log-mel (TILE_T, Mp) fp32; DFT
    accumulator, power, and mel never leave VMEM."""
    if passes <= 1:
        wh_ref, basis_h_ref, fh_ref, out_ref = refs
    else:
        (wh_ref, wl_ref, basis_h_ref, basis_l_ref, fh_ref,
         fl_ref, out_ref) = refs
    wh = wh_ref[0]
    acc = jnp.dot(wh, basis_h_ref[:], preferred_element_type=jnp.float32)
    if passes >= 2:
        acc += jnp.dot(wl_ref[0], basis_h_ref[:],
                       preferred_element_type=jnp.float32)
    if passes >= 3:
        acc += jnp.dot(wh, basis_l_ref[:],
                       preferred_element_type=jnp.float32)
    re, im = acc[:, :fp], acc[:, fp:]
    power = re * re + im * im
    if mag_power != 2.0:
        power = jnp.power(jnp.sqrt(jnp.maximum(power, 0.0)), mag_power)
    if passes == 0:
        mel = jnp.dot(power, fh_ref[:], preferred_element_type=jnp.float32)
    else:
        ph = power.astype(jnp.bfloat16)
        mel = jnp.dot(ph, fh_ref[:], preferred_element_type=jnp.float32)
        if passes >= 2:
            plo = (power - ph.astype(jnp.float32)).astype(jnp.bfloat16)
            mel += jnp.dot(plo, fh_ref[:],
                           preferred_element_type=jnp.float32)
        if passes >= 3:
            mel += jnp.dot(ph, fl_ref[:],
                           preferred_element_type=jnp.float32)
    if take_log:
        mel = jnp.log(mel + log_guard)
    out_ref[0] = mel


def fused_logmel(x_padded: jnp.ndarray, n_frames: int,
                 cfg: PreprocessorConfig, interpret: bool = False,
                 passes: int = 1) -> jnp.ndarray:
    """Pre-emphasized, center-padded audio (B, Lp) -> log-mel (B, T, n_mels).

    `x_padded` must already be reflect-padded by n_fft//2 on both sides (the
    XLA wrapper in FilterbankFeatures does this). `passes` in {0, 1, 2, 3} —
    see module docstring.
    """
    assert passes in (0, 1, 2, 3), passes
    c = cfg
    hop, n_fft = c.hop_length, c.n_fft
    b = x_padded.shape[0]
    basis_h, basis_l, fh, fl, fp, mp, n_chunks = _padded_constants(
        c.sample_rate, n_fft, c.win_length, c.features, c.window, hop,
        c.lowfreq, c.highfreq)
    kp = n_chunks * hop

    n_tiles = pl.cdiv(n_frames, TILE_T)
    t_pad = n_tiles * TILE_T
    nbp = t_pad + n_chunks - 1
    need = nbp * hop
    x_padded = x_padded.astype(jnp.float32)
    if need > x_padded.shape[1]:
        x_padded = jnp.pad(x_padded, ((0, 0), (0, need - x_padded.shape[1])))
    blocks = x_padded[:, :need].reshape(b, nbp, hop)
    # hop-shifted views concatenated on the contraction axis: wide[b, t] is
    # frame t's n_fft window (plus a tail pad ignored by the zero basis rows)
    wide = jnp.concatenate(
        [blocks[:, j:j + t_pad] for j in range(n_chunks)], axis=2)
    wh = wide.astype(jnp.bfloat16)

    kernel = functools.partial(
        _logmel_kernel, passes=passes, fp=int(fp),
        log_guard=float(c.log_zero_guard_value),
        mag_power=float(c.mag_power), take_log=bool(c.log))

    if passes == 0:
        # exact fp32 operands (hi + lo reconstructs the fp32 constants)
        args = (wide,
                jnp.asarray(basis_h, jnp.float32)
                + jnp.asarray(basis_l, jnp.float32),
                jnp.asarray(fh, jnp.float32) + jnp.asarray(fl, jnp.float32))
    elif passes == 1:
        args = (wh, jnp.asarray(basis_h), jnp.asarray(fh))
    else:
        wl = (wide - wh.astype(jnp.float32)).astype(jnp.bfloat16)
        args = (wh, wl, jnp.asarray(basis_h), jnp.asarray(basis_l),
                jnp.asarray(fh), jnp.asarray(fl))
    n_wide = 1 if passes <= 1 else 2

    def fun(*args):
        # local (possibly sharded) batch from the operand itself — this body
        # is also the per-shard lowering under the batch partition rule
        bl_ = args[0].shape[0]
        tile = lambda i, j: (i, j, 0)
        const3 = lambda i, j: (0, 0)
        wide_spec = pl.BlockSpec((1, TILE_T, kp), tile,
                                 memory_space=pltpu.VMEM)
        basis_spec = pl.BlockSpec(basis_h.shape, const3,
                                  memory_space=pltpu.VMEM)
        fb_spec = pl.BlockSpec(fh.shape, const3, memory_space=pltpu.VMEM)
        in_specs = ([wide_spec] * n_wide
                    + [basis_spec] * (2 if passes >= 2 else 1)
                    + [fb_spec] * (2 if passes >= 2 else 1))
        return pl.pallas_call(
            kernel,
            grid=(bl_, n_tiles),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, TILE_T, mp), tile,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bl_, t_pad, mp), jnp.float32),
            # real algorithm FLOPs (unpadded dims), not padded-lane work:
            # the estimate feeds utils/flops.compiled_flops -> reported MFU
            cost_estimate=pl.CostEstimate(
                flops=max(passes, 1) * 2 * bl_ * n_frames
                * (n_fft * 2 * (n_fft // 2 + 1)
                   + (n_fft // 2 + 1) * c.features),
                bytes_accessed=n_wide * bl_ * t_pad * kp * 2
                + bl_ * t_pad * mp * 4,
                transcendentals=bl_ * t_pad * mp,
            ),
            interpret=interpret,
        )(*args)

    if interpret:
        out = fun(*args)                 # CPU tests: no partitioner involved
    else:
        from tpu_asr.parallel.kernel_sharding import batch_partitioned
        arg_specs = [(3, 0)] * n_wide + [(3, None)] * (
            2 if passes >= 2 else 1) + [(2, None)] * (2 if passes >= 2 else 1)
        out = batch_partitioned(fun, arg_specs, ((3, 0),),
                                tuple_out=False)(*args)
    return out[:, :n_frames, :c.features]
