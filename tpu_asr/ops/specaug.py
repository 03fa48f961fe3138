"""SpecAugment — vectorized, on-device, mask-based.

Rebuilds NeMo's `SpectrogramAugmentation` (reference:
NeMo/nemo/collections/asr/modules/audio_preprocessing.py:443-554; the numba CUDA kernel
variant is replaced by pure vectorized masking, which XLA fuses into the frontend).

Semantics (matching the reference config conformer_ctc_bpe.yaml:112-118):
- `freq_masks` frequency stripes per sample: width ~ U{0..freq_width}, start uniform.
- `time_masks` time stripes per sample: when `time_width` < 1 it is *adaptive* — the
  max width is floor(time_width * seq_len) per sample; start uniform over valid frames.
All masks are built with broadcasted iota comparisons: no dynamic shapes, no scatter.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tpu_asr.config import SpecAugmentConfig


def spec_augment(
    spec: jnp.ndarray,          # (B, D, T) log-mel
    length: jnp.ndarray,        # (B,) valid frame counts
    cfg: SpecAugmentConfig,
    rng: jax.Array,
) -> jnp.ndarray:
    b, d, t = spec.shape
    k_fw, k_fs, k_tw, k_ts = jax.random.split(rng, 4)

    mask = jnp.zeros((b, d, t), dtype=jnp.bool_)

    if cfg.freq_masks > 0:
        widths = jax.random.randint(k_fw, (b, cfg.freq_masks), 0, cfg.freq_width + 1)
        starts = jax.random.randint(k_fs, (b, cfg.freq_masks), 0, max(1, d - cfg.freq_width))
        f_idx = jnp.arange(d)[None, None, :]                                     # (1,1,D)
        fmask = (f_idx >= starts[..., None]) & (f_idx < (starts + widths)[..., None])
        mask = mask | jnp.any(fmask, axis=1)[:, :, None]

    if cfg.time_masks > 0:
        if cfg.time_width < 1.0:
            max_w = jnp.maximum(1, (length.astype(jnp.float32) * cfg.time_width).astype(jnp.int32))
        else:
            max_w = jnp.full((b,), int(cfg.time_width), dtype=jnp.int32)
        u_w = jax.random.uniform(k_tw, (b, cfg.time_masks))
        widths = (u_w * (max_w[:, None] + 1).astype(jnp.float32)).astype(jnp.int32)
        start_hi = jnp.maximum(1, length[:, None] - widths)
        u_s = jax.random.uniform(k_ts, (b, cfg.time_masks))
        starts = (u_s * start_hi.astype(jnp.float32)).astype(jnp.int32)
        t_idx = jnp.arange(t)[None, None, :]                                     # (1,1,T)
        tmask = (t_idx >= starts[..., None]) & (t_idx < (starts + widths)[..., None])
        mask = mask | jnp.any(tmask, axis=1)[:, None, :]

    return jnp.where(mask, jnp.asarray(cfg.mask_value, spec.dtype), spec)
