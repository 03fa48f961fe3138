"""DiffKD — latent denoising KD (reference DiffKDModule, asr_train.py:244-312).

teacher 1x1-conv autoencoder (encode stop-gradiented, recon MSE) + student
1x1-conv projection + an iterative denoiser `x <- x - net(x)/steps` (two k=3
convs with ReLU), MSE(denoised, z_t). Returns ae_loss + kd_loss.

All convs operate feature-last (B, T, C); the denoise loop has a static, small
step count (default 5) and is unrolled — one fused XLA program per layer-call.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpu_asr.config import DiffKDConfig


class DiffKDModule(nn.Module):
    cfg: DiffKDConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, stu_feat: jnp.ndarray, tch_feat: jnp.ndarray) -> jnp.ndarray:
        """stu_feat: (B, T, C_s), tch_feat: (B, T, C_t) -> scalar loss."""
        c = self.cfg
        latent = c.latent

        # (1) teacher AE: encode (no grad into the encoder from downstream uses),
        #     reconstruct, recon MSE (asr_train.py:295-297)
        z_t = nn.Conv(latent, kernel_size=(1,), dtype=self.dtype, name="encoder")(tch_feat)
        z_t = jax.lax.stop_gradient(z_t)
        rec = nn.Conv(c.teacher_dim, kernel_size=(1,), dtype=self.dtype, name="decoder")(z_t)
        ae_loss = jnp.mean(jnp.square(rec.astype(jnp.float32) -
                                      tch_feat.astype(jnp.float32)))

        # (2) student -> latent projection
        z_s = nn.Conv(latent, kernel_size=(1,), dtype=self.dtype, name="proj")(stu_feat)

        # (3) iterative denoising (static small step count; unrolled)
        conv1 = nn.Conv(latent, kernel_size=(3,), padding=((1, 1),),
                        dtype=self.dtype, name="denoiser_conv1")
        conv2 = nn.Conv(latent, kernel_size=(3,), padding=((1, 1),),
                        dtype=self.dtype, name="denoiser_conv2")
        x = z_s
        for _ in range(c.steps):
            pred_noise = conv2(nn.relu(conv1(x)))
            x = x - pred_noise / c.steps

        # (4) distill loss
        kd_loss = jnp.mean(jnp.square(x.astype(jnp.float32) - z_t.astype(jnp.float32)))
        return ae_loss + kd_loss
