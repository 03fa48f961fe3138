"""Latent AE+FM/diffusion KD pipeline ("diffm") — rebuild of the reference
asr_train_diffm.py:400-729.

Components (all 1x1/k=3 convs, feature-last):
- TeacherAutoEncoder: teacher (B,T,C_t) -> latent (B,T,L) -> recon; z_t is
  stop-gradiented, recon MSE always added (asr_train_diffm.py:400-414, 657-660).
- StudentProjector: student (B,T,C_s) -> latent (:416-423).
- NoiseAdapter: gamma(x) in (0,1) gate, z_noisy = gamma*z + (1-gamma)*eps (:425-442).
- SimpleDenoiser: `x <- x - net(x)/steps` iterative denoiser (:444-460).
- FMLatent: FlowMatchingModule in latent space, identity shape transform (:462-497).

Version dispatch (`_compute_v_losses_one_layer`, :645-729):
  v1 AE+KD | v2 AE+FM | v3 AE+noise+diff+KD | v4 FMpre + noise+diff+KDpost
  v5 noise+diff -> FMpost | v6 FMpre(chained) -> noise+diff -> FMpost(fm2)
  v7 FMpre(unchained) + noise+diff -> FMpost(fm2) | v8 FMpre(chained)+KDpost

Losses are SUMMED over layers, not averaged — reference quirk kept
(asr_train_diffm.py:788-792; SURVEY.md §7.3). The caller stacks the layer
axis into the batch (B-MAJOR) and passes loss_layers=L — params are shared
across layers, so one big-batch pass is equivalent to the vmap it replaces
and lets the fused Euler kernel (ops/pallas_fm.py) run for the latent FM.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpu_asr.config import DiffmConfig, FlowMatchingConfig
from tpu_asr.kd.flow_matching import FlowMatchingModule


class NoiseAdapter(nn.Module):
    """gamma head: Conv1x1 -> ReLU -> Conv1x1 -> sigmoid; z_noisy = g*z + (1-g)*eps."""

    latent_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        h = nn.Conv(self.latent_dim, kernel_size=(1,), dtype=self.dtype, name="g1")(z)
        h = nn.relu(h)
        gamma = nn.sigmoid(nn.Conv(1, kernel_size=(1,), dtype=self.dtype, name="g2")(h))
        eps = jax.random.normal(self.make_rng("noise"), z.shape, dtype=z.dtype)
        return gamma * z + (1.0 - gamma) * eps


class SimpleDenoiser(nn.Module):
    """Two k=3 convs; Euler-style denoise loop with a static step count."""

    latent_dim: int
    steps: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        conv1 = nn.Conv(self.latent_dim, kernel_size=(3,), padding=((1, 1),),
                        dtype=self.dtype, name="conv1")
        conv2 = nn.Conv(self.latent_dim, kernel_size=(3,), padding=((1, 1),),
                        dtype=self.dtype, name="conv2")
        x = z
        for _ in range(self.steps):
            x = x - conv2(nn.relu(conv1(x))) / self.steps
        return x


def _latent_fm_cfg(cfg: DiffmConfig) -> FlowMatchingConfig:
    """FMLatent wraps FlowMatchingModule with latent dims + identity transform
    (asr_train_diffm.py:468-479)."""
    import dataclasses
    return dataclasses.replace(
        cfg.fm,
        student_dim=cfg.latent_dim,
        teacher_dim=cfg.latent_dim,
        shape_transform="identity",
        # euler_backend passes through from cfg.fm: since the distil model
        # stacks layers into the batch (B-MAJOR) instead of nn.vmap-ing the
        # pipeline (see DistilCTCModel diffm section), the fused Euler
        # kernel (ops/pallas_fm.py) needs no batching rule and 'auto'
        # resolves to pallas on TPU for the mlp meta encoder.
    )


class LatentKDPipeline(nn.Module):
    """diffm loss computation; the distillation model stacks the layer axis
    into the batch (loss_layers=L). Returns the five loss components."""

    cfg: DiffmConfig
    diffusion_steps: int = 9
    kd_loss_type: str = "mse"       # mse | l1 (asr_train_diffm.py:556)
    dtype: Any = jnp.float32

    def _kd_crit(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
        if self.kd_loss_type == "l1":
            return jnp.mean(jnp.abs(a - b))
        return jnp.mean(jnp.square(a - b))

    @nn.compact
    def __call__(
        self,
        stu_feat: jnp.ndarray,      # (B, T, C_s)
        tch_feat: jnp.ndarray,      # (B, T, C_t)
        train: bool = False,
        loss_layers: Optional[int] = None,
    ) -> Dict[str, jnp.ndarray]:
        """`loss_layers=L` declares the batch rows are L stacked encoder
        layers (B-MAJOR; the FlowMatchingModule contract): every returned
        loss then reproduces the per-layer-summed aggregation the reference
        gets from its per-layer module loop (asr_train_diffm.py:772-792) —
        for the elementwise means here, sum_l mean_l == L * mean_all
        (equal-size layer slabs)."""
        c = self.cfg
        v = c.model_version
        zero = jnp.zeros((), jnp.float32)
        lscale = float(loss_layers) if loss_layers else 1.0

        # teacher AE. NOTE the detach ORDER (asr_train_diffm.py:657-660):
        # recon = dec(enc(t)) is computed BEFORE z_t.detach(), so the recon
        # loss trains encoder AND decoder; only the downstream KD/FM uses
        # see z_t gradient-stopped. (DiffKDModule in asr_train.py:295-297 is
        # the opposite — it detaches before decoding — and kd/diffkd.py
        # mirrors that.)
        z_t = nn.Conv(c.latent_dim, kernel_size=(1,), dtype=self.dtype, name="tae_enc")(tch_feat)
        rec = nn.Conv(c.teacher_dim, kernel_size=(1,), dtype=self.dtype, name="tae_dec")(z_t)
        z_t = jax.lax.stop_gradient(z_t)
        # recon criterion is always MSE regardless of kd_loss_type (asr_train_diffm.py:555)
        recon_loss = lscale * jnp.mean(
            jnp.square(rec.astype(jnp.float32) - tch_feat.astype(jnp.float32)))

        # student projection
        z_s = nn.Conv(c.latent_dim, kernel_size=(1,), dtype=self.dtype, name="sproj")(stu_feat)

        adapter = NoiseAdapter(c.latent_dim, self.dtype, name="adapter")
        denoiser = SimpleDenoiser(c.latent_dim, self.diffusion_steps, self.dtype,
                                  name="denoiser")
        fm1 = FlowMatchingModule(_latent_fm_cfg(c), self.dtype, name="fm_latent")
        fm2 = FlowMatchingModule(_latent_fm_cfg(c), self.dtype, name="fm_latent_2")

        out = {"recon_loss": recon_loss, "kd_loss_pre": zero, "fm_loss_pre": zero,
               "kd_loss_post": zero, "fm_loss_post": zero}

        if v == 1:
            out["kd_loss_pre"] = lscale * self._kd_crit(z_s, z_t)
        elif v == 2:
            fm_loss, _ = fm1(z_s, z_t, train=train, loss_layers=loss_layers)
            out["fm_loss_pre"] = fm_loss
        elif v == 3:
            z_deno = denoiser(adapter(z_s))
            out["kd_loss_post"] = lscale * self._kd_crit(z_deno, z_t)
        elif v == 4:
            fm_loss_pre, _ = fm1(z_s, z_t, train=train, loss_layers=loss_layers)
            z_deno = denoiser(adapter(z_s))
            out["fm_loss_pre"] = fm_loss_pre
            out["kd_loss_post"] = lscale * self._kd_crit(z_deno, z_t)
        elif v == 5:
            z_deno = denoiser(adapter(z_s))
            fm_loss, _ = fm1(z_deno, z_t, train=train, loss_layers=loss_layers)
            out["fm_loss_post"] = fm_loss
        elif v == 6:
            fm_loss_pre, z_aligned = fm1(z_s, z_t, train=train, loss_layers=loss_layers)
            z_deno = denoiser(adapter(z_aligned))
            fm_loss_post, _ = fm2(z_deno, z_t, train=train, loss_layers=loss_layers)
            out["fm_loss_pre"] = fm_loss_pre
            out["fm_loss_post"] = fm_loss_post
        elif v == 7:
            fm_loss_pre, _ = fm1(z_s, z_t, train=train, loss_layers=loss_layers)
            z_deno = denoiser(adapter(z_s))
            fm_loss_post, _ = fm2(z_deno, z_t, train=train, loss_layers=loss_layers)
            out["fm_loss_pre"] = fm_loss_pre
            out["fm_loss_post"] = fm_loss_post
        elif v == 8:
            fm_loss_pre, z_aligned = fm1(z_s, z_t, train=train, loss_layers=loss_layers)
            z_deno = denoiser(adapter(z_aligned))
            out["fm_loss_pre"] = fm_loss_pre
            out["kd_loss_post"] = lscale * self._kd_crit(z_deno, z_t)
        else:
            raise ValueError(f"model_version must be 1..8, got {v}")
        return out
