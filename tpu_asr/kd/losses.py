"""Logit-KL and layerwise feature-MSE distillation losses.

Rebuilds the reference's inline loss code (asr_train.py:404-414, 725-748)
with the exact torch semantics:
- logit KL: stu_logp = log_softmax(log_probs / T) — note the reference feeds
  ALREADY log-softmaxed decoder outputs through a second softmax (a deliberate
  quirk we reproduce); tch_p = softmax(tch_log_probs / T);
  loss = KLDiv(batchmean) * T^2 where `batchmean` divides the total sum by the
  batch size B only (not B*T).
- layerwise MSE: shared Linear(student_dim -> teacher_dim) projection applied to
  every layer's student feature, MSE against the teacher feature, averaged over
  layers (asr_train.py:736-748).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def logit_kl_loss(
    stu_log_probs: jnp.ndarray,   # (B, T, V) student log-softmax outputs
    tch_log_probs: jnp.ndarray,   # (B, T, V) teacher log-softmax outputs
    temperature: float = 1.0,
) -> jnp.ndarray:
    t = temperature
    stu = jax.nn.log_softmax(stu_log_probs.astype(jnp.float32) / t, axis=-1)
    tch = jax.nn.softmax(tch_log_probs.astype(jnp.float32) / t, axis=-1)
    tch = jax.lax.stop_gradient(tch)
    # sum p_t * (log p_t - log p_s) over ALL elements, / B  (torch 'batchmean')
    log_tch = jnp.log(jnp.clip(tch, 1e-38))
    kl = jnp.sum(tch * (log_tch - stu)) / stu_log_probs.shape[0]
    return kl * (t * t)


def layerwise_mse_loss(
    stu_feats_proj: jnp.ndarray,  # (L, B, T, C_t) projected student features
    tch_feats: jnp.ndarray,       # (L, B, T, C_t) teacher features
    average_layers: bool = True,
) -> jnp.ndarray:
    """Mean-per-layer MSE, summed then (optionally) averaged over L."""
    err = jnp.square(stu_feats_proj.astype(jnp.float32) -
                     jax.lax.stop_gradient(tch_feats).astype(jnp.float32))
    per_layer = jnp.mean(err, axis=(1, 2, 3))          # (L,)
    total = jnp.sum(per_layer)
    if average_layers:
        total = total / stu_feats_proj.shape[0]
    return total
