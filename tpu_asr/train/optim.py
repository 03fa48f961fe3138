"""Optimizers + LR schedulers — rebuild of the exercised slice of NeMo's optim
registry (NeMo/nemo/core/optim/optimizers.py:77-181, lr_scheduler.py:422-530)
on optax.

- `noam_annealing_schedule` reproduces NeMo NoamAnnealing exactly:
  lr * d_model^-0.5 * min(step^-0.5, step * warmup^-1.5), with the min_lr floor
  applied only after warmup (lr_scheduler.py:473-530). The teacher recipe is
  AdamW lr 2.0 betas (0.9, 0.98) wd 1e-3, warmup 10k, min_lr 1e-6
  (conformer_ctc_bpe.yaml:176-193).
- `cosine_annealing_schedule` is NeMo CosineAnnealing (linear warmup ->
  half-cosine to min_lr, lr_scheduler.py:422-470).
- `build_optimizer` assembles grad-clip + the named optimizer and FREEZES every
  parameter under a `teacher` subtree (set_to_zero), replacing the reference's
  `requires_grad = False` loop (asr_train.py:1723-1725) — this also keeps
  AdamW weight decay off the frozen teacher.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import optax

from tpu_asr.config import OptimConfig


def noam_annealing_schedule(lr: float, d_model: int, warmup_steps: int,
                            min_lr: float = 0.0) -> optax.Schedule:
    norm = d_model ** -0.5

    def schedule(count):
        step = jnp.maximum(count + 1, 1).astype(jnp.float32)  # optax counts from 0
        if warmup_steps and warmup_steps > 0:
            mult = norm * jnp.minimum(step ** -0.5, step * warmup_steps ** -1.5)
        else:
            mult = norm * step ** -0.5
        out = lr * mult
        # NeMo applies the min_lr floor only past warmup (lr_scheduler.py:528)
        return jnp.where(step > warmup_steps, jnp.maximum(out, min_lr), out)

    return schedule


def cosine_annealing_schedule(lr: float, warmup_steps: int, max_steps: int,
                              min_lr: float = 0.0) -> optax.Schedule:
    def schedule(count):
        step = (count + 1).astype(jnp.float32) if hasattr(count, "astype") \
            else jnp.asarray(count + 1, jnp.float32)
        warm = lr * step / jnp.maximum(warmup_steps, 1)
        progress = jnp.clip((step - warmup_steps) /
                            jnp.maximum(max_steps - warmup_steps, 1), 0.0, 1.0)
        cos = min_lr + (lr - min_lr) * 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        return jnp.where(step <= warmup_steps, warm, cos)

    return schedule


def build_schedule(cfg: OptimConfig) -> optax.Schedule:
    name = cfg.sched_name.lower()
    if name in ("noamannealing", "noam"):
        return noam_annealing_schedule(cfg.lr, cfg.d_model, cfg.warmup_steps,
                                       cfg.min_lr)
    if name in ("cosineannealing", "cosine"):
        return cosine_annealing_schedule(cfg.lr, cfg.warmup_steps,
                                         cfg.max_steps, cfg.min_lr)
    if name in ("none", "constant"):
        return optax.constant_schedule(cfg.lr)
    raise ValueError(f"unknown scheduler: {cfg.sched_name}")


def _base_optimizer(cfg: OptimConfig, schedule: optax.Schedule):
    name = cfg.name.lower()
    if name == "adamw":
        return optax.adamw(schedule, b1=cfg.betas[0], b2=cfg.betas[1],
                           weight_decay=cfg.weight_decay)
    if name == "adam":
        return optax.adam(schedule, b1=cfg.betas[0], b2=cfg.betas[1])
    if name == "sgd":
        return optax.sgd(schedule, momentum=cfg.betas[0])
    if name == "novograd":
        return optax.novograd(schedule, b1=cfg.betas[0], b2=cfg.betas[1],
                              weight_decay=cfg.weight_decay)
    if name == "adafactor":
        return optax.adafactor(schedule)
    raise ValueError(f"unknown optimizer: {cfg.name}")


def build_optimizer(cfg: OptimConfig, params: Optional[Any] = None,
                    freeze_teacher: bool = True) -> optax.GradientTransformation:
    """Grad-clip + named optimizer; params under a top-level 'teacher' key are
    frozen when present."""
    schedule = build_schedule(cfg)
    tx = _base_optimizer(cfg, schedule)
    if cfg.gradient_clip_val and cfg.gradient_clip_val > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.gradient_clip_val), tx)

    if freeze_teacher and params is not None and "teacher" in params:
        def label_fn(p):
            return {k: ("freeze" if k == "teacher" else "train") for k in p}
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, label_fn)
    return tx
