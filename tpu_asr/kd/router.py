"""DynamicStepRouter — per-sample ODE-step-count policy for FM-KT.

Rebuild of the reference DynamicStepRouter (asr_train.py:1021-1218):
GAP-reduce student/teacher features over time -> Linear+ReLU projections ->
concat (+ layer-id embedding) -> MLP -> K logits; training samples with
Gumbel-softmax (straight-through index), eval takes argmax. Regularizers:
budget `(mean_steps - target)^2` and an entropy bonus (asr_train.py:1190-1206).

Reference-faithful quirks kept deliberately (SURVEY.md §7.3):
- The budget term is computed from the *sampled integer* steps, which carry no
  gradient (argmax); the only gradient signal into the router weights is the
  entropy bonus. We mirror that exactly (steps are produced by argmax).
- The straight-through one-hot `y` the reference builds is never consumed
  downstream (asr_train.py:1184); we do not build it.

Batch aggregation strategies (`batch_mode`/`batch_avg`/`batch_median`/`group`)
are applied by the caller (distillation model), matching asr_train.py:610-637;
helpers live here. `batch_median` reproduces torch.median's lower-middle
element semantics (NOT the mean of the two middle values).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpu_asr.config import RouterConfig


class DynamicStepRouter(nn.Module):
    cfg: RouterConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        stu_feat: jnp.ndarray,         # (B, T, C_s)
        tch_feat: jnp.ndarray,         # (B, T, C_t)
        layer_id,                      # int or (B,) int array
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
        c = self.cfg
        b = stu_feat.shape[0]
        k = c.max_steps

        # time reduction ('gap'/'mean' -> mean over T; 'last' -> final frame)
        if c.feature_reduce in ("gap", "mean"):
            stu_vec = jnp.mean(stu_feat, axis=1)
            tch_vec = jnp.mean(tch_feat, axis=1)
        elif c.feature_reduce == "last":
            stu_vec = stu_feat[:, -1]
            tch_vec = tch_feat[:, -1]
        else:
            raise ValueError(f"unknown feature_reduce: {c.feature_reduce}")

        stu_h = nn.relu(nn.Dense(c.proj_dim, dtype=self.dtype, name="stu_proj")(stu_vec))
        tch_h = nn.relu(nn.Dense(c.proj_dim, dtype=self.dtype, name="tch_proj")(tch_vec))

        if c.use_layer_id:
            lid = jnp.broadcast_to(jnp.asarray(layer_id, jnp.int32), (b,))
            lyr = nn.Embed(c.num_layers, c.layer_emb_dim, dtype=self.dtype,
                           name="layer_emb")(lid)
            h = jnp.concatenate([stu_h, tch_h, lyr], axis=-1)
        else:
            h = jnp.concatenate([stu_h, tch_h], axis=-1)

        h = nn.relu(nn.Dense(c.hidden_dim, dtype=self.dtype, name="router_fc1")(h))
        logits = nn.Dense(k, dtype=self.dtype, name="router_fc2")(h).astype(jnp.float32)

        if c.min_steps > 1:
            mask = jnp.where(jnp.arange(k) < c.min_steps - 1, -jnp.inf, 0.0)
            logits = logits + mask[None, :]

        probs = jax.nn.softmax(logits, axis=-1)
        expected_steps = jnp.sum(probs * jnp.arange(1, k + 1, dtype=jnp.float32), axis=-1)

        if train:
            u = jax.random.uniform(self.make_rng("gumbel"), logits.shape,
                                   minval=1e-20, maxval=1.0)
            gumbel = -jnp.log(-jnp.log(u))
            y_soft = jax.nn.softmax((logits + gumbel) / c.temperature, axis=-1)
            index = jnp.argmax(y_soft, axis=-1)
            steps = index.astype(jnp.int32) + 1

            router_loss = jnp.zeros((), jnp.float32)
            if c.budget_target is not None and c.budget_weight > 0:
                batch_mean = jnp.mean(steps.astype(jnp.float32))  # no grad (argmax)
                router_loss = router_loss + c.budget_weight * jnp.square(
                    batch_mean - c.budget_target)
            if c.entropy_weight > 0:
                entropy = -jnp.sum(probs * jnp.log(jnp.clip(probs, 1e-8)), axis=-1)
                router_loss = router_loss - c.entropy_weight * jnp.mean(entropy)
        else:
            steps = jnp.argmax(probs, axis=-1).astype(jnp.int32) + 1
            router_loss = jnp.zeros((), jnp.float32)

        aux = {"logits": logits, "probs": probs, "expected_steps": expected_steps}
        return steps, router_loss, aux


def aggregate_steps(steps_b: jnp.ndarray, strategy: str, max_steps: int) -> jnp.ndarray:
    """Batch aggregation of per-sample step counts (asr_train.py:610-637).

    Returns a scalar int32 step count for batch_mode/avg/median; for `group` the
    caller should keep the per-sample vector (this helper raises).
    """
    if strategy == "batch_mode":
        # torch.mode returns the smallest value among ties -> argmax picks first max
        counts = jnp.sum(jax.nn.one_hot(steps_b - 1, max_steps, dtype=jnp.int32), axis=0)
        return jnp.argmax(counts).astype(jnp.int32) + 1
    if strategy == "batch_avg":
        avg = jnp.round(jnp.mean(steps_b.astype(jnp.float32)))
        return jnp.clip(avg, 1, max_steps).astype(jnp.int32)
    if strategy == "batch_median":
        # torch.median: lower of the two middle elements for even-sized batches
        med = jnp.sort(steps_b)[(steps_b.shape[0] - 1) // 2].astype(jnp.float32)
        return jnp.clip(med, 1, max_steps).astype(jnp.int32)
    raise ValueError(f"Unknown router strategy: {strategy}")
