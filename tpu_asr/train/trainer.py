"""Functional train/eval steps for KD training — the TPU-native equivalent of
the reference's Lightning `training_step`/`validation_pass` plumbing
(asr_train.py:677-778, NeMo ctc_models.py:549-692).

One jitted program per step: student forward, frozen-teacher forward, every
enabled KD loss, backward, and the optimizer update all compile into a single
XLA computation (the BASELINE.json north-star requirement). Data parallelism:
jit the step with the batch sharded over the mesh's `data` axis and the state
replicated — XLA inserts the gradient psum over ICI.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from tpu_asr.models.distil_model import DistilCTCModel
from tpu_asr.ops.ctc import ctc_greedy_decode, ctc_loss


class DistilTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, *, apply_fn, params, batch_stats, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=batch_stats, opt_state=tx.init(params),
                   apply_fn=apply_fn, tx=tx)


def _step_rngs(base_rng: jax.Array, step: jnp.ndarray) -> Dict[str, jax.Array]:
    folded = jax.random.fold_in(base_rng, step)
    keys = jax.random.split(folded, 5)
    return {"specaug": keys[0], "dropout": keys[1], "gumbel": keys[2],
            "noise": keys[3], "layerdrop": keys[4]}


def make_distil_train_step(model: DistilCTCModel, cached_teacher: bool = False,
                           harvest_teacher: bool = False,
                           packed: bool = False,
                           cached_all_layers: bool = False,
                           harvest_all: bool = False):
    """Returns train_step(state, batch, base_rng) -> (state, metrics).

    batch: dict with `signal` (B, L) f32, `signal_len` (B,) i32,
    `tokens` (B, S) i32, `token_len` (B,) i32.

    Teacher-feature cache variants (train/loop.py TeacherFeatureCache):
    `cached_teacher` consumes `batch["tch_last_feat"]` (B, T', Dt) instead of
    running the frozen teacher forward; `cached_all_layers` consumes
    `batch["tch_all_feat"]` (B, L, T', Dt) — batch-major so the dp sharding
    of the host->device feed lands on the batch axis — covering EVERY KD
    mode (FM/DiffKD/diffm/full-layerwise); `harvest_teacher` returns
    (state, metrics, (tch_last, tch_feats, encoded_len)) so the loop can
    record the teacher outputs while training normally.

    `harvest_all` additionally returns the full per-layer stack in the
    harvest tuple's second slot (None otherwise — gating it keeps the
    last-layer cache from materializing a large unused jit output).

    `packed`: packed-segment training (model.forward_packed_train) — batch
    additionally carries the plan arrays `pk_src_utt`, `pk_src_pos`,
    `pk_seg` (R, Tp) and `pk_row`, `pk_start` (B,) from
    data/packing.plan_packing over the deterministic subsampled lengths.
    """

    def train_step(state: DistilTrainState, batch: Dict[str, jnp.ndarray],
                   base_rng: jax.Array):
        rngs = _step_rngs(base_rng, state.step)

        def loss_fn(params):
            # Stop gradients AT the frozen teacher's params, not only at its
            # outputs: with zero tangents flowing in, JAX never linearizes
            # the teacher subgraph — which both skips useless JVP work and
            # lets the teacher run VJP-less eval-only kernels (the fused
            # int8 FFN kernel under teacher_cfg.encoder.quantization='int8')
            # inside value_and_grad. Teacher grads stay structural zeros
            # (the optimizer masks them anyway, train/optim.py).
            import collections.abc
            if isinstance(params, collections.abc.Mapping) \
                    and "teacher" in params:
                params = {**params,
                          "teacher": jax.lax.stop_gradient(params["teacher"])}
            variables = {"params": params, "batch_stats": state.batch_stats}
            if packed:
                out, mutated = model.apply(
                    variables, batch["signal"], batch["signal_len"],
                    batch["tokens"], batch["token_len"],
                    batch["pk_src_utt"], batch["pk_src_pos"],
                    batch["pk_seg"], batch["pk_row"], batch["pk_start"],
                    train=True, rngs=rngs, mutable=["batch_stats"],
                    method=DistilCTCModel.forward_packed_train)
            else:
                out, mutated = model.apply(
                    variables, batch["signal"], batch["signal_len"],
                    batch["tokens"], batch["token_len"], train=True,
                    tch_last_feat=(batch["tch_last_feat"] if cached_teacher
                                   else None),
                    tch_all_feat=(
                        jnp.transpose(batch["tch_all_feat"], (1, 0, 2, 3))
                        if cached_all_layers else None),
                    rngs=rngs, mutable=["batch_stats"])
            return out.losses["total"], (out, mutated.get("batch_stats",
                                                          state.batch_stats))

        (loss, (out, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        nan_metrics = {}
        if model.student_cfg.skip_nan_grad:
            # NeMo skip_nan_grad guard (asr_model.py:151+): zero non-finite
            # gradient leaves and report how many were hit
            flat, tree = jax.tree.flatten(grads)
            bad = sum(jnp.sum(~jnp.isfinite(g)) for g in flat)
            flat = [jnp.where(jnp.isfinite(g), g, 0.0) for g in flat]
            grads = jax.tree.unflatten(tree, flat)
            nan_metrics["nonfinite_grad_elems"] = bad
        updates, new_opt_state = state.tx.update(grads, state.opt_state,
                                                 state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_stats,
                                  opt_state=new_opt_state)
        metrics = {f"loss/{k}": v for k, v in out.losses.items()}
        metrics.update(out.metrics)
        metrics.update(nan_metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        if harvest_teacher:
            return new_state, metrics, (
                out.tch_last, out.tch_feats if harvest_all else None,
                out.encoded_len)
        return new_state, metrics

    return train_step


def make_distil_multi_step(model: DistilCTCModel):
    """Multi-step-per-dispatch training: `multi_step(state, batches,
    base_rng)` runs K optimizer steps back-to-back ON DEVICE via `lax.scan`,
    where every leaf of `batches` is stacked (K, ...) along a leading steps
    axis. Returns (state after K steps, metrics stacked (K,)).

    Semantically identical to K sequential `train_step` calls: per-step
    randomness comes from folding `base_rng` with `state.step`, which the
    scan carry increments — the same stream a per-call loop produces
    (tests/test_trainer_multi_step.py pins the equivalence). What it buys on
    TPU: one dispatch per K steps amortizes host/dispatch latency (~1 ms per
    call through the axon dev tunnel) and removes host-loop gaps between
    steps; the device runs the K-step program uninterrupted. Use via
    `TrainConfig.steps_per_dispatch` (train/loop.py stacks loader batches)."""
    train_step = make_distil_train_step(model)

    def multi_step(state: DistilTrainState, batches: Dict[str, jnp.ndarray],
                   base_rng: jax.Array):
        def body(st, batch):
            return train_step(st, batch, base_rng)
        return jax.lax.scan(body, state, batches)

    return multi_step


def make_distil_eval_step(model: DistilCTCModel):
    """eval_step(state, batch) -> (metrics, decoded tokens + lengths).

    Greedy CTC decode stays on device (vectorized collapse/dedup); only the
    final packed token ids come back to host for detokenize + WER.
    """

    def eval_step(state: DistilTrainState, batch: Dict[str, jnp.ndarray]):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        out = model.apply(variables, batch["signal"], batch["signal_len"],
                          batch.get("tokens"), batch.get("token_len"),
                          train=False)
        tokens, n_tokens = ctc_greedy_decode(out.log_probs, out.encoded_len)
        metrics = {f"loss/{k}": v for k, v in out.losses.items()}
        if batch.get("tokens") is not None:
            # Per-sample NLLs so the eval loop can exclude the cyclic-repeat
            # rows padded in for dp divisibility — the batch-mean in
            # losses['ctc'] mis-weights them (reference validation_pass
            # averages over real utterances only, ctc_models.py:625-665).
            metrics["per_sample_ctc"] = ctc_loss(
                out.log_probs, batch["tokens"], out.encoded_len,
                batch["token_len"], reduction="none")
        return metrics, (tokens, n_tokens)

    return eval_step
