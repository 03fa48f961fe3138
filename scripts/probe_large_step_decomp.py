"""Decompose the conformer-LARGE CTC train step (bench_train's 195.8 ms line).

The sublayer probe (probe_large_sublayers.py) accounts for ~148 ms of the
step (attn 3.0 + ffn 1.77x2 + conv 1.59 per layer x 18); this probe measures
where the remaining ~48 ms lives: value_and_grad of the full loss vs the
optimizer/guard machinery vs the frontend+subsampling vs CTC+decoder.

Usage: python scripts/probe_large_step_decomp.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from tpu_asr.config import (DecoderConfig, DistillationConfig,
                                EncoderConfig, ModelConfig, OptimConfig)
    from tpu_asr.models.distil_model import DistilCTCModel
    from tpu_asr.train.optim import build_optimizer
    from tpu_asr.train.trainer import (DistilTrainState,
                                       make_distil_train_step)

    B, SEC, SR = 32, 15, 16000
    key = jax.random.key(0, impl="rbg")
    rng = np.random.default_rng(0)
    batch = {
        "signal": jnp.asarray(
            rng.normal(size=(B, SEC * SR)).astype(np.float32) * 0.1),
        "signal_len": jnp.full((B,), SEC * SR, jnp.int32),
        "tokens": jnp.asarray(rng.integers(1, 128, size=(B, 48)), jnp.int32),
        "token_len": jnp.full((B,), 48, jnp.int32),
    }

    teacher_cfg = ModelConfig()
    large_cfg = ModelConfig(
        spec_augment=None,
        encoder=EncoderConfig(n_layers=18, d_model=512, n_heads=8),
        decoder=DecoderConfig(feat_in=512, num_classes=128))
    model = DistilCTCModel(large_cfg, teacher_cfg, DistillationConfig())
    vars_l = model.init(
        {"params": key, "specaug": key, "dropout": key, "gumbel": key,
         "noise": key, "layerdrop": key},
        batch["signal"], batch["signal_len"], batch["tokens"],
        batch["token_len"], train=True)
    tx = build_optimizer(OptimConfig(), vars_l["params"])
    state = DistilTrainState.create(
        apply_fn=model.apply, params=vars_l["params"],
        batch_stats=vars_l.get("batch_stats", {}), tx=tx)

    def timeit(f, *a, n=20):
        r = f(*a)
        jax.block_until_ready(r)
        # fence with a host transfer of one scalar-ish leaf
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(n):
                r = f(*a)
            jax.block_until_ready(r)
            best = min(best, (time.perf_counter() - t0) / n * 1e3)
        return best

    # 1. full train step (bench_train's measurement)
    step = jax.jit(make_distil_train_step(model))
    st2, m = step(state, batch, key)
    print(f"full step            : {timeit(step, state, batch, key):8.2f} ms")

    # 2. value_and_grad of the loss only (no guard/opt/update)
    def loss_fn(params):
        variables = {"params": params, "batch_stats": state.batch_stats}
        from tpu_asr.train.trainer import _step_rngs
        out, _ = model.apply(
            variables, batch["signal"], batch["signal_len"],
            batch["tokens"], batch["token_len"], train=True,
            rngs=_step_rngs(key, state.step), mutable=["batch_stats"])
        return out.losses["total"]

    vg = jax.jit(jax.value_and_grad(loss_fn))
    print(f"value_and_grad only  : {timeit(vg, state.params):8.2f} ms")

    # 3. forward only (train=True)
    fwd = jax.jit(loss_fn)
    print(f"forward only (train) : {timeit(fwd, state.params):8.2f} ms")

    # 4. guard + optimizer + global_norm on existing grads
    _, grads = jax.jit(jax.value_and_grad(loss_fn))(state.params)

    def opt_only(state, grads):
        import optax
        flat, tree = jax.tree.flatten(grads)
        bad = sum(jnp.sum(~jnp.isfinite(g)) for g in flat)
        flat = [jnp.where(jnp.isfinite(g), g, 0.0) for g in flat]
        grads = jax.tree.unflatten(tree, flat)
        updates, new_opt = state.tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        return bad, optax.global_norm(grads), new_params, new_opt

    oj = jax.jit(opt_only)
    print(f"guard+opt+gnorm only : {timeit(oj, state, grads):8.2f} ms")

    # 5. mel frontend fwd only, isolated (subsampling is accounted for in
    # the step's non-sublayer remainder — section 1 minus sections 2-4)
    from tpu_asr.ops.features import FilterbankFeatures
    fe = FilterbankFeatures(large_cfg.preprocessor)

    def pre_loss(_):
        mel, mlen = fe(batch["signal"], batch["signal_len"])
        return jnp.sum(mel.astype(jnp.float32) ** 2) * 1e-9

    print(f"mel frontend fwd     : {timeit(jax.jit(pre_loss), state.params):8.2f} ms")


if __name__ == "__main__":
    main()
