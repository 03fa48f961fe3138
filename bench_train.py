"""Training-step benchmark (supplementary to bench.py): KD train-step time on
the reference workload shape — batch 32 x 15 s audio (conformer_ctc_bpe.yaml
batch guidance :28-43; scripts/train use batch 32), teacher+student+losses+
optimizer in ONE jitted XLA program.

Prints one JSON line per configuration:
  {"config": ..., "ms_per_step": ..., "audio_sec_per_sec": ...}

BASELINE.json names "KD train step time" as the training metric; the
reference publishes no number (BASELINE.md), so these are this framework's
own records across rounds.
"""

from __future__ import annotations

import json
import time

import numpy as np

B, SEC, SR = 32, 15, 16000
TOKENS = 48
STEPS = 5


def main() -> None:
    import sys

    import jax

    # --only <substr>: run only configs whose name contains <substr>
    # (compiles through the remote tunnel are minutes each — targeted runs)
    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1]

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from tpu_asr.config import (DistillationConfig, FlowMatchingConfig,
                                ModelConfig, OptimConfig, RouterConfig,
                                make_student_config)
    from tpu_asr.models.distil_model import DistilCTCModel
    from tpu_asr.train.optim import build_optimizer
    from tpu_asr.train.trainer import DistilTrainState, make_distil_train_step

    teacher_cfg = ModelConfig()
    student_cfg = make_student_config(teacher_cfg)
    flow = FlowMatchingConfig(meta_encoder_type="mlp", student_dim=88,
                              teacher_dim=176, student_head_num=2,
                              training_sampling=8, inference_sampling=8)
    router = RouterConfig(max_steps=16, stu_dim=88, tch_dim=176,
                          num_layers=16)
    configs = {
        "ctc_student": DistillationConfig(),
        "logit_kd": DistillationConfig(use_logit_distillation=True,
                                       kd_alpha=0.1),
        "flowkd_mlp8": DistillationConfig(use_logit_distillation=True,
                                          kd_alpha=0.1,
                                          use_flow_matching=True, flow=flow),
    }

    rng = np.random.default_rng(0)
    batch = {
        "signal": jnp.asarray(
            rng.normal(size=(B, SEC * SR)).astype(np.float32) * 0.1),
        "signal_len": jnp.full((B,), SEC * SR, jnp.int32),
        "tokens": jnp.asarray(rng.integers(0, 128, size=(B, TOKENS)),
                              jnp.int32),
        "token_len": jnp.full((B,), TOKENS, jnp.int32),
    }
    key = jax.random.key(0, impl="rbg")   # training-default PRNG (TrainConfig)

    for name, distill in configs.items():
        if only is not None and only not in name:
            continue
        model = DistilCTCModel(student_cfg, teacher_cfg, distill)
        variables = model.init(
            {"params": key, "specaug": key, "dropout": key, "gumbel": key,
             "noise": key, "layerdrop": key},
            batch["signal"], batch["signal_len"], batch["tokens"],
            batch["token_len"], train=True)
        tx = build_optimizer(OptimConfig(), variables["params"])
        state = DistilTrainState.create(
            apply_fn=model.apply, params=variables["params"],
            batch_stats=variables.get("batch_stats", {}), tx=tx)
        step = jax.jit(make_distil_train_step(model))
        state, metrics = step(state, batch, key)
        float(metrics["loss/total"])         # host transfer = hard sync
        # NOTE: under the axon tunnel, block_until_ready can return before
        # device completion; a host transfer of a value that depends on the
        # whole chained computation is the reliable fence.
        t0 = time.perf_counter()
        for i in range(STEPS):
            state, metrics = step(state, batch, jax.random.fold_in(key, i))
        float(metrics["loss/total"])
        dt = (time.perf_counter() - t0) / STEPS

        from tpu_asr.utils.flops import compiled_flops, mfu
        fl = compiled_flops(step, state, batch, key)
        util = mfu(fl, dt)

        # sustained: STEPS optimizer steps per dispatch (lax.scan over
        # stacked batches, train/trainer.make_distil_multi_step) — removes
        # the per-call host/tunnel dispatch floor the loop above pays
        from tpu_asr.train.trainer import make_distil_multi_step
        batches = {
            "signal": jnp.asarray(
                rng.normal(size=(STEPS, B, SEC * SR)).astype(np.float32)
                * 0.1),
            "signal_len": jnp.broadcast_to(batch["signal_len"],
                                           (STEPS, B)),
            "tokens": jnp.broadcast_to(batch["tokens"], (STEPS, B, TOKENS)),
            "token_len": jnp.broadcast_to(batch["token_len"], (STEPS, B)),
        }
        multi = jax.jit(make_distil_multi_step(model))
        state2, mets = multi(state, batches, key)
        float(mets["loss/total"][-1])
        t0 = time.perf_counter()
        state2, mets = multi(state, batches, key)
        float(mets["loss/total"][-1])
        dt_sus = (time.perf_counter() - t0) / STEPS

        print(json.dumps({
            "config": name,
            "ms_per_step": round(dt * 1e3, 1),
            "ms_per_step_sustained": round(dt_sus * 1e3, 1),
            "audio_sec_per_sec": round(B * SEC / dt_sus, 1),
            "mfu": round(mfu(fl, dt_sus), 4) if util is not None else None,
            "tflops_per_step": round(fl / 1e12, 3) if fl else None,
        }))

        if name == "logit_kd":
            # teacher-feature cache (TrainConfig.cache_teacher): epochs >= 1
            # skip the frozen-teacher forward — measure the cached step on
            # harvested features (exact semantics; tests/test_teacher_cache)
            harvest = jax.jit(make_distil_train_step(model,
                                                     harvest_teacher=True))
            _, _, (tch_last, _) = harvest(state, batch, key)
            batch_c = dict(batch)
            batch_c["tch_last_feat"] = tch_last
            cached = jax.jit(make_distil_train_step(model,
                                                    cached_teacher=True))
            st_c, mets_c = cached(state, batch_c, key)
            float(mets_c["loss/total"])
            t0 = time.perf_counter()
            for i in range(STEPS):
                st_c, mets_c = cached(st_c, batch_c,
                                      jax.random.fold_in(key, i))
            float(mets_c["loss/total"])
            dt_c = (time.perf_counter() - t0) / STEPS
            print(json.dumps({
                "config": "logit_kd + cache_teacher (epochs >= 1)",
                "ms_per_step": round(dt_c * 1e3, 1),
                "audio_sec_per_sec": round(B * SEC / dt_c, 1)}))

        if name == "ctc_student":
            # batch-scaling: B=64 is the reference's bf16 batch guidance
            # (conformer_ctc_bpe.yaml:28-43) — remat keeps activations O(1)
            # per layer, so the bigger batch fits easily and feeds the MXU
            # larger matmuls
            b2 = 2 * B
            batch64 = {
                "signal": jnp.asarray(
                    rng.normal(size=(b2, SEC * SR)).astype(np.float32)
                    * 0.1),
                "signal_len": jnp.full((b2,), SEC * SR, jnp.int32),
                "tokens": jnp.asarray(
                    rng.integers(0, 128, size=(b2, TOKENS)), jnp.int32),
                "token_len": jnp.full((b2,), TOKENS, jnp.int32),
            }
            st64, m64 = step(state, batch64, key)
            float(m64["loss/total"])
            t0 = time.perf_counter()
            for i in range(STEPS):
                st64, m64 = step(st64, batch64, jax.random.fold_in(key, i))
            float(m64["loss/total"])
            dt64 = (time.perf_counter() - t0) / STEPS
            fl64 = compiled_flops(step, state, batch64, key)
            print(json.dumps({
                "config": "ctc_student @ batch 64",
                "ms_per_step": round(dt64 * 1e3, 1),
                "audio_sec_per_sec": round(b2 * SEC / dt64, 1),
                "mfu": (round(mfu(fl64, dt64), 4)
                        if mfu(fl64, dt64) is not None else None),
                "tflops_per_step": round(fl64 / 1e12, 3) if fl64 else None}))

    if only is not None and only not in "ctc conformer-LARGE":
        return
    # ---- production-dims training: conformer-LARGE (121 M) CTC step ----
    # The reference size table's production row (conformer_ctc_bpe.yaml:7-18:
    # d 512, 18 layers, 8 heads). Shows the TRAINING path's MFU without the
    # small model's d88/d176 lane-padding tax (same framing as bench.py's
    # LARGE inference line). Pure-CTC config -> the frozen-teacher forward is
    # gated off (models/distil_model.py needs_teacher); remat keeps
    # activations O(1) per layer.
    from tpu_asr.config import (DecoderConfig as _Dec, EncoderConfig as _Enc,
                                ModelConfig as _MC)
    from tpu_asr.utils.flops import compiled_flops, mfu

    large_cfg = _MC(
        spec_augment=None,
        encoder=_Enc(n_layers=18, d_model=512, n_heads=8),
        decoder=_Dec(feat_in=512, num_classes=128))
    model_l = DistilCTCModel(large_cfg, teacher_cfg, DistillationConfig())
    vars_l = model_l.init(
        {"params": key, "specaug": key, "dropout": key, "gumbel": key,
         "noise": key, "layerdrop": key},
        batch["signal"], batch["signal_len"], batch["tokens"],
        batch["token_len"], train=True)
    tx_l = build_optimizer(OptimConfig(), vars_l["params"])
    state_l = DistilTrainState.create(
        apply_fn=model_l.apply, params=vars_l["params"],
        batch_stats=vars_l.get("batch_stats", {}), tx=tx_l)
    step_l = jax.jit(make_distil_train_step(model_l))
    state_l, m_l = step_l(state_l, batch, key)
    float(m_l["loss/total"])
    t0 = time.perf_counter()
    for i in range(STEPS):
        state_l, m_l = step_l(state_l, batch, jax.random.fold_in(key, i))
    float(m_l["loss/total"])
    dt_l = (time.perf_counter() - t0) / STEPS
    fl_l = compiled_flops(step_l, state_l, batch, key)
    print(json.dumps({
        "config": "ctc conformer-LARGE (121M, d512x18L) @ batch 32",
        "ms_per_step": round(dt_l * 1e3, 1),
        "audio_sec_per_sec": round(B * SEC / dt_l, 1),
        "mfu": (round(mfu(fl_l, dt_l), 4)
                if mfu(fl_l, dt_l) is not None else None),
        "tflops_per_step": round(fl_l / 1e12, 3) if fl_l else None}))


if __name__ == "__main__":
    main()
