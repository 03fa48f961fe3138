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


def _sane(per_call_ms: float, sustained_ms: float = None,
          lighter_than_ms: float = None) -> bool:
    """Degraded-dispatch sanity (VERDICT r4 weak #2 / ROADMAP r4: the axon
    tunnel has phases where per-call loop numbers inflate 10-30 ms and
    physically impossible orderings appear, e.g. cached-teacher 64 ms >
    uncached 41 ms). Monotonicity invariants of a clean measurement:
    per-call >= sustained (the loop pays dispatch the scan amortizes) and a
    strictly-lighter step <= its heavier sibling."""
    if sustained_ms is not None and per_call_ms < sustained_ms * 0.95:
        return False
    if (lighter_than_ms is not None
            and per_call_ms > lighter_than_ms * 1.05 + 1.0):
        return False
    return True


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

    import dataclasses as _dc

    teacher_cfg = ModelConfig()
    student_cfg = make_student_config(teacher_cfg)
    # --teacher_int8 A/B (VERDICT r4 next #1): same KD config, frozen
    # teacher through the int8 serving path (fused int8 FFN kernel)
    teacher_cfg_q = _dc.replace(
        teacher_cfg, encoder=_dc.replace(teacher_cfg.encoder,
                                         quantization="int8"))
    flow = FlowMatchingConfig(meta_encoder_type="mlp", student_dim=88,
                              teacher_dim=176, student_head_num=2,
                              training_sampling=8, inference_sampling=8)
    router = RouterConfig(max_steps=16, stu_dim=88, tch_dim=176,
                          num_layers=16)
    flowkd = DistillationConfig(use_logit_distillation=True, kd_alpha=0.1,
                                use_flow_matching=True, flow=flow)
    configs = {
        "ctc_student": (DistillationConfig(), teacher_cfg),
        "logit_kd": (DistillationConfig(use_logit_distillation=True,
                                        kd_alpha=0.1), teacher_cfg),
        "flowkd_mlp8": (flowkd, teacher_cfg),
        "flowkd_mlp8_int8_teacher": (flowkd, teacher_cfg_q),
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

    for name, (distill, tch_cfg) in configs.items():
        if only is not None and only not in name:
            continue
        model = DistilCTCModel(student_cfg, tch_cfg, distill)
        variables = model.init(
            {"params": key, "specaug": key, "dropout": key, "gumbel": key,
             "noise": key, "layerdrop": key},
            batch["signal"], batch["signal_len"], batch["tokens"],
            batch["token_len"], train=True)
        tx = build_optimizer(OptimConfig(), variables["params"])
        state = DistilTrainState.create(
            apply_fn=model.apply, params=variables["params"],
            batch_stats=variables.get("batch_stats", {}), tx=tx)
        def per_call(step_fn, st, bt, steps=STEPS):
            # NOTE: under the axon tunnel, block_until_ready can return
            # before device completion; a host transfer of a value that
            # depends on the whole chained computation is the reliable fence.
            t0 = time.perf_counter()
            for i in range(steps):
                st, mets = step_fn(st, bt, jax.random.fold_in(key, i))
            float(mets["loss/total"])
            return (time.perf_counter() - t0) / steps, st

        step = jax.jit(make_distil_train_step(model))
        state, metrics = step(state, batch, key)
        float(metrics["loss/total"])         # host transfer = hard sync
        dt, state = per_call(step, state, batch)

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

        # degraded-dispatch self-check: rerun once on violation, then stamp
        if not _sane(dt * 1e3, sustained_ms=dt_sus * 1e3):
            dt, state = per_call(step, state, batch)
        degraded = not _sane(dt * 1e3, sustained_ms=dt_sus * 1e3)
        line = {
            "config": name,
            "ms_per_step": round(dt * 1e3, 1),
            "ms_per_step_sustained": round(dt_sus * 1e3, 1),
            "audio_sec_per_sec": round(B * SEC / dt_sus, 1),
            "mfu": round(mfu(fl, dt_sus), 4) if util is not None else None,
            "tflops_per_step": round(fl / 1e12, 3) if fl else None,
        }
        if degraded:
            line["degraded"] = True
        if dt * 1e3 > dt_sus * 1e3 + 30:
            # per-call inflated way past any observed clean dispatch floor:
            # trust only the sustained number from this phase
            line["dispatch_inflated"] = True
        print(json.dumps(line))

        if name == "logit_kd":
            # teacher-feature cache (TrainConfig.cache_teacher): epochs >= 1
            # skip the frozen-teacher forward — measure the cached step on
            # harvested features (exact semantics; tests/test_teacher_cache)
            harvest = jax.jit(make_distil_train_step(model,
                                                     harvest_teacher=True))
            _, _, (tch_last, _tf, _) = harvest(state, batch, key)
            batch_c = dict(batch)
            batch_c["tch_last_feat"] = tch_last
            cached = jax.jit(make_distil_train_step(model,
                                                    cached_teacher=True))
            st_c, mets_c = cached(state, batch_c, key)
            float(mets_c["loss/total"])
            dt_c, st_c = per_call(cached, st_c, batch_c)
            # cached does strictly less work than the uncached step — a
            # slower reading is the r4 degraded-phase marker; rerun + stamp
            if not _sane(dt_c * 1e3, lighter_than_ms=dt * 1e3):
                dt_c, st_c = per_call(cached, st_c, batch_c)
            line_c = {
                "config": "logit_kd + cache_teacher (epochs >= 1)",
                "ms_per_step": round(dt_c * 1e3, 1),
                "audio_sec_per_sec": round(B * SEC / dt_c, 1)}
            if not _sane(dt_c * 1e3, lighter_than_ms=dt * 1e3):
                line_c["degraded"] = True
            print(json.dumps(line_c))

        if name == "flowkd_mlp8":
            # ALL-layer teacher cache (TrainConfig.cache_teacher_all):
            # epochs >= 1 skip the teacher forward for the flowkd step too —
            # the (B, L, T', Dt) cached stack replaces the teacher encode
            # (exact semantics; tests/test_teacher_cache.py). Device-
            # resident here = the device-side ceiling; the real loop feeds
            # ~70 MB/step from host, which through THIS dev tunnel costs
            # more than the ~11 ms teacher forward it saves (ROADMAP r5).
            harvest = jax.jit(make_distil_train_step(
                model, harvest_teacher=True, harvest_all=True))
            _, _, (_tl, tch_feats, _el) = harvest(state, batch, key)
            batch_a = dict(batch)
            batch_a["tch_all_feat"] = jnp.transpose(tch_feats, (1, 0, 2, 3))
            cached_a = jax.jit(make_distil_train_step(
                model, cached_all_layers=True))
            st_a, mets_a = cached_a(state, batch_a, key)
            float(mets_a["loss/total"])
            dt_a, st_a = per_call(cached_a, st_a, batch_a)
            if not _sane(dt_a * 1e3, lighter_than_ms=dt * 1e3):
                dt_a, st_a = per_call(cached_a, st_a, batch_a)
            line_a = {
                "config": "flowkd_mlp8 + cache_teacher_all (epochs >= 1; "
                          "device-resident cached stack)",
                "ms_per_step": round(dt_a * 1e3, 1),
                "audio_sec_per_sec": round(B * SEC / dt_a, 1)}
            if not _sane(dt_a * 1e3, lighter_than_ms=dt * 1e3):
                line_a["degraded"] = True
            print(json.dumps(line_a))

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

    # ---- packed-segment TRAINING on realistic durations (round 5) ----
    # VERDICT r4 next #3: bucketed batches pay bucket padding on real
    # duration mixes; the packed step runs the encoder stacks on dense
    # packed rows (exact loss parity at drop=0 — tests/test_packed_train).
    if only is None or only == "packed_train":
        from tpu_asr.data.packing import train_pack_arrays

        # MEASURED REFUTATION (round 5, v5e same-session): packed 7217 vs
        # bucketed 7565 audio-s/s -> vs_bucketed 0.95. Why packing cannot
        # beat tight duration buckets here: segment-masked attention is
        # DENSE over t_pack (the kernel computes the full (Tp, Tp) scores
        # and masks), so per-frame attention cost grows by t_pack/T'_bucket
        # (5x for the shortest bucket) while the linear ops win only
        # 1/fill (~1.25x). Per-bucket t_pack = T'_bucket removes the
        # quadratic growth but then segments no longer combine at
        # LibriSpeech durations (host-side fill 0.64-0.76, linear win
        # < 1). The remaining lever would be tile-level BLOCK-SPARSE
        # segment attention (skip cross-segment score tiles). Packed
        # SERVING keeps its measured 1.3-1.5x (bench.py).
        pk_model = DistilCTCModel(student_cfg, teacher_cfg, flowkd)
        # enough utterances that every batch is full of REAL utts (no
        # cyclic-duplicate padding distorting either path)
        n_utts = 512
        rng_pk = np.random.default_rng(3)
        durs = np.clip(rng_pk.lognormal(np.log(6.2), 0.55, n_utts), 1.0, 16.7)
        scfg = student_cfg
        t_pack = 512

        def make_batches():
            """(bucketed batch, packed batch, real audio seconds) per chunk.

            The bucketed baseline reproduces the REAL dataloader contract
            (data/dataset.py _bucket_edges): 4 LINEAR duration buckets over
            [0, 16.7] s, every batch padded to its bucket's static EDGE (one
            compiled shape per bucket) with audio-matched per-bucket batch
            sizes. The packed path featurizes the same per-utterance batches
            but runs the encoder stacks on dense t_pack rows."""
            edges = np.linspace(16.7 / 4, 16.7, 4)
            bucket_of = np.searchsorted(edges, durs, side="left")
            out = []
            for b_i, edge in enumerate(edges):
                ids = np.where(bucket_of == b_i)[0]
                cap_s = int(np.ceil(edge * SR))
                bsz = max(8, int(round(B * SEC / edge / 8)) * 8)
                n_full = len(ids) // bsz
                plans = []
                for ci in range(n_full):
                    c = ids[ci * bsz:(ci + 1) * bsz]
                    lens = np.minimum((durs[c] * SR).astype(np.int64), cap_s)
                    pk, plan = train_pack_arrays(
                        lens, scfg.preprocessor.n_fft,
                        scfg.preprocessor.hop_length,
                        scfg.encoder.subsampling_factor,
                        scfg.encoder.subsampling,
                        scfg.encoder.conv_kernel_size, t_pack=t_pack)
                    plans.append((c, lens, plan))
                if not plans:
                    continue
                r_bucket = max(p.n_rows for _, _, p in plans)
                for c, lens, _ in plans:
                    pk, _ = train_pack_arrays(
                        lens, scfg.preprocessor.n_fft,
                        scfg.preprocessor.hop_length,
                        scfg.encoder.subsampling_factor,
                        scfg.encoder.subsampling,
                        scfg.encoder.conv_kernel_size, t_pack=t_pack,
                        pad_rows_to=r_bucket)
                    sig = (rng_pk.normal(size=(bsz, cap_s))
                           .astype(np.float32) * 0.1)
                    for r_i, ln in enumerate(lens):
                        sig[r_i, ln:] = 0.0
                    bt = {
                        "signal": jnp.asarray(sig),
                        "signal_len": jnp.asarray(lens.astype(np.int32)),
                        "tokens": jnp.asarray(
                            rng_pk.integers(0, 128, size=(bsz, TOKENS)),
                            jnp.int32),
                        "token_len": jnp.full((bsz,), TOKENS, jnp.int32),
                    }
                    bt_p = dict(bt)
                    bt_p.update({k2: jnp.asarray(v2)
                                 for k2, v2 in pk.items()})
                    out.append((bt, bt_p, float(durs[c].sum())))
            return out

        batches_pk = make_batches()
        vars_pk = pk_model.init(
            {"params": key, "specaug": key, "dropout": key, "gumbel": key,
             "noise": key, "layerdrop": key},
            batches_pk[0][0]["signal"], batches_pk[0][0]["signal_len"],
            batches_pk[0][0]["tokens"], batches_pk[0][0]["token_len"],
            train=True)
        tx_pk = build_optimizer(OptimConfig(), vars_pk["params"])
        st0 = DistilTrainState.create(
            apply_fn=pk_model.apply, params=vars_pk["params"],
            batch_stats=vars_pk.get("batch_stats", {}), tx=tx_pk)
        step_u = jax.jit(make_distil_train_step(pk_model))
        step_p = jax.jit(make_distil_train_step(pk_model, packed=True))

        results = {}
        for tag, step_fn, col in (("bucketed", step_u, 0),
                                  ("packed", step_p, 1)):
            st = st0
            for bt in batches_pk:                      # compile all shapes
                st, mets = step_fn(st, bt[col], key)
            float(mets["loss/total"])
            st = st0
            t0 = time.perf_counter()
            for i, bt in enumerate(batches_pk):
                st, mets = step_fn(st, bt[col], jax.random.fold_in(key, i))
            float(mets["loss/total"])
            dt_all = time.perf_counter() - t0
            audio = sum(b[2] for b in batches_pk)
            results[tag] = audio / dt_all
        print(json.dumps({
            "config": "flowkd PACKED training, realistic durations "
                      f"({n_utts} utts lognormal~6s, t_pack {t_pack}; "
                      "exact loss semantics at drop=0)",
            "audio_sec_per_sec": round(results["packed"], 1),
            "audio_sec_per_sec_bucketed": round(results["bucketed"], 1),
            "vs_bucketed": round(results["packed"] / results["bucketed"],
                                 3)}))

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
