"""Component-level timing for the KD train step on the attached accelerator.

Times each piece of the flagship workload (B=32 x 15 s, conformer-ctc-small
teacher -> half-width student) separately so perf work targets the real
bottleneck. Run serially — on a 1-CPU host a concurrent pytest run starves
the device driver thread.

Usage: python scripts/profile_train_step.py
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

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tpu_asr.config import (DistillationConfig, FlowMatchingConfig,
                                ModelConfig, OptimConfig, make_student_config)
    from tpu_asr.models.ctc_model import CTCModel
    from tpu_asr.models.distil_model import DistilCTCModel
    from tpu_asr.ops.ctc import ctc_loss
    from tpu_asr.train.optim import build_optimizer
    from tpu_asr.train.trainer import DistilTrainState, make_distil_train_step

    b, sec, sr, tokens = 32, 15, 16000, 48
    teacher_cfg = ModelConfig()
    student_cfg = make_student_config(teacher_cfg)
    rng = np.random.default_rng(0)
    signal = jnp.asarray(rng.normal(size=(b, sec * sr)).astype(np.float32) * 0.1)
    slen = jnp.full((b,), sec * sr, jnp.int32)
    toks = jnp.asarray(rng.integers(0, 128, size=(b, tokens)), jnp.int32)
    tlen = jnp.full((b,), tokens, jnp.int32)
    key = jax.random.key(0, impl="rbg")

    def timeit(f, *a, n=20):
        jax.block_until_ready(f(*a))
        jax.block_until_ready(f(*a))
        t0 = time.perf_counter()
        for _ in range(n):
            r = f(*a)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / n * 1e3

    stu = CTCModel(student_cfg)
    sv = stu.init({"params": jax.random.PRNGKey(0), "specaug": key,
                   "dropout": key}, signal, slen, train=True)
    f_stu = jax.jit(lambda s, l, k: stu.apply(
        sv, s, l, train=True, rngs={"specaug": k, "dropout": k},
        mutable=["batch_stats"])[0].log_probs)
    print(f"student fwd(train):      {timeit(f_stu, signal, slen, key):7.2f} ms")

    def loss_fn(p, s, l, k):
        out, _ = stu.apply({**sv, "params": p}, s, l, train=True,
                           rngs={"specaug": k, "dropout": k},
                           mutable=["batch_stats"])
        return jnp.sum(out.log_probs) * 1e-6

    f_g = jax.jit(jax.grad(loss_fn))
    print(f"student fwd+bwd:         {timeit(f_g, sv['params'], signal, slen, key):7.2f} ms")

    def loss_ctc(p, s, l, k):
        out, _ = stu.apply({**sv, "params": p}, s, l, train=True,
                           rngs={"specaug": k, "dropout": k},
                           mutable=["batch_stats"])
        return ctc_loss(out.log_probs, toks, out.encoded_len, tlen)

    f_gc = jax.jit(jax.grad(loss_ctc))
    print(f"student fwd+ctc+bwd:     {timeit(f_gc, sv['params'], signal, slen, key):7.2f} ms")

    tch = CTCModel(teacher_cfg)
    tv = tch.init({"params": jax.random.PRNGKey(0)}, signal, slen, train=False)
    f_tch = jax.jit(lambda s, l: tch.apply(tv, s, l, train=False).log_probs)
    print(f"teacher fwd(eval):       {timeit(f_tch, signal, slen):7.2f} ms")

    flow = FlowMatchingConfig(meta_encoder_type="mlp", student_dim=88,
                              teacher_dim=176, student_head_num=2,
                              training_sampling=8, inference_sampling=8)
    configs = {
        "ctc_student": DistillationConfig(),
        "logit_kd": DistillationConfig(use_logit_distillation=True,
                                       kd_alpha=0.1),
        "flowkd_mlp8": DistillationConfig(use_logit_distillation=True,
                                          kd_alpha=0.1, use_flow_matching=True,
                                          flow=flow),
    }
    batch = {"signal": signal, "signal_len": slen, "tokens": toks,
             "token_len": tlen}
    for name, distill in configs.items():
        model = DistilCTCModel(student_cfg, teacher_cfg, distill)
        variables = model.init(
            {"params": key, "specaug": key, "dropout": key, "gumbel": key,
             "noise": key, "layerdrop": key},
            signal, slen, toks, tlen, train=True)
        tx = build_optimizer(OptimConfig(), variables["params"])
        state = DistilTrainState.create(
            apply_fn=model.apply, params=variables["params"],
            batch_stats=variables.get("batch_stats", {}), tx=tx)
        step = jax.jit(make_distil_train_step(model))
        state, m = step(state, batch, key)
        float(m["loss/total"])
        t0 = time.perf_counter()
        n = 10
        for i in range(n):
            state, m = step(state, batch, jax.random.fold_in(key, i))
        float(m["loss/total"])
        print(f"train step {name:12s}: {(time.perf_counter() - t0) / n * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
