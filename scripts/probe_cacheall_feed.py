"""Does cache_teacher_all pay THROUGH THE TUNNEL in the real fit loop?
Times epoch 0 (harvest, teacher in-graph) vs epochs 1-2 (cached step fed
the (B, L, T', Dt) fp16 stack from host) on the real chip."""
import sys, time, numpy as np
sys.path.insert(0, '/root/repo')
from pathlib import Path
import jax
from tpu_asr.config import (DataConfig, DistillationConfig,
                            FlowMatchingConfig, ModelConfig, OptimConfig,
                            TrainConfig, make_student_config)
from tpu_asr.data.tokenizer import train_bpe
from tpu_asr.models.distil_model import DistilCTCModel
from tpu_asr.train.loop import Trainer

teacher_cfg = ModelConfig()
student_cfg = make_student_config(teacher_cfg)
flow = FlowMatchingConfig(meta_encoder_type="mlp", student_dim=88,
                          teacher_dim=176, student_head_num=2,
                          training_sampling=8, inference_sampling=8)
distill = DistillationConfig(use_logit_distillation=True, kd_alpha=0.1,
                             use_flow_matching=True, flow=flow)
tok = train_bpe(["the quick brown fox jumps over a lazy dog"] * 4, 128)

for tag, cache in (("cache_all", True), ("no_cache", False)):
    model = DistilCTCModel(student_cfg, teacher_cfg, distill)
    cfg = TrainConfig(model=student_cfg, distillation=distill,
                      optim=OptimConfig(),
                      train_ds=DataConfig(batch_size=32, shuffle=False,
                                          num_buckets=1, max_duration=15.2),
                      max_epochs=3, cache_teacher_all=cache, dp_size=1)
    tr = Trainer(model, cfg, tok, Path(f"/tmp/r5_feed/{tag}"), log_every=999)

    # intercept the per-epoch boundary by timing inside fit via a wrapper
    times = {"harvest": [], "cached": [], "plain": []}
    orig_h = getattr(tr, "_train_step_harvest", None)
    orig_c = getattr(tr, "_train_step_cached", None)
    orig_p = tr._train_step
    def wrap(fn, bucket):
        def inner(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            jax.tree.map(lambda x: x, out)
            # force completion via a host transfer of the loss
            float(out[1]["loss/total"])
            times[bucket].append(time.perf_counter() - t0)
            return out
        return inner
    if orig_h is not None:
        tr._train_step_harvest = wrap(orig_h, "harvest")
    if orig_c is not None:
        tr._train_step_cached = wrap(orig_c, "cached")
    tr._train_step = wrap(orig_p, "plain")
    tr.fit("/tmp/r5_feed/train.jsonl", rng_seed=0)
    for k, v in times.items():
        if v:
            steady = v[2:] if len(v) > 4 else v
            print(f"{tag} {k}: n={len(v)} mean_steady={np.mean(steady)*1e3:.1f} ms"
                  f" (all: {[round(x*1e3,1) for x in v]})", flush=True)
