import time, dataclasses, numpy as np, jax, jax.numpy as jnp
from tpu_asr.config import DistillationConfig, ModelConfig, OptimConfig, make_student_config
from tpu_asr.models.distil_model import DistilCTCModel
from tpu_asr.train.optim import build_optimizer
from tpu_asr.train.trainer import DistilTrainState, make_distil_train_step

B, SEC = 32, 15
rng = np.random.default_rng(0)
batch = {"signal": jnp.asarray(rng.normal(size=(B, SEC*16000)).astype(np.float32)*0.1),
         "signal_len": jnp.full((B,), SEC*16000, jnp.int32),
         "tokens": jnp.asarray(rng.integers(0, 128, size=(B, 48)), jnp.int32),
         "token_len": jnp.full((B,), 48, jnp.int32)}
key = jax.random.PRNGKey(0)

def measure(name, teacher_cfg):
    student_cfg = make_student_config(teacher_cfg)
    model = DistilCTCModel(student_cfg, teacher_cfg, DistillationConfig())
    variables = model.init({"params": key, "specaug": key, "dropout": key, "layerdrop": key},
                           batch["signal"], batch["signal_len"], batch["tokens"],
                           batch["token_len"], train=True)
    tx = build_optimizer(OptimConfig(), variables["params"])
    state = DistilTrainState.create(apply_fn=model.apply, params=variables["params"],
                                    batch_stats=variables.get("batch_stats", {}), tx=tx)
    step = jax.jit(make_distil_train_step(model))
    state, m = step(state, batch, key); float(m["loss/total"])
    t0 = time.perf_counter()
    for i in range(5):
        state, m = step(state, batch, jax.random.fold_in(key, i))
    float(m["loss/total"])
    print(f"{name}: {(time.perf_counter()-t0)/5*1e3:.1f} ms/step", flush=True)

base = ModelConfig()
measure("baseline           ", base)
measure("remat              ", dataclasses.replace(base, encoder=dataclasses.replace(base.encoder, remat=True)))
measure("no specaug         ", dataclasses.replace(base, spec_augment=None))
