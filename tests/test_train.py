"""Training-infrastructure tests: NeMo scheduler parity, teacher freezing,
loss decrease on an overfit micro-batch, and the DP train step on the 8-device
virtual mesh (SURVEY.md §4: multi-device coverage the reference never had).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_asr.config import (DecoderConfig, DistillationConfig, EncoderConfig,
                            FlowMatchingConfig, ModelConfig, OptimConfig,
                            PreprocessorConfig, make_student_config)
from tpu_asr.models.distil_model import DistilCTCModel
from tpu_asr.parallel.mesh import batch_sharding, make_mesh, replicated
from tpu_asr.train.optim import (build_optimizer, cosine_annealing_schedule,
                                 noam_annealing_schedule)
from tpu_asr.train.trainer import DistilTrainState, make_distil_train_step


def test_noam_annealing_matches_nemo_formula():
    """NeMo NoamAnnealing (lr_scheduler.py:473-530): lr * d^-0.5 *
    min(step^-0.5, step*warmup^-1.5), min_lr floor only past warmup."""
    lr, d_model, warmup, min_lr = 2.0, 176, 100, 1e-3
    sched = noam_annealing_schedule(lr, d_model, warmup, min_lr)
    for count in [0, 1, 50, 99, 100, 1000, 100000]:
        step = count + 1
        ref = lr * d_model ** -0.5 * min(step ** -0.5, step * warmup ** -1.5)
        if step > warmup:
            ref = max(ref, min_lr)
        np.testing.assert_allclose(float(sched(jnp.asarray(count))), ref,
                                   rtol=1e-6)
    # late steps hit the floor
    assert float(sched(jnp.asarray(10 ** 9))) == pytest.approx(min_lr)


def test_cosine_annealing_endpoints():
    sched = cosine_annealing_schedule(1.0, warmup_steps=10, max_steps=110,
                                      min_lr=0.01)
    assert float(sched(jnp.asarray(0))) == pytest.approx(0.1)     # warmup ramp
    assert float(sched(jnp.asarray(9))) == pytest.approx(1.0)     # peak
    assert float(sched(jnp.asarray(10 ** 6))) == pytest.approx(0.01)


def _tiny_cfg():
    teacher = ModelConfig(
        preprocessor=PreprocessorConfig(features=24),
        spec_augment=None,
        encoder=EncoderConfig(feat_in=24, n_layers=2, d_model=32, n_heads=4,
                              conv_kernel_size=7, conv_norm_type="layer_norm",
                              dropout=0.0, dropout_pre_encoder=0.0,
                              dropout_att=0.0),
        decoder=DecoderConfig(feat_in=32, num_classes=12),
        compute_dtype="float32",
    )
    return teacher, make_student_config(teacher)


def _setup(distill=None, batch=2, samples=8000):
    teacher_cfg, student_cfg = _tiny_cfg()
    d = distill or DistillationConfig(use_logit_distillation=True)
    model = DistilCTCModel(student_cfg, teacher_cfg, d)
    rng = np.random.default_rng(0)
    batch_d = {
        "signal": jnp.asarray(rng.normal(size=(batch, samples)).astype(np.float32) * 0.1),
        "signal_len": jnp.full((batch,), samples, jnp.int32),
        "tokens": jnp.asarray(rng.integers(0, 12, size=(batch, 6)), jnp.int32),
        "token_len": jnp.full((batch,), 6, jnp.int32),
    }
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "specaug": key, "dropout": key, "gumbel": key,
         "noise": key},
        batch_d["signal"], batch_d["signal_len"], batch_d["tokens"],
        batch_d["token_len"], train=True)
    return model, variables, batch_d


def test_train_step_decreases_loss_and_freezes_teacher():
    model, variables, batch = _setup()
    opt_cfg = OptimConfig(lr=1e-3, sched_name="none", gradient_clip_val=1.0,
                          d_model=16)
    tx = build_optimizer(opt_cfg, variables["params"])
    state = DistilTrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats", {}), tx=tx)
    step = jax.jit(make_distil_train_step(model))
    rng = jax.random.PRNGKey(42)

    teacher_before = jax.tree.map(lambda x: np.asarray(x),
                                  state.params["teacher"])
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss/total"]))
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    # teacher params bit-identical after 8 AdamW steps
    teacher_after = state.params["teacher"]
    for a, b in zip(jax.tree.leaves(teacher_before),
                    jax.tree.leaves(teacher_after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(state.step) == 8


def test_train_step_with_int8_teacher():
    """--teacher_int8: the FROZEN teacher forward runs the int8 serving path
    inside the KD train step (value_and_grad). Gradients stop at the teacher
    PARAMS (trainer.loss_fn), so the eval-only int8 kernels never need a
    VJP; student grads must stay close to the fp-teacher step's (the int8
    error only perturbs the KD targets)."""
    import dataclasses

    teacher_cfg, student_cfg = _tiny_cfg()
    teacher_q = dataclasses.replace(
        teacher_cfg, encoder=dataclasses.replace(teacher_cfg.encoder,
                                                 quantization="int8"))
    d = DistillationConfig(use_logit_distillation=True, kd_alpha=0.5)
    rng = np.random.default_rng(1)
    batch = {
        "signal": jnp.asarray(
            rng.normal(size=(2, 8000)).astype(np.float32) * 0.1),
        "signal_len": jnp.full((2,), 8000, jnp.int32),
        "tokens": jnp.asarray(rng.integers(0, 12, size=(2, 6)), jnp.int32),
        "token_len": jnp.full((2,), 6, jnp.int32),
    }
    key = jax.random.PRNGKey(0)
    rngs = {"params": key, "specaug": key, "dropout": key, "gumbel": key,
            "noise": key}

    grads, losses = {}, {}
    for tag, tcfg in [("fp", teacher_cfg), ("int8", teacher_q)]:
        model = DistilCTCModel(student_cfg, tcfg, d)
        variables = model.init(rngs, batch["signal"], batch["signal_len"],
                               batch["tokens"], batch["token_len"],
                               train=True)
        tx = build_optimizer(OptimConfig(lr=1e-3, sched_name="none",
                                         d_model=16), variables["params"])
        state = DistilTrainState.create(
            apply_fn=model.apply, params=variables["params"],
            batch_stats=variables.get("batch_stats", {}), tx=tx)
        # the full train step (incl. the VJP-less int8 path inside
        # value_and_grad) must execute and leave the teacher frozen
        step = jax.jit(make_distil_train_step(model))
        new_state, metrics = step(state, batch, jax.random.PRNGKey(7))
        assert np.isfinite(float(metrics["loss/total"]))
        for a, b in zip(jax.tree.leaves(state.params["teacher"]),
                        jax.tree.leaves(new_state.params["teacher"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # raw student grads (optimizer-free — AdamW's first step saturates
        # every update to +-lr, which would hide the comparison)
        def loss_fn(params):
            out, _ = model.apply(
                {"params": params,
                 "batch_stats": variables.get("batch_stats", {})},
                batch["signal"], batch["signal_len"], batch["tokens"],
                batch["token_len"], train=True,
                rngs={k: jax.random.PRNGKey(7) for k in
                      ("specaug", "dropout", "gumbel", "noise")},
                mutable=["batch_stats"])
            return out.losses["total"]

        params = {**variables["params"],
                  "teacher": jax.lax.stop_gradient(
                      variables["params"]["teacher"])}
        loss, g = jax.jit(jax.value_and_grad(loss_fn))(params)
        losses[tag] = float(loss)
        grads[tag] = jax.tree.map(np.asarray, g["student"])

    # same init, same rng stream: the int8 teacher perturbs only the KD
    # target, so loss and student grads stay close to the fp run
    assert abs(losses["int8"] - losses["fp"]) / abs(losses["fp"]) < 0.05
    # per-leaf deltas against the GLOBAL gradient scale (per-leaf ratios are
    # meaningless on near-zero-grad leaves, where fp noise dominates)
    scale = max(np.abs(g).max() for g in jax.tree.leaves(grads["fp"]))
    for g_fp, g_q in zip(jax.tree.leaves(grads["fp"]),
                         jax.tree.leaves(grads["int8"])):
        assert np.abs(g_q - g_fp).max() / scale < 0.35


def test_dp_train_step_on_virtual_mesh():
    """Full KD train step jitted over an 8-device data mesh — replicated state,
    batch sharded on `data`; result must match the semantics (finite loss,
    teacher frozen) and actually execute with sharded inputs."""
    flow = FlowMatchingConfig(meta_encoder_type="mlp", student_dim=16,
                              teacher_dim=32, time_embed_dim=8, hidden_dim=16,
                              training_sampling=2, inference_sampling=2)
    d = DistillationConfig(use_logit_distillation=True, use_flow_matching=True,
                           flow=flow)
    model, variables, _ = _setup(distill=d, batch=8, samples=8000)
    rng_np = np.random.default_rng(1)
    batch = {
        "signal": jnp.asarray(rng_np.normal(size=(8, 8000)).astype(np.float32) * 0.1),
        "signal_len": jnp.full((8,), 8000, jnp.int32),
        "tokens": jnp.asarray(rng_np.integers(0, 12, size=(8, 6)), jnp.int32),
        "token_len": jnp.full((8,), 6, jnp.int32),
    }

    mesh = make_mesh(dp_size=8)
    repl = replicated(mesh)
    bsh = batch_sharding(mesh)

    opt_cfg = OptimConfig(lr=1e-3, sched_name="none", d_model=16)
    tx = build_optimizer(opt_cfg, variables["params"])
    state = DistilTrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats", {}), tx=tx)

    state = jax.device_put(state, repl)
    batch_sharded = jax.tree.map(lambda x: jax.device_put(x, bsh), batch)

    step = jax.jit(make_distil_train_step(model),
                   in_shardings=(repl, bsh, repl),
                   out_shardings=(repl, repl))
    rng = jax.device_put(jax.random.PRNGKey(0), repl)
    new_state, metrics = step(state, batch_sharded, rng)
    assert np.isfinite(float(metrics["loss/total"]))
    assert np.isfinite(float(metrics["loss/flow_matching"]))
    # params stayed replicated and finite
    leaf = jax.tree.leaves(new_state.params["student"])[0]
    assert np.all(np.isfinite(np.asarray(leaf)))
    # 2nd step to make sure the compiled program is reusable
    new_state, metrics2 = step(new_state, batch_sharded, rng)
    assert np.isfinite(float(metrics2["loss/total"]))


def test_multi_step_matches_sequential_steps():
    """make_distil_multi_step (K steps per dispatch via lax.scan) is
    semantically identical to K sequential train_step calls: same params,
    same step counter, same per-step metrics — the per-step RNG comes from
    folding base_rng with state.step, which the scan carry advances exactly
    like the host loop."""
    from tpu_asr.train.optim import build_optimizer
    from tpu_asr.train.trainer import make_distil_multi_step

    model, variables, batch = _setup()
    rng = np.random.default_rng(3)
    k = 3
    batches = {
        name: jnp.stack([v] * k) if name != "signal" else jnp.asarray(
            rng.normal(size=(k,) + v.shape).astype(np.float32) * 0.1)
        for name, v in batch.items()
    }
    key = jax.random.PRNGKey(7)

    def fresh_state():
        tx = build_optimizer(OptimConfig(), variables["params"])
        return DistilTrainState.create(
            apply_fn=model.apply, params=variables["params"],
            batch_stats=variables.get("batch_stats", {}), tx=tx)

    step_fn = jax.jit(make_distil_train_step(model))
    st_seq = fresh_state()
    seq_metrics = []
    for i in range(k):
        st_seq, m = step_fn(st_seq, {n: v[i] for n, v in batches.items()},
                            key)
        seq_metrics.append(float(m["loss/total"]))

    multi_fn = jax.jit(make_distil_multi_step(model))
    st_multi, m_k = multi_fn(fresh_state(), batches, key)

    assert int(st_multi.step) == int(st_seq.step) == k
    np.testing.assert_allclose(np.asarray(m_k["loss/total"]),
                               np.asarray(seq_metrics), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(st_multi.params),
                    jax.tree.leaves(st_seq.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_stack_batches_groups_by_shape_and_flushes_tail():
    from tpu_asr.data.dataset import stack_batches

    def mk(shape, val):
        return {"signal": np.full(shape, val, np.float32),
                "texts": [f"t{val}"]}

    batches = [mk((2, 10), 0), mk((2, 10), 1), mk((2, 16), 2),
               mk((2, 10), 3), mk((2, 16), 4), mk((2, 10), 5)]
    out = list(stack_batches(iter(batches), 2))
    stacked = [o for o in out if o.get("_steps")]
    single = [o for o in out if not o.get("_steps")]
    # (0,1) and (3,5)? no — (0,1) flush, then 3 waits, 5 joins -> (3,5);
    # (2,4) flush; nothing left over
    assert len(stacked) == 3 and len(single) == 0
    shapes = sorted(o["signal"].shape for o in stacked)
    assert shapes == [(2, 2, 10), (2, 2, 10), (2, 2, 16)]
    # texts of the LAST batch in each group survive
    assert {o["texts"][0] for o in stacked} == {"t1", "t4", "t5"}

    # odd counts: the leftover batch is yielded unstacked
    out = list(stack_batches(iter(batches[:3]), 2))
    assert sum(1 for o in out if o.get("_steps")) == 1
    tail = [o for o in out if not o.get("_steps")]
    assert len(tail) == 1 and tail[0]["signal"].shape == (2, 16)


def test_dp_multi_step_on_virtual_mesh():
    """Multi-step dispatch under data parallelism: the stacked (K, B, ...)
    batch shards its SECOND axis over `data` (prefetch_to_device contract);
    K optimizer steps run in one program on the sharded mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tpu_asr.train.trainer import make_distil_multi_step

    model, variables, batch = _setup(batch=8, samples=8000)
    k = 2
    rng_np = np.random.default_rng(2)
    batches = {
        "signal": jnp.asarray(
            rng_np.normal(size=(k, 8, 8000)).astype(np.float32) * 0.1),
        "signal_len": jnp.broadcast_to(batch["signal_len"][None], (k, 8)),
        "tokens": jnp.broadcast_to(batch["tokens"][None], (k, 8, 6)),
        "token_len": jnp.broadcast_to(batch["token_len"][None], (k, 8)),
    }

    mesh = make_mesh(dp_size=8)
    repl = replicated(mesh)
    ssh = NamedSharding(mesh, P(None, "data"))

    tx = build_optimizer(OptimConfig(lr=1e-3, sched_name="none", d_model=16),
                         variables["params"])
    state = DistilTrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats", {}), tx=tx)
    state = jax.device_put(state, repl)
    batches = {n: jax.device_put(v, ssh) for n, v in batches.items()}

    multi = jax.jit(make_distil_multi_step(model))
    new_state, metrics = multi(state, batches,
                               jax.device_put(jax.random.PRNGKey(0), repl))
    assert int(new_state.step) == k
    assert np.all(np.isfinite(np.asarray(metrics["loss/total"])))
