"""Tensor-parallel sharding tests on the 8-device CPU mesh: dp2 x tp4 KD
train step must execute with sharded params and match the replicated run's
loss (GSPMD inserts the collectives)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from tpu_asr.config import (DecoderConfig, DistillationConfig, EncoderConfig,
                            ModelConfig, OptimConfig, PreprocessorConfig,
                            make_student_config)
from tpu_asr.models.distil_model import DistilCTCModel
from tpu_asr.parallel.mesh import batch_sharding, make_mesh, replicated
from tpu_asr.parallel.sharding import apply_sharding, shard_tree
from tpu_asr.train.optim import build_optimizer
from tpu_asr.train.trainer import DistilTrainState, make_distil_train_step


def _cfgs():
    teacher = ModelConfig(
        preprocessor=PreprocessorConfig(features=24),
        spec_augment=None,
        encoder=EncoderConfig(feat_in=24, n_layers=2, d_model=32, n_heads=4,
                              conv_kernel_size=7, conv_norm_type="layer_norm",
                              dropout=0.0, dropout_pre_encoder=0.0,
                              dropout_att=0.0, attention_backend="xla"),
        decoder=DecoderConfig(feat_in=32, num_classes=12),
        compute_dtype="float32",
    )
    return teacher, make_student_config(teacher)


def test_tp_rules_shard_expected_leaves():
    teacher_cfg, student_cfg = _cfgs()
    model = DistilCTCModel(student_cfg, teacher_cfg,
                           DistillationConfig(use_logit_distillation=True))
    sig = jnp.zeros((2, 8000), jnp.float32)
    ln = jnp.full((2,), 8000, jnp.int32)
    tk = jnp.zeros((2, 4), jnp.int32)
    tl = jnp.full((2,), 4, jnp.int32)
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "specaug": key, "dropout": key},
                           sig, ln, tk, tl, train=True)
    mesh = make_mesh(dp_size=2, tp_size=4)
    sh = shard_tree(variables["params"], mesh)
    stu = sh["student"]["encoder"]["layers"]
    # FF1 column-parallel: (L, d, 4d) -> (None, None, 'model')
    assert stu["feed_forward1"]["linear1"]["kernel"].spec == \
        P(None, None, "model")
    assert stu["feed_forward1"]["linear2"]["kernel"].spec == \
        P(None, "model", None)
    # teacher heads (4) shard at tp=4; student heads (2) correctly bail out
    tch = sh["teacher"]["encoder"]["layers"]
    assert tch["self_attn"]["pos_bias_u"].spec == P(None, "model", None)
    assert "model" not in tuple(stu["self_attn"]["pos_bias_u"].spec)
    # LN stays replicated
    assert stu["norm_out"]["scale"].spec == P()
    # decoder vocab dim (12+1=13) is NOT divisible by tp=4 -> replicated
    dec_spec = sh["student"]["decoder"]["decoder_layers_0"]["kernel"].spec
    assert "model" not in tuple(dec_spec)
    # a divisible vocab IS sharded
    from tpu_asr.parallel.sharding import _spec_for
    assert _spec_for(("decoder_layers_0", "kernel"), (32, 128), 4) == \
        P(None, "model")


def test_dp_tp_train_step_matches_replicated():
    teacher_cfg, student_cfg = _cfgs()
    distill = DistillationConfig(use_logit_distillation=True)
    model = DistilCTCModel(student_cfg, teacher_cfg, distill)
    rng = np.random.default_rng(0)
    batch = {
        "signal": jnp.asarray(rng.normal(size=(4, 8000)).astype(np.float32) * 0.1),
        "signal_len": jnp.full((4,), 8000, jnp.int32),
        "tokens": jnp.asarray(rng.integers(0, 12, size=(4, 6)), jnp.int32),
        "token_len": jnp.full((4,), 6, jnp.int32),
    }
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "specaug": key, "dropout": key},
                           batch["signal"], batch["signal_len"],
                           batch["tokens"], batch["token_len"], train=True)
    tx = build_optimizer(OptimConfig(lr=1e-3, sched_name="none", d_model=16),
                         variables["params"])

    def fresh_state():
        return DistilTrainState.create(
            apply_fn=model.apply, params=variables["params"],
            batch_stats=variables.get("batch_stats", {}), tx=tx)

    step = jax.jit(make_distil_train_step(model))

    # replicated single-mesh baseline
    s0, m0 = step(fresh_state(), batch, key)
    s0, m0b = step(s0, batch, key)

    # dp2 x tp4: params/opt-state sharded by TP rules, batch over 'data'
    mesh = make_mesh(dp_size=2, tp_size=4)
    state = fresh_state()
    state = state.replace(
        params=apply_sharding(state.params, mesh),
        opt_state=apply_sharding(state.opt_state, mesh),
        batch_stats=apply_sharding(state.batch_stats, mesh),
        step=jax.device_put(state.step, replicated(mesh)))
    sharded_batch = {k: jax.device_put(v, batch_sharding(mesh))
                     for k, v in batch.items()}
    s1, m1 = step(state, sharded_batch, jax.device_put(key, replicated(mesh)))
    s1, m1b = step(s1, sharded_batch, jax.device_put(key, replicated(mesh)))

    np.testing.assert_allclose(float(m1["loss/total"]),
                               float(m0["loss/total"]), rtol=1e-4)
    np.testing.assert_allclose(float(m1b["loss/total"]),
                               float(m0b["loss/total"]), rtol=1e-4)
    # a TP-sharded leaf really is distributed
    k = s1.params["student"]["encoder"]["layers"]["feed_forward1"]["linear1"]["kernel"]
    assert len(k.sharding.device_set) == 8 or \
        k.sharding.spec == P(None, None, "model")


def test_checkpoint_reshards_on_restore(tmp_path):
    """Restore a replicated-saved checkpoint into a TP-sharded state (and a
    TP-sharded-saved checkpoint into a replicated state): orbax restores to
    the template's shardings, so checkpoints move freely across mesh layouts
    (the reference's torch.load + DDP re-wrap path, asr_train.py resume)."""
    from tpu_asr.utils.checkpoint import (restore_train_state,
                                          save_train_state)

    teacher_cfg, student_cfg = _cfgs()
    model = DistilCTCModel(student_cfg, teacher_cfg,
                           DistillationConfig(use_logit_distillation=True))
    sig = jnp.zeros((2, 8000), jnp.float32)
    ln = jnp.full((2,), 8000, jnp.int32)
    tk = jnp.zeros((2, 4), jnp.int32)
    tl = jnp.full((2,), 4, jnp.int32)
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "specaug": key, "dropout": key},
                           sig, ln, tk, tl, train=True)
    tx = build_optimizer(OptimConfig(lr=1e-3, sched_name="none", d_model=16),
                         variables["params"])
    state = DistilTrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats", {}), tx=tx)
    state = state.replace(step=jnp.asarray(7))

    save_train_state(tmp_path, state, name="repl")

    # restore into a tp-sharded template: values equal, template shardings kept
    mesh = make_mesh(dp_size=2, tp_size=4)
    blank = jax.tree.map(jnp.zeros_like, state)
    sharded_tmpl = blank.replace(
        params=apply_sharding(blank.params, mesh),
        opt_state=apply_sharding(blank.opt_state, mesh),
        batch_stats=apply_sharding(blank.batch_stats, mesh))
    restored = restore_train_state(tmp_path, sharded_tmpl, name="repl")
    assert int(restored.step) == 7
    k = restored.params["student"]["encoder"]["layers"]["feed_forward1"]["linear1"]["kernel"]
    want = state.params["student"]["encoder"]["layers"]["feed_forward1"]["linear1"]["kernel"]
    assert k.sharding.spec == P(None, None, "model")
    np.testing.assert_array_equal(np.asarray(k), np.asarray(want))

    # round-trip the sharded state back into a replicated template
    save_train_state(tmp_path, restored, name="tp")
    back = restore_train_state(tmp_path, jax.tree.map(jnp.zeros_like, state),
                               name="tp")
    chex_equal = jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state.params, back.params)
    del chex_equal
