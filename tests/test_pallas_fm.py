"""Fused FM Euler-loop kernel (ops/pallas_fm.py) parity vs the masked
nn.scan backend of kd/flow_matching.py — forward, gradients, per-row step
counts, stacked-layer loss semantics, and the distil-model integration.

The two backends must be checkpoint- AND trajectory-interchangeable: the
param trees are identical (pinned here) and fp32 numerics match to float
rounding (the kernel is run in interpret mode on CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_asr.config import FlowMatchingConfig
from tpu_asr.kd.flow_matching import FlowMatchingModule, resolve_euler_backend

CFG = FlowMatchingConfig(
    meta_encoder_type="mlp", student_dim=24, teacher_dim=40,
    time_embed_dim=8, hidden_dim=32, training_sampling=3,
    euler_backend="xla")
CFG_P = dataclasses.replace(CFG, euler_backend="pallas")


def _data(b=6, t=17, key=0):
    s_f = jax.random.normal(jax.random.PRNGKey(key), (b, t, CFG.student_dim))
    t_f = jax.random.normal(jax.random.PRNGKey(key + 1),
                            (b, t, CFG.teacher_dim))
    return s_f, t_f


def test_resolve_euler_backend_guards():
    assert resolve_euler_backend(CFG) == "xla"
    assert resolve_euler_backend(CFG_P) == "pallas"
    # auto on CPU -> xla
    assert resolve_euler_backend(
        dataclasses.replace(CFG, euler_backend="auto")) == "xla"
    with pytest.raises(ValueError, match="mlp"):
        resolve_euler_backend(dataclasses.replace(
            CFG_P, meta_encoder_type="cnn"))


def test_param_trees_identical_across_backends():
    s_f, t_f = _data()
    rng = jax.random.PRNGKey(0)
    vx = FlowMatchingModule(CFG).init(rng, s_f, t_f, steps=3, train=True)
    vp = FlowMatchingModule(CFG_P).init(rng, s_f, t_f, steps=3, train=True)
    assert (jax.tree_util.tree_structure(vx)
            == jax.tree_util.tree_structure(vp))
    assert jax.tree_util.tree_all(
        jax.tree.map(lambda a, b: bool(jnp.allclose(a, b)), vx, vp))


def test_fwd_parity_per_row_steps():
    s_f, t_f = _data()
    steps = jnp.array([1, 2, 3, 4, 2, 1], jnp.int32)
    mx, mp = FlowMatchingModule(CFG), FlowMatchingModule(CFG_P)
    v = mx.init(jax.random.PRNGKey(0), s_f, t_f, steps=steps, max_steps=4,
                train=True)
    lx, xx = mx.apply(v, s_f, t_f, steps=steps, max_steps=4, train=True)
    lp, xp = mp.apply(v, s_f, t_f, steps=steps, max_steps=4, train=True)
    np.testing.assert_allclose(float(lx), float(lp), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(xx), np.asarray(xp),
                               rtol=1e-5, atol=1e-5)


def test_fwd_parity_eval_static_steps():
    s_f, _ = _data(b=3, t=9)
    mx, mp = FlowMatchingModule(CFG), FlowMatchingModule(CFG_P)
    v = mx.init(jax.random.PRNGKey(0), s_f, steps=3, train=False)
    _, xx = mx.apply(v, s_f, steps=3, train=False)
    _, xp = mp.apply(v, s_f, steps=3, train=False)
    np.testing.assert_allclose(np.asarray(xx), np.asarray(xp),
                               rtol=1e-5, atol=1e-5)


def test_grad_parity():
    s_f, t_f = _data()
    steps = jnp.array([2, 3, 1, 4, 4, 2], jnp.int32)
    mx, mp = FlowMatchingModule(CFG), FlowMatchingModule(CFG_P)
    v = mx.init(jax.random.PRNGKey(0), s_f, t_f, steps=steps, max_steps=4,
                train=True)

    def loss_fn(params, sf, mod):
        l, x = mod.apply(params, sf, t_f, steps=steps, max_steps=4,
                         train=True)
        # exercise BOTH output cotangents: the FM loss (last velocity) and
        # the propagated x (the decoder-input path for the last layer)
        return l + jnp.mean(x * x)

    gx, gsx = jax.grad(loss_fn, argnums=(0, 1))(v, s_f, mx)
    gp, gsp = jax.grad(loss_fn, argnums=(0, 1))(v, s_f, mp)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        gx, gp)
    np.testing.assert_allclose(np.asarray(gsx), np.asarray(gsp),
                               rtol=1e-4, atol=1e-5)


def test_group_loss_stacked_layers_matches_per_layer_calls():
    """loss_layers=L on B-major stacked rows == sum over L of per-layer
    module calls (the vmap path's aggregation), for BOTH group and plain
    losses — pinned on the XLA backend (pure semantics, no kernel)."""
    L, B, T = 3, 4, 7
    key = jax.random.PRNGKey(3)
    s = jax.random.normal(key, (L, B, T, CFG.student_dim))
    tch = jax.random.normal(jax.random.PRNGKey(4), (L, B, T, CFG.teacher_dim))
    steps_lb = jnp.array([[1, 2, 2, 4], [4, 1, 1, 2], [2, 2, 4, 4]],
                         jnp.int32)
    mod = FlowMatchingModule(CFG)
    v = mod.init(jax.random.PRNGKey(0), s[0], tch[0], steps=steps_lb[0],
                 max_steps=4, train=True)
    for group in (False, True):
        per_layer = [mod.apply(v, s[l], tch[l], steps=steps_lb[l],
                               max_steps=4, train=True, group_loss=group)
                     for l in range(L)]
        want_loss = sum(float(pl_[0]) for pl_ in per_layer)
        stack = lambda z: z.transpose(1, 0, 2, 3).reshape(
            (B * L,) + z.shape[2:])
        got_loss, got_x = mod.apply(
            v, stack(s), stack(tch), steps=steps_lb.T.reshape(-1),
            max_steps=4, train=True, group_loss=group, loss_layers=L)
        np.testing.assert_allclose(float(got_loss), want_loss, rtol=1e-5)
        want_x_last = per_layer[-1][1]
        got_x_last = got_x.reshape(B, L, T, -1)[:, L - 1]
        np.testing.assert_allclose(np.asarray(got_x_last),
                                   np.asarray(want_x_last), rtol=1e-6,
                                   atol=1e-6)


def test_bf16_compute_dtype():
    s_f, t_f = _data(b=4, t=11)
    cfg_x = dataclasses.replace(CFG)
    mx = FlowMatchingModule(cfg_x, dtype=jnp.bfloat16)
    mp = FlowMatchingModule(CFG_P, dtype=jnp.bfloat16)
    v = mx.init(jax.random.PRNGKey(0), s_f, t_f, steps=2, train=True)
    lx, xx = mx.apply(v, s_f, t_f, steps=2, train=True)
    lp, xp = mp.apply(v, s_f, t_f, steps=2, train=True)
    assert xp.dtype == jnp.bfloat16
    np.testing.assert_allclose(float(lx), float(lp), rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(xx, np.float32),
                               np.asarray(xp, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_distil_flowkd_step_backend_parity():
    """The full flowkd training objective (student + teacher + CTC + logit
    KD + FM with router 'group') agrees between euler backends; checkpoints
    are interchangeable because the param tree is shared."""
    from tpu_asr.config import (DistillationConfig, RouterConfig,
                                make_student_config)
    from tpu_asr.models.distil_model import DistilCTCModel
    from tests.test_kd import _distil_batch, _tiny_model_cfg

    teacher_cfg = _tiny_model_cfg()
    student_cfg = make_student_config(teacher_cfg)
    mk_flow = lambda be: FlowMatchingConfig(
        meta_encoder_type="mlp", student_dim=16, teacher_dim=32,
        student_head_num=2, teacher_head_num=4, time_embed_dim=8,
        hidden_dim=16, training_sampling=2, inference_sampling=2,
        use_dynamic_steps=True, router_strategy="group",
        router_max_sampling_steps=4, euler_backend=be)
    router = RouterConfig(max_steps=4, stu_dim=16, tch_dim=32, num_layers=2,
                          budget_target=2.0)
    rng = np.random.default_rng(0)
    sig, sig_len, tokens, tok_len = _distil_batch(rng)
    outs = {}
    for be in ("xla", "pallas"):
        distill = DistillationConfig(
            use_logit_distillation=True, use_flow_matching=True,
            flow=mk_flow(be), router=router)
        model = DistilCTCModel(student_cfg, teacher_cfg, distill)
        key = jax.random.PRNGKey(0)
        rngs = {"params": key, "specaug": key, "dropout": key,
                "gumbel": key, "noise": key}
        variables = model.init(rngs, sig, sig_len, tokens, tok_len,
                               train=True)
        o, _ = model.apply(
            variables, sig, sig_len, tokens, tok_len, train=True,
            rngs={"specaug": jax.random.PRNGKey(1),
                  "dropout": jax.random.PRNGKey(2),
                  "gumbel": jax.random.PRNGKey(3),
                  "noise": jax.random.PRNGKey(4)},
            mutable=["batch_stats"])
        outs[be] = o.losses
    lx, lp = outs["xla"], outs["pallas"]
    for k in lx:
        np.testing.assert_allclose(
            float(lx[k]), float(lp[k]), rtol=5e-4, atol=1e-5,
            err_msg=f"loss component {k}")
