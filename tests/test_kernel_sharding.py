"""Pallas kernels under GSPMD batch sharding (interpret mode, 8-device CPU
mesh): outputs and gradients must equal the replicated run bitwise-ish, and
the partition rules must keep the batch axis sharded instead of gathering.

Without the custom_partitioning wrappers (parallel/kernel_sharding.py), XLA
would all-gather every operand of the opaque pallas custom call onto every
device — correct but unscaled; these tests pin the scaled path."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from tpu_asr.ops.ctc import ctc_forward_logprob
from tpu_asr.ops.pallas_attention import fused_relpos_attention
from tpu_asr.ops.pallas_ctc import ctc_nll_pallas


def _mesh():
    return Mesh(np.asarray(jax.devices()[:8]), ("data",))


def test_attention_batch_sharded_matches_replicated():
    b, h, t, dk = 8, 2, 64, 32
    d = h * dk
    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.5)
    q_u, q_v, k, v = (mk(b, h, t, dk) for _ in range(4))
    w = mk(d, h, dk)
    lengths = np.asarray([t, t - 3, t - 9, 5, t, t - 1, 17, t - 30])
    mask = jnp.arange(t)[None, :] < jnp.asarray(lengths)[:, None]
    cot = mk(b, h, t, dk)
    valid = mask[:, None, :, None]

    def loss(q_u, q_v, k, v, w, mask):
        out = fused_relpos_attention(q_u, q_v, k, v, w, mask,
                                     dropout_rate=0.2,
                                     dropout_seed=jnp.asarray([3], jnp.int32),
                                     interpret=True)
        return jnp.sum(jnp.where(valid, out, 0.0) * cot), out

    grad_fn = jax.value_and_grad(loss, argnums=(0, 2, 4), has_aux=True)
    (l_ref, out_ref), g_ref = jax.jit(grad_fn)(q_u, q_v, k, v, w, mask)

    mesh = _mesh()
    bsh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    args = (jax.device_put(q_u, bsh), jax.device_put(q_v, bsh),
            jax.device_put(k, bsh), jax.device_put(v, bsh),
            jax.device_put(w, repl), jax.device_put(mask, bsh))
    with jax.set_mesh(mesh):
        (l_sh, out_sh), g_sh = jax.jit(grad_fn)(*args)

    np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_sh), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-6)
    for a, b_ in zip(g_sh, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6)
    # the context output really is batch-sharded, not gathered
    assert out_sh.sharding.spec[0] == "data"


def test_attention_dp_x_tp_head_sharded_matches_replicated():
    """Both axes sharded at once (VERDICT r2 next #6): batch over 'data' AND
    heads over 'model'. The per-(row, head) seed operand carries global PRNG
    stream ids, so in-kernel dropout is bit-identical to the replicated run
    even with heads split across shards."""
    b, h, t, dk = 4, 4, 64, 32
    d = h * dk
    rng = np.random.default_rng(2)
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.5)
    q_u, q_v, k, v = (mk(b, h, t, dk) for _ in range(4))
    w = mk(d, h, dk)
    lengths = np.asarray([t, t - 5, 11, t - 1])
    mask = jnp.arange(t)[None, :] < jnp.asarray(lengths)[:, None]
    cot = mk(b, h, t, dk)
    valid = mask[:, None, :, None]

    def loss(q_u, q_v, k, v, w, mask):
        out = fused_relpos_attention(q_u, q_v, k, v, w, mask,
                                     dropout_rate=0.15,
                                     dropout_seed=jnp.asarray([7], jnp.int32),
                                     interpret=True)
        return jnp.sum(jnp.where(valid, out, 0.0) * cot), out

    grad_fn = jax.value_and_grad(loss, argnums=(0, 2, 4), has_aux=True)
    (l_ref, out_ref), g_ref = jax.jit(grad_fn)(q_u, q_v, k, v, w, mask)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                ("data", "model"))
    bh = NamedSharding(mesh, P("data", "model"))
    bsh = NamedSharding(mesh, P("data"))
    wsh = NamedSharding(mesh, P(None, "model"))     # (D, H, dk): heads split
    args = (jax.device_put(q_u, bh), jax.device_put(q_v, bh),
            jax.device_put(k, bh), jax.device_put(v, bh),
            jax.device_put(w, wsh), jax.device_put(mask, bsh))
    with jax.set_mesh(mesh):
        (l_sh, out_sh), g_sh = jax.jit(grad_fn)(*args)

    np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_sh), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-6)
    for a, b_ in zip(g_sh, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6)
    # context stays sharded on BOTH axes — no gather
    assert out_sh.sharding.spec[:2] == ("data", "model")


def test_ctc_batch_sharded_matches_replicated():
    b, t, v_sz, s = 8, 40, 12, 9
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((b, t, v_sz)).astype(np.float32)
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    tgt = jnp.asarray(rng.integers(0, v_sz - 1, size=(b, s)), jnp.int32)
    il = jnp.asarray(
        np.concatenate([[t], rng.integers(s * 2 + 2, t, size=b - 1)]),
        jnp.int32)
    tl = jnp.asarray(
        np.concatenate([[s], rng.integers(1, s, size=b - 1)]), jnp.int32)

    def loss(lp):
        return jnp.sum(ctc_nll_pallas(lp, tgt, il, tl, v_sz - 1, True))

    l_ref = float(jax.jit(loss)(lp))
    g_ref = np.asarray(jax.jit(jax.grad(loss))(lp))
    want = np.asarray(ctc_forward_logprob(lp, tgt, il, tl, blank=v_sz - 1))

    mesh = _mesh()
    bsh = NamedSharding(mesh, P("data"))

    def loss_sh(lp, tgt, il, tl):
        return jnp.sum(ctc_nll_pallas(lp, tgt, il, tl, v_sz - 1, True))

    args = (jax.device_put(lp, bsh), jax.device_put(tgt, bsh),
            jax.device_put(il, bsh), jax.device_put(tl, bsh))
    with jax.set_mesh(mesh):
        l_sh = float(jax.jit(loss_sh)(*args))
        g_sh = np.asarray(jax.jit(jax.grad(loss_sh))(*args))
        nll_sh = jax.jit(lambda *a: ctc_nll_pallas(*a, v_sz - 1, True))(*args)

    np.testing.assert_allclose(l_sh, l_ref, rtol=1e-5)
    np.testing.assert_allclose(g_sh, g_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(nll_sh), want, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# Block attention kernel (whole-sublayer fusion, ops/pallas_attention
# fused_relpos_attention_block): batch sharding, and dp x tp with the HEAD
# factor CONTRACTED into the (B, T, D) output — each shard computes its
# local heads' output-projection partial and the partition lowering inserts
# the psum (factor_partitioned reduce_factors), Megatron row-parallel style.
# ---------------------------------------------------------------------------


def _block_args(rng, b, t, d, h):
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32) * 0.5)
    params = dict(wq=mk(d, d), bq=mk(d), wk=mk(d, d), bk=mk(d),
                  wv=mk(d, d), bv=mk(d), bu=mk(h, d // h), bvv=mk(h, d // h),
                  wpos=mk(d, h, d // h), wo=mk(d, d))
    return x, params


def _block_loss(x, p_, mask, h, valid):
    from tpu_asr.ops.pallas_attention import fused_relpos_attention_block
    out = fused_relpos_attention_block(
        x, p_["wq"], p_["bq"], p_["wk"], p_["bk"], p_["wv"], p_["bv"],
        p_["bu"], p_["bvv"], p_["wpos"], p_["wo"], mask, n_heads=h,
        dropout_rate=0.2, dropout_seed=jnp.asarray([5], jnp.int32),
        interpret=True)
    return jnp.sum(jnp.where(valid, out, 0.0) * out), out


def test_block_attention_batch_sharded_matches_replicated():
    b, t, d, h = 8, 64, 32, 4
    rng = np.random.default_rng(7)
    x, p_ = _block_args(rng, b, t, d, h)
    lengths = np.asarray([t, t - 3, t - 9, 5, t, t - 1, 17, t - 30])
    mask = jnp.arange(t)[None, :] < jnp.asarray(lengths)[:, None]
    valid = mask[..., None]

    grad_fn = jax.value_and_grad(
        lambda x, p: _block_loss(x, p, mask, h, valid), argnums=(0, 1),
        has_aux=True)
    (l_ref, out_ref), g_ref = jax.jit(grad_fn)(x, p_)

    mesh = _mesh()
    bsh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    with jax.set_mesh(mesh):
        (l_sh, out_sh), g_sh = jax.jit(grad_fn)(
            jax.device_put(x, bsh),
            jax.tree.map(lambda z: jax.device_put(z, repl), p_))

    np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_sh), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-6)
    for a, b_ in zip(jax.tree.leaves(g_sh), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-5)
    assert out_sh.sharding.spec[0] == "data"


def test_block_attention_dp_x_tp_head_contracted_matches_replicated():
    """dp x tp: x batch-sharded, all attention weights head-sharded (the
    TP_RULES layout: head-major output columns of linear_q/k/v, head-major
    input rows of linear_out), output (B, T, D) assembled by in-lowering
    psum. Dropout streams are keyed per (row, head) so bits match the
    replicated run."""
    b, t, d, h = 4, 64, 32, 4
    rng = np.random.default_rng(8)
    x, p_ = _block_args(rng, b, t, d, h)
    lengths = np.asarray([t, t - 5, 11, t - 1])
    mask = jnp.arange(t)[None, :] < jnp.asarray(lengths)[:, None]
    valid = mask[..., None]

    grad_fn = jax.value_and_grad(
        lambda x, p: _block_loss(x, p, mask, h, valid), argnums=(0, 1),
        has_aux=True)
    (l_ref, out_ref), g_ref = jax.jit(grad_fn)(x, p_)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                ("data", "model"))
    bsh = NamedSharding(mesh, P("data"))
    # the TP_RULES shardings for the full-kernel params (sharding.py):
    # q/k/v kernels split head-major OUTPUT columns, linear_out splits
    # head-major INPUT rows, per-head tensors split their head dim
    psh = dict(wq=P(None, "model"), bq=P("model"), wk=P(None, "model"),
               bk=P("model"), wv=P(None, "model"), bv=P("model"),
               bu=P("model", None), bvv=P("model", None),
               wpos=P(None, "model", None), wo=P("model", None))
    p_sh = {k_: jax.device_put(v_, NamedSharding(mesh, psh[k_]))
            for k_, v_ in p_.items()}
    with jax.set_mesh(mesh):
        (l_sh, out_sh), g_sh = jax.jit(grad_fn)(jax.device_put(x, bsh), p_sh)

    np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_sh), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)
    for a, b_ in zip(jax.tree.leaves(g_sh), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-5)
    assert out_sh.sharding.spec[0] == "data"


def test_ffn_batch_sharded_matches_replicated():
    """Fused FFN sublayer under the 8-device data mesh: fwd + custom-VJP
    grads match the replicated run; in-kernel dropout bits are invariant to
    sharding (per-row seed operand)."""
    from tpu_asr.ops.pallas_ffn import fused_ffn_sublayer

    b, t, d, f = 8, 40, 32, 128
    rng = np.random.default_rng(9)
    mk = lambda *s_: jnp.asarray(rng.normal(size=s_).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    args = (1.0 + mk(d), mk(d), mk(d, f), mk(f), mk(f, d), mk(d))
    seed = jnp.asarray([5], jnp.int32)

    def loss(x, s, sb, w1, b1, w2, b2):
        out = fused_ffn_sublayer(x, s, sb, w1, b1, w2, b2, dropout_rate=0.2,
                                 dropout_seed=seed, interpret=True)
        return jnp.sum(jnp.square(out)), out

    grad_fn = jax.value_and_grad(loss, argnums=(0, 3, 5), has_aux=True)
    (l_ref, out_ref), g_ref = jax.jit(grad_fn)(x, *args)

    mesh = _mesh()
    bsh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    sh_args = tuple(jax.device_put(a, repl) for a in args)
    with jax.set_mesh(mesh):
        (l_sh, out_sh), g_sh = jax.jit(grad_fn)(jax.device_put(x, bsh),
                                                *sh_args)

    np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_sh), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-6)
    for a, b_ in zip(g_sh, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-5)
    assert out_sh.sharding.spec[0] == "data"


def test_subsampling_batch_sharded_matches_replicated():
    """Fused ConvSubsampling kernel under the 8-device data mesh: the fwd
    matches the replicated run, and the custom-VJP grads match the XLA
    reference's grads computed UNDER THE SAME MESH (XLA:CPU's sharded and
    unsharded conv emitters round bf16 ReLU thresholds differently, so the
    reference itself is not shard-invariant in its gradients — the kernel's
    contract is exact vjp-equivalence with the reference, per mode)."""
    from tpu_asr.ops.pallas_subsampling import (fused_subsampling,
                                                subsampling_reference)

    b, t0, c, d = 8, 93, 16, 16
    rng = np.random.default_rng(11)
    mk = lambda s, sc: jnp.asarray(rng.normal(size=s).astype(np.float32) * sc)
    x = jnp.asarray(rng.normal(size=(b, t0, 80)).astype(np.float32) * 0.5)
    args = (mk((3, 3, 1, c), 0.3), mk((c,), 0.1), mk((3, 3, c, c), 0.08),
            mk((c,), 0.1), mk((20 * c, d), 0.05))

    def mk_loss(fwd):
        def loss(x, w1, b1, w2, b2, wfc):
            out = fwd(x, w1, b1, w2, b2, wfc)
            return jnp.sum(jnp.square(out.astype(jnp.float32))), out
        return jax.value_and_grad(loss, argnums=(0, 2, 4), has_aux=True)

    kern = lambda *a: fused_subsampling(*a, interpret=True)
    grad_k = mk_loss(kern)
    grad_r = mk_loss(subsampling_reference)

    (l_ref, out_ref), _ = jax.jit(grad_k)(x, *args)

    mesh = _mesh()
    bsh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    sh_args = tuple(jax.device_put(a, repl) for a in args)
    with jax.set_mesh(mesh):
        (l_sh, out_sh), g_sh = jax.jit(grad_k)(jax.device_put(x, bsh),
                                               *sh_args)
        (_, _), g_rsh = jax.jit(grad_r)(jax.device_put(x, bsh), *sh_args)

    # fwd is shard-invariant (the kernel computes per-row)
    np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_sh, np.float32),
                               np.asarray(out_ref, np.float32),
                               rtol=1e-4, atol=1e-4)
    # grads track the reference's grads under the same mesh (the kernel's
    # cotangent comes from its own bf16 forward, so bit-equality is not
    # expected — only bf16-level closeness)
    for a, b_ in zip(g_sh, g_rsh):
        aa, bb = np.asarray(a, np.float32), np.asarray(b_, np.float32)
        np.testing.assert_allclose(aa, bb, rtol=0.05,
                                   atol=0.02 * max(1e-3, np.abs(bb).max()))
    assert out_sh.sharding.spec[0] == "data"
