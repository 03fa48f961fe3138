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
