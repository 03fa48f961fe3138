"""Fused rel-pos attention kernel parity (interpret mode on CPU) against the
XLA attention math — including non-lane-aligned T/dk (padding paths), masks,
and local attention windows.

The kernel's position scores use the rotation factorization of the relative
sinusoid table (ops/pallas_attention module docstring): tests draw a random
linear_pos weight W, hand the KERNEL the weight, and hand the XLA reference
the projected table p = PE @ W — parity then proves the factorization against
the rel_shift construction end to end."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_asr.models.conformer import rel_positional_encoding, rel_shift
from tpu_asr.ops.pallas_attention import fused_relpos_attention


def _pos_pair(rng, t, h, dk):
    """Random linear_pos weight (D=h*dk) and its projected table p."""
    d = h * dk
    w = jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) * 0.3)
    pe = rel_positional_encoding(t, d)                       # (2t-1, d)
    p = (pe @ w).reshape(2 * t - 1, h, dk)
    return w.reshape(d, h, dk), p


def _xla_reference(q_u, q_v, k, v, p, mask, ctx=(-1, -1)):
    """The exact XLA attention math from RelPositionMultiHeadAttention."""
    b, h, t, dk = q_u.shape
    ac = jnp.einsum("bhtd,bhsd->bhts", q_u, k)
    bd = jnp.einsum("bhtd,phd->bhtp", q_v, p)
    bd = rel_shift(bd)
    scores = (ac + bd) / math.sqrt(dk)
    key_bias = jnp.where(mask, 0.0, -1e30)[:, None, None, :]
    scores = scores + key_bias
    left, right = ctx
    if left >= 0 or right >= 0:
        rel = jnp.arange(t)[None, :] - jnp.arange(t)[:, None]
        ok = jnp.ones((t, t), bool)
        if left >= 0:
            ok &= rel >= -left
        if right >= 0:
            ok &= rel <= right
        scores = jnp.where(ok[None, None], scores, -1e30)
    attn = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhts,bhsd->bhtd", attn, v)


@pytest.mark.parametrize("t,dk", [(128, 128), (100, 44), (130, 64)])
def test_fused_attention_matches_xla(t, dk):
    b, h = 2, 4
    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.5)
    q_u, q_v, k, v = (mk(b, h, t, dk) for _ in range(4))
    w, p = _pos_pair(rng, t, h, dk)
    lengths = np.asarray([t, max(1, t - 7)])
    mask = jnp.arange(t)[None, :] < jnp.asarray(lengths)[:, None]

    got = fused_relpos_attention(q_u, q_v, k, v, w, mask, interpret=True)
    want = _xla_reference(q_u, q_v, k, v, p, mask)
    # kernel uses bf16 MXU operands with fp32 accumulation (same as the XLA
    # encoder path); tolerance reflects bf16 operand rounding
    for i, ln in enumerate(lengths):
        np.testing.assert_allclose(np.asarray(got)[i, :, :ln],
                                   np.asarray(want)[i, :, :ln],
                                   rtol=5e-3, atol=4e-3)


def test_fused_attention_local_context():
    b, h, t, dk = 1, 2, 64, 32
    rng = np.random.default_rng(1)
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.5)
    q_u, q_v, k, v = (mk(b, h, t, dk) for _ in range(4))
    w, p = _pos_pair(rng, t, h, dk)
    mask = jnp.ones((b, t), bool)
    got = fused_relpos_attention(q_u, q_v, k, v, w, mask,
                                 att_context_size=(3, 3), interpret=True)
    want = _xla_reference(q_u, q_v, k, v, p, mask, ctx=(3, 3))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-3, atol=4e-3)


def test_fused_attention_backward_matches_xla():
    """The fused Pallas backward's grads (dq_u, dq_v, dk, dv, and d(linear_pos
    kernel) through the rotation projection) match jax.grad through the XLA
    reference math."""
    b, h, t, dk = 2, 2, 100, 44          # non-aligned sizes exercise padding
    rng = np.random.default_rng(2)
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.5)
    q_u, q_v, k, v = (mk(b, h, t, dk) for _ in range(4))
    w, _ = _pos_pair(rng, t, h, dk)
    d = h * dk
    pe = rel_positional_encoding(t, d)
    lengths = np.asarray([t, t - 13])
    mask = jnp.arange(t)[None, :] < jnp.asarray(lengths)[:, None]
    cot = mk(b, h, t, dk)                # random cotangent via weighted sum
    valid = mask[:, None, :, None]

    def loss_pallas(q_u, q_v, k, v, w):
        out = fused_relpos_attention(q_u, q_v, k, v, w, mask, interpret=True)
        return jnp.sum(jnp.where(valid, out, 0.0) * cot)

    def loss_xla(q_u, q_v, k, v, w):
        p = (pe @ w.reshape(d, d)).reshape(2 * t - 1, h, dk)
        out = _xla_reference(q_u, q_v, k, v, p, mask)
        return jnp.sum(jnp.where(valid, out, 0.0) * cot)

    got = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(q_u, q_v, k, v, w)
    want = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(q_u, q_v, k, v, w)
    names = ["dq_u", "dq_v", "dk", "dv", "dw_pos"]
    for name, g_got, g_want in zip(names, got, want):
        scale = max(1e-3, float(jnp.max(jnp.abs(g_want))))
        np.testing.assert_allclose(np.asarray(g_got) / scale,
                                   np.asarray(g_want) / scale,
                                   atol=2e-2, err_msg=name)


def test_fused_attention_dropout_deterministic_and_scaled():
    """In-kernel dropout: same seed -> identical output; different seed ->
    different; kept entries scale by 1/(1-rate)."""
    b, h, t, dk = 1, 2, 64, 32
    rng = np.random.default_rng(3)
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.5)
    q_u, q_v, k, v = (mk(b, h, t, dk) for _ in range(4))
    w, _ = _pos_pair(rng, t, h, dk)
    mask = jnp.ones((b, t), bool)
    seed = jnp.asarray([7], jnp.int32)

    a = fused_relpos_attention(q_u, q_v, k, v, w, mask, dropout_rate=0.3,
                               dropout_seed=seed, interpret=True)
    a2 = fused_relpos_attention(q_u, q_v, k, v, w, mask, dropout_rate=0.3,
                                dropout_seed=seed, interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(a2))
    a3 = fused_relpos_attention(q_u, q_v, k, v, w, mask, dropout_rate=0.3,
                                dropout_seed=seed + 1, interpret=True)
    assert not np.allclose(np.asarray(a), np.asarray(a3))
    # dropped mass is re-scaled: outputs stay the same order of magnitude
    base = fused_relpos_attention(q_u, q_v, k, v, w, mask, interpret=True)
    ratio = float(jnp.mean(jnp.abs(a)) / jnp.mean(jnp.abs(base)))
    assert 0.5 < ratio < 2.0


def _host_hash_keep(shape, seed, rate):
    """The interpret-mode murmur3 keep-mask, recomputed on the host.
    uint32 wraparound is the hash's intent — compute via masked uint64."""
    idx = np.arange(np.prod(shape), dtype=np.uint64).reshape(shape)
    x = ((idx * 2654435761 + (seed * 0x9E3779B9) % (1 << 32))
         & 0xFFFFFFFF).astype(np.uint32)
    x ^= x >> np.uint32(16)
    x = x * np.uint32(0x85EBCA6B)
    x ^= x >> np.uint32(13)
    x = x * np.uint32(0xC2B2AE35)
    x ^= x >> np.uint32(16)
    return x >= np.uint32(min(int(rate * 4294967296.0), 4294967295))


def test_fused_attention_dropout_grads_consistent():
    """Backward regenerates the forward's dropout mask: custom-VJP grads match
    jax.grad through an XLA reference using the SAME (host-recomputed) mask."""
    b, h, t, dk = 1, 1, 32, 16
    rate = 0.25
    rng = np.random.default_rng(4)
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.5)
    q_u, q_v, k, v = (mk(b, h, t, dk) for _ in range(4))
    w, p = _pos_pair(rng, t, h, dk)
    mask = jnp.ones((b, t), bool)
    seed = jnp.asarray([11], jnp.int32)
    cot = mk(b, h, t, dk)

    # the kernel pads t to the 128-lane tile; the mask indexes the PADDED grid
    tp = 128
    keep = _host_hash_keep((1, tp, tp), 11, rate)[None, :, :t, :t]
    keep = jnp.asarray(keep)

    def loss_pallas(q_u, q_v, k, v):
        out = fused_relpos_attention(q_u, q_v, k, v, w, mask,
                                     dropout_rate=rate, dropout_seed=seed,
                                     interpret=True)
        return jnp.sum(out * cot)

    def loss_ref(q_u, q_v, k, v):
        ac = jnp.einsum("bhtd,bhsd->bhts", q_u, k)
        bd = rel_shift(jnp.einsum("bhtd,phd->bhtp", q_v, p))
        attn = jax.nn.softmax((ac + bd) / math.sqrt(dk), axis=-1)
        attn = jnp.where(keep, attn / (1.0 - rate), 0.0)
        return jnp.sum(jnp.einsum("bhts,bhsd->bhtd", attn, v) * cot)

    # forward parity under dropout first (absolute tolerance: the cot-weighted
    # sum nets to ~0.04 by cancellation, so bf16 operand rounding dominates
    # any relative measure)
    np.testing.assert_allclose(float(loss_pallas(q_u, q_v, k, v)),
                               float(loss_ref(q_u, q_v, k, v)),
                               rtol=0, atol=5e-3)
    got = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(q_u, q_v, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q_u, q_v, k, v)
    for name, g_got, g_want in zip(["dq_u", "dq_v", "dk", "dv"], got, want):
        scale = max(1e-3, float(jnp.max(jnp.abs(g_want))))
        np.testing.assert_allclose(np.asarray(g_got) / scale,
                                   np.asarray(g_want) / scale,
                                   atol=2e-2, err_msg=name)


def test_rotation_factorization_exact():
    """The trig identity behind the kernel: bd via rotate(qW) @ [cos|sin]^T
    equals the einsum + rel_shift construction to fp32 rounding."""
    from tpu_asr.ops.pallas_attention import position_tables, rotate_pos_query

    t, h, dk = 37, 2, 44
    d = h * dk
    rng = np.random.default_rng(5)
    q_v = jnp.asarray(rng.normal(size=(1, h, t, dk)).astype(np.float32))
    w, p = _pos_pair(rng, t, h, dk)

    bd_ref = rel_shift(jnp.einsum("bhtd,phd->bhtp", q_v, p))

    sin_t, cos_t, kpos = position_tables(t, d)
    qw = jnp.einsum("bhtd,Dhd->bhtD", q_v, w)
    q_r = rotate_pos_query(qw, sin_t, cos_t)
    bd_new = jnp.einsum("bhtD,sD->bhts", q_r, kpos)
    np.testing.assert_allclose(np.asarray(bd_new), np.asarray(bd_ref),
                               rtol=1e-4, atol=1e-4)


def test_encoder_pallas_backend_matches_xla_interpret(monkeypatch):
    """End-to-end: an encoder forward with attention_backend='pallas'
    (kernel in interpret mode) must match the XLA backend."""
    import tpu_asr.ops.pallas_attention as pa
    from tpu_asr.config import EncoderConfig
    from tpu_asr.models.conformer import ConformerEncoder

    orig = pa.fused_relpos_attention
    monkeypatch.setattr(
        pa, "fused_relpos_attention",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}))

    def make(backend):
        return ConformerEncoder(EncoderConfig(
            feat_in=24, n_layers=2, d_model=32, n_heads=4,
            conv_kernel_size=7, conv_norm_type="layer_norm",
            dropout=0.0, dropout_pre_encoder=0.0, dropout_att=0.0,
            attention_backend=backend))

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(2, 24, 60)), jnp.float32)
    lengths = jnp.asarray([60, 41], jnp.int32)
    enc_x = make("xla")
    variables = enc_x.init(jax.random.PRNGKey(0), feats, lengths)
    out_x, len_x, _ = enc_x.apply(variables, feats, lengths)
    enc_p = make("pallas")
    out_p, len_p, _ = enc_p.apply(variables, feats, lengths)
    np.testing.assert_array_equal(np.asarray(len_x), np.asarray(len_p))
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=1e-2, atol=5e-3)
