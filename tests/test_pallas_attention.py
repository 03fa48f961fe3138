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

    orig = pa.fused_relpos_attention_block
    monkeypatch.setattr(
        pa, "fused_relpos_attention_block",
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
    # the block kernel runs the q/k/v/out PROJECTIONS in bf16 too (the XLA
    # reference path here is fp32-highest), so tolerance covers one extra
    # bf16 rounding stage beyond the score/value matmuls
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=1e-2, atol=1.2e-2)


# ---------------------------------------------------------------------------
# Block kernel (whole-sublayer fusion): fused_relpos_attention_block
# ---------------------------------------------------------------------------


def _block_params(rng, d, h):
    # weight scale 0.1 keeps attention scores O(1): a SHARP softmax
    # exponentially amplifies bf16 operand rounding (e^{score err}) and
    # would swamp algorithm-parity checking with precision noise
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.1)
    return dict(wq=mk(d, d), bq=mk(d), wk=mk(d, d), bk=mk(d), wv=mk(d, d),
                bv=mk(d), bu=mk(h, d // h), bvv=mk(h, d // h),
                wpos=mk(d, h, d // h), wo=mk(d, d))


def _block_xla_reference(x, p_, mask, h, ctx=(-1, -1), bf16_stages=False):
    """Composed XLA reference: projections + rel-pos attention + out proj.

    bf16_stages=True mirrors the kernel's precision schedule (bf16 operands
    at every matmul, fp32 accumulation): the softmax AMPLIFIES operand
    rounding of the projections, so a full-fp32 reference diverges by far
    more than matmul tolerance — matching the stages isolates ALGORITHM
    parity from precision policy (which the bf16 XLA path shares anyway)."""
    r16 = ((lambda z: z.astype(jnp.bfloat16).astype(jnp.float32))
           if bf16_stages else (lambda z: z))
    b, t, d = x.shape
    dk = d // h
    x_, pp = r16(x), {k_: r16(v_) for k_, v_ in p_.items()}
    q = r16(x_ @ pp["wq"] + p_["bq"]).reshape(b, t, h, dk)
    k = r16(x_ @ pp["wk"] + p_["bk"]).reshape(b, t, h, dk)
    v = r16(x_ @ pp["wv"] + p_["bv"]).reshape(b, t, h, dk)
    q_u = jnp.transpose(q + pp["bu"][None, None], (0, 2, 1, 3))
    q_v = jnp.transpose(q + pp["bvv"][None, None], (0, 2, 1, 3))
    k = jnp.transpose(k, (0, 2, 1, 3))
    v = jnp.transpose(v, (0, 2, 1, 3))
    pe = rel_positional_encoding(t, d)
    ptab = (r16(pe) @ pp["wpos"].reshape(d, d)).reshape(2 * t - 1, h, dk)
    ctx_out = _xla_reference(r16(q_u), r16(q_v), k, v, r16(ptab), mask, ctx)
    out = jnp.transpose(r16(ctx_out), (0, 2, 1, 3)).reshape(b, t, d)
    return out @ pp["wo"]


def _run_block(x, p_, mask, h, ctx=(-1, -1), rate=0.0, seed=None,
               score_bf16=None):
    from tpu_asr.ops.pallas_attention import fused_relpos_attention_block
    return fused_relpos_attention_block(
        x, p_["wq"], p_["bq"], p_["wk"], p_["bk"], p_["wv"], p_["bv"],
        p_["bu"], p_["bvv"], p_["wpos"], p_["wo"], mask, n_heads=h,
        att_context_size=ctx, dropout_rate=rate, dropout_seed=seed,
        interpret=True, score_bf16=score_bf16)


@pytest.mark.parametrize("t,d,h", [(100, 176, 4), (130, 88, 2)])
def test_block_attention_matches_composed_xla(t, d, h):
    rng = np.random.default_rng(3)
    b = 2
    x = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32) * 0.5)
    p_ = _block_params(rng, d, h)
    lengths = np.asarray([t, max(1, t - 9)])
    mask = jnp.asarray(np.arange(t)[None, :] < lengths[:, None])
    want = _block_xla_reference(x, p_, mask, h, bf16_stages=True)
    got = _run_block(x, p_, mask, h)
    # compare VALID query rows only (padded-query rows are garbage by contract)
    m = np.asarray(mask)[..., None]
    np.testing.assert_allclose(np.asarray(got) * m, np.asarray(want) * m,
                               rtol=1e-2, atol=3e-3)


def test_block_attention_local_context_matches():
    rng = np.random.default_rng(4)
    b, t, d, h = 2, 96, 64, 4
    x = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32) * 0.5)
    p_ = _block_params(rng, d, h)
    mask = jnp.asarray(np.arange(t)[None, :] < np.asarray([t, t - 5])[:, None])
    want = _block_xla_reference(x, p_, mask, h, ctx=(7, 3), bf16_stages=True)
    got = _run_block(x, p_, mask, h, ctx=(7, 3))
    m = np.asarray(mask)[..., None]
    np.testing.assert_allclose(np.asarray(got) * m, np.asarray(want) * m,
                               rtol=1e-2, atol=3e-3)


def test_block_attention_backward_matches_xla():
    rng = np.random.default_rng(5)
    b, t, d, h = 2, 64, 32, 4
    x = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32) * 0.5)
    p_ = _block_params(rng, d, h)
    lengths = np.asarray([t, t - 6])
    mask = jnp.asarray(np.arange(t)[None, :] < lengths[:, None])
    mf = jnp.asarray(np.asarray(mask), jnp.float32)[..., None]

    def loss_kernel(x, p_):
        return jnp.sum(jnp.square(_run_block(x, p_, mask, h) * mf))

    def loss_ref(x, p_):
        return jnp.sum(jnp.square(_block_xla_reference(x, p_, mask, h) * mf))

    gx_k, gp_k = jax.grad(loss_kernel, argnums=(0, 1))(x, p_)
    gx_r, gp_r = jax.grad(loss_ref, argnums=(0, 1))(x, p_)
    # normalize by grad scale (the old-kernel backward test's convention):
    # bias grads are cancellation-free sums of bf16-rounded attention
    # weights, so ~0.4% systematic operand rounding survives accumulation
    def check(g_got, g_want, name):
        scale = max(1e-3, float(jnp.max(jnp.abs(g_want))))
        np.testing.assert_allclose(np.asarray(g_got) / scale,
                                   np.asarray(g_want) / scale,
                                   atol=2e-2, err_msg=f"grad mismatch for {name}")
    check(gx_k, gx_r, "x")
    # the key-projection bias is softmax-invariant (it shifts every score in
    # a query row by the same q_u·bk constant), so its TRUE gradient is zero
    # — both implementations produce only rounding noise there. Assert the
    # invariance instead of comparing noise against noise.
    gscale = float(jnp.max(jnp.abs(gx_r)))
    assert float(jnp.max(jnp.abs(gp_k["bk"]))) < 0.05 * gscale
    assert float(jnp.max(jnp.abs(gp_r["bk"]))) < 0.05 * gscale
    for key in gp_k:
        if key != "bk":
            check(gp_k[key], gp_r[key], key)


def test_block_attention_score_bf16_parity():
    """bf16 score tiles (flag-gated, VERDICT r4 next #2): fwd outputs and
    all grads must stay within the bf16 softmax-storage rounding bound
    (~2^-8 relative on attention weights) of the fp32-tile kernel."""
    rng = np.random.default_rng(11)
    b, t, d, h = 2, 100, 64, 4
    x = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32) * 0.5)
    p_ = _block_params(rng, d, h)
    lengths = np.asarray([t, t - 7])
    mask = jnp.asarray(np.arange(t)[None, :] < lengths[:, None])
    mf = jnp.asarray(np.asarray(mask), jnp.float32)[..., None]

    want = _run_block(x, p_, mask, h, score_bf16=False)
    got = _run_block(x, p_, mask, h, score_bf16=True)
    m = np.asarray(mask)[..., None]
    np.testing.assert_allclose(np.asarray(got) * m, np.asarray(want) * m,
                               rtol=2e-2, atol=5e-3)

    def loss(x, p_, flag):
        return jnp.sum(jnp.square(
            _run_block(x, p_, mask, h, score_bf16=flag) * mf))

    gx_f, gp_f = jax.grad(loss, argnums=(0, 1))(x, p_, False)
    gx_q, gp_q = jax.grad(loss, argnums=(0, 1))(x, p_, True)

    def check(g_got, g_want, name):
        scale = max(1e-3, float(jnp.max(jnp.abs(g_want))))
        np.testing.assert_allclose(np.asarray(g_got) / scale,
                                   np.asarray(g_want) / scale,
                                   atol=3e-2, err_msg=f"grad {name}")
    check(gx_q, gx_f, "x")
    # bk's TRUE gradient is zero (it shifts every score in a query row by
    # the same constant — softmax-invariant), so both kernels emit only
    # rounding noise there; bound it against the global grad scale instead
    gscale = float(jnp.max(jnp.abs(gx_f)))
    assert float(jnp.max(jnp.abs(gp_q["bk"]))) < 0.05 * gscale
    for key in gp_f:
        if key != "bk":
            check(gp_q[key], gp_f[key], key)


def test_block_attention_dropout_deterministic():
    rng = np.random.default_rng(6)
    b, t, d, h = 2, 64, 32, 4
    x = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32) * 0.5)
    p_ = _block_params(rng, d, h)
    mask = jnp.ones((b, t), bool)
    seed = jnp.asarray([123], jnp.int32)
    a1 = _run_block(x, p_, mask, h, rate=0.3, seed=seed)
    a2 = _run_block(x, p_, mask, h, rate=0.3, seed=seed)
    a3 = _run_block(x, p_, mask, h, rate=0.3, seed=seed + 1)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert not np.allclose(np.asarray(a1), np.asarray(a3))


def test_block_attention_packed_segments_match_solo():
    """Packed-segment mask (seg_id operand): each segment inside a packed row
    must reproduce the solo forward of that segment — this pins BOTH the
    in-kernel segment-block mask and the translation invariance of the
    rotation-factored position scores (a segment at offset 60 uses different
    absolute sin/cos table rows, but bd[t,s] depends only on t-s)."""
    from tpu_asr.ops.pallas_attention import fused_relpos_attention_block

    rng = np.random.default_rng(7)
    d, h, t = 64, 4, 128
    len1, len2, off2 = 50, 40, 60          # guard gap 60-50 = 10 frames
    p_ = _block_params(rng, d, h)
    x1 = jnp.asarray(rng.normal(size=(1, len1, d)).astype(np.float32) * 0.5)
    x2 = jnp.asarray(rng.normal(size=(1, len2, d)).astype(np.float32) * 0.5)
    packed = jnp.zeros((1, t, d), jnp.float32)
    packed = packed.at[:, :len1].set(x1).at[:, off2:off2 + len2].set(x2)
    seg = np.zeros((1, t), np.int32)
    seg[0, :len1] = 1
    seg[0, off2:off2 + len2] = 2
    mask = jnp.asarray(seg > 0)

    def run(x, m, seg_id=None):
        return fused_relpos_attention_block(
            x, p_["wq"], p_["bq"], p_["wk"], p_["bk"], p_["wv"], p_["bv"],
            p_["bu"], p_["bvv"], p_["wpos"], p_["wo"], m, n_heads=h,
            seg_id=seg_id, interpret=True)

    got = np.asarray(run(packed, mask, seg_id=jnp.asarray(seg)))
    solo1 = np.asarray(run(x1, jnp.ones((1, len1), bool)))
    solo2 = np.asarray(run(x2, jnp.ones((1, len2), bool)))
    np.testing.assert_allclose(got[0, :len1], solo1[0], rtol=1e-2, atol=3e-3)
    np.testing.assert_allclose(got[0, off2:off2 + len2], solo2[0],
                               rtol=1e-2, atol=3e-3)
    # cross-check: WITHOUT seg_id (plain key mask) segment 1 must see
    # segment 2 and diverge from its solo forward
    plain = np.asarray(run(packed, mask))
    assert not np.allclose(plain[0, :len1], solo1[0], rtol=1e-2, atol=3e-3)


def test_block_attention_packed_segments_grads_match_solo():
    """Packed-segment TRAINING (round 5): the seg path now has a custom VJP.
    Gradients through a packed row must decompose into the solo segments'
    gradients — d(x_i) at segment i's positions equals the solo run's dx,
    and weight grads equal the sum of the solo runs' weight grads."""
    from tpu_asr.ops.pallas_attention import fused_relpos_attention_block

    rng = np.random.default_rng(8)
    d, h, t = 64, 4, 128
    len1, len2, off2 = 50, 40, 60
    p_ = _block_params(rng, d, h)
    x1 = jnp.asarray(rng.normal(size=(1, len1, d)).astype(np.float32) * 0.5)
    x2 = jnp.asarray(rng.normal(size=(1, len2, d)).astype(np.float32) * 0.5)
    seg = np.zeros((1, t), np.int32)
    seg[0, :len1] = 1
    seg[0, off2:off2 + len2] = 2
    mask_p = jnp.asarray(seg > 0)

    def run(x, m, seg_id=None):
        return fused_relpos_attention_block(
            x, p_["wq"], p_["bq"], p_["wk"], p_["bk"], p_["wv"], p_["bv"],
            p_["bu"], p_["bvv"], p_["wpos"], p_["wo"], m, n_heads=h,
            seg_id=seg_id, interpret=True)

    def loss_packed(x1, x2, p):
        nonlocal p_
        p_save, p_ = p_, p
        packed = jnp.zeros((1, t, d), jnp.float32)
        packed = packed.at[:, :len1].set(x1).at[:, off2:off2 + len2].set(x2)
        out = run(packed, mask_p, seg_id=jnp.asarray(seg))
        p_ = p_save
        return jnp.sum(jnp.square(
            jnp.where(mask_p[..., None], out, 0.0)))

    def loss_solo(x1, x2, p):
        nonlocal p_
        p_save, p_ = p_, p
        o1 = run(x1, jnp.ones((1, len1), bool))
        o2 = run(x2, jnp.ones((1, len2), bool))
        p_ = p_save
        return jnp.sum(jnp.square(o1)) + jnp.sum(jnp.square(o2))

    g1p, g2p, gpp = jax.grad(loss_packed, argnums=(0, 1, 2))(x1, x2, p_)
    g1s, g2s, gps = jax.grad(loss_solo, argnums=(0, 1, 2))(x1, x2, p_)

    def check(a, b, name, atol=2e-2):
        scale = max(1e-3, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=atol,
                                   err_msg=name)
    check(g1p, g1s, "dx1")
    check(g2p, g2s, "dx2")
    gscale = max(float(jnp.max(jnp.abs(g1s))), float(jnp.max(jnp.abs(g2s))))
    for key in gpp:
        if key == "bk":        # true grad is zero (softmax-invariant)
            assert float(jnp.max(jnp.abs(gpp[key]))) < 0.05 * gscale
        else:
            check(gpp[key], gps[key], f"d{key}")


def test_block_attention_packed_dropout_deterministic_and_backward():
    """seg + in-kernel dropout (packed TRAINING): same seed -> identical
    output; grads are finite and zero outside valid positions."""
    from tpu_asr.ops.pallas_attention import fused_relpos_attention_block

    rng = np.random.default_rng(9)
    d, h, t = 32, 4, 64
    seg = np.zeros((2, t), np.int32)
    seg[:, :30] = 1
    seg[:, 40:60] = 2
    mask = jnp.asarray(seg > 0)
    p_ = _block_params(rng, d, h)
    x = jnp.asarray(rng.normal(size=(2, t, d)).astype(np.float32) * 0.5)
    x = jnp.where(mask[..., None], x, 0.0)
    seed = jnp.asarray([77], jnp.int32)

    def run(x, s):
        return fused_relpos_attention_block(
            x, p_["wq"], p_["bq"], p_["wk"], p_["bk"], p_["wv"], p_["bv"],
            p_["bu"], p_["bvv"], p_["wpos"], p_["wo"], mask, n_heads=h,
            seg_id=jnp.asarray(seg), dropout_rate=0.3, dropout_seed=s,
            interpret=True)

    a1, a2 = run(x, seed), run(x, seed)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert not np.allclose(np.asarray(a1), np.asarray(run(x, seed + 3)))

    g = jax.grad(lambda x: jnp.sum(jnp.square(
        jnp.where(mask[..., None], run(x, seed), 0.0))))(x)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.max(jnp.abs(jnp.where(mask[..., None], 0.0, g)))) == 0.0


def test_block_bwd_mosaic_lowering_large_dims():
    """Regression: d512/h8/dk64 training (conformer-LARGE) picks hpp < h in
    the bwd kernel's VMEM budget; the bias-grad partials must then still
    satisfy Mosaic's last-two-dims block rule (they are emitted (hpp, 1, dk)
    — a (hpp, dk) block is illegal for hpp=2). Cross-platform AOT lowering
    runs the full Pallas->Mosaic pass without a TPU."""
    import jax

    from tpu_asr.ops.pallas_attention import fused_relpos_attention_block

    b, t, d, h = 2, 512, 512, 8   # t=512 -> bwd VMEM budget picks hpp=2
    dk = d // h
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (b, t, d), jnp.float32)
    wq = jax.random.normal(ks[1], (d, d), jnp.float32) * 0.02
    wk = jax.random.normal(ks[2], (d, d), jnp.float32) * 0.02
    wv = jax.random.normal(ks[3], (d, d), jnp.float32) * 0.02
    wo = jax.random.normal(ks[4], (d, d), jnp.float32) * 0.02
    bu = jax.random.normal(ks[5], (h, dk), jnp.float32) * 0.02
    bv_ = jax.random.normal(ks[6], (h, dk), jnp.float32) * 0.02
    pos = jax.random.normal(ks[7], (d, h, dk), jnp.float32) * 0.02
    zb = jnp.zeros((d,), jnp.float32)
    mask = jnp.ones((b, t), bool)

    def loss(x, wq, wk, wv, wo, bu, bv_, pos):
        out = fused_relpos_attention_block(
            x, wq, zb, wk, zb, wv, zb, bu, bv_, pos, wo, mask, h)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 5)))
    # the Mosaic pass (layout inference, block-shape checks) runs in the
    # cross-platform lowering; only backend codegen escapes it
    g.trace(x, wq, wk, wv, wo, bu, bv_, pos).lower(
        lowering_platforms=("tpu",))
