"""Fused FFN-sublayer kernel parity (interpret mode on CPU) vs the XLA
module math: out = x + 0.5 * (silu(LN(x) @ W1 + b1) @ W2 + b2)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_asr.ops.pallas_ffn import fused_ffn_sublayer


def _ref(x, s, sb, w1, b1, w2, b2, bf16_stages=False):
    """bf16_stages mirrors the kernel's precision schedule (bf16 matmul
    operands, fp32 accumulation/LN) so parity isolates the algorithm."""
    r16 = ((lambda z: z.astype(jnp.bfloat16).astype(jnp.float32))
           if bf16_stages else (lambda z: z))
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean(xf * xf, -1, keepdims=True) - mu * mu
    y = (xf - mu) * jax.lax.rsqrt(var + 1e-6) * s + sb
    h = r16(y) @ r16(w1) + b1
    h = h * jax.nn.sigmoid(h)
    return xf + 0.5 * (r16(h) @ r16(w2) + b2)


def test_fused_ffn_matches_reference():
    rng = np.random.default_rng(0)
    b, t, d, f = 4, 100, 176, 704
    mk = lambda *s_: jnp.asarray(rng.normal(size=s_).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    s, sb = 1.0 + mk(d), mk(d)
    w1, b1, w2, b2 = mk(d, f), mk(f), mk(f, d), mk(d)
    got = fused_ffn_sublayer(x, s, sb, w1, b1, w2, b2, interpret=True)
    want = _ref(x, s, sb, w1, b1, w2, b2, bf16_stages=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-3, atol=5e-3)
    assert got.dtype == x.dtype


def test_fused_ffn_bf16_and_odd_t():
    rng = np.random.default_rng(1)
    b, t, d, f = 2, 37, 88, 352             # odd T exercises sublane padding
    mk = lambda *s_: jnp.asarray(rng.normal(size=s_).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    s, sb = 1.0 + mk(d), mk(d)
    w1, b1, w2, b2 = mk(d, f), mk(f), mk(f, d), mk(d)
    got = fused_ffn_sublayer(x, s, sb, w1, b1, w2, b2, interpret=True)
    want = _ref(x, s, sb, w1, b1, w2, b2)
    assert got.shape == (b, t, d) and got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=2e-2, atol=2e-2)


def test_encoder_ffn_pallas_backend_matches_xla(monkeypatch):
    import tpu_asr.ops.pallas_ffn as pf
    from tpu_asr.config import EncoderConfig
    from tpu_asr.models.conformer import ConformerEncoder

    orig = pf.fused_ffn_sublayer
    monkeypatch.setattr(
        pf, "fused_ffn_sublayer",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}))

    def make(backend):
        return ConformerEncoder(EncoderConfig(
            feat_in=24, n_layers=2, d_model=32, n_heads=4,
            conv_kernel_size=7, conv_norm_type="layer_norm",
            dropout=0.0, dropout_pre_encoder=0.0, dropout_att=0.0,
            attention_backend="xla", ffn_backend=backend))

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(2, 24, 60)), jnp.float32)
    lengths = jnp.asarray([60, 41], jnp.int32)
    enc_x = make("xla")
    variables = enc_x.init(jax.random.PRNGKey(0), feats, lengths)
    out_x, len_x, _ = enc_x.apply(variables, feats, lengths)
    enc_p = make("pallas")
    out_p, len_p, _ = enc_p.apply(variables, feats, lengths)
    np.testing.assert_array_equal(np.asarray(len_x), np.asarray(len_p))
    # the kernel's LN statistics run in fp32 (the XLA path computes them in
    # the compute dtype); tolerance covers that plus bf16 matmul operands
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=1e-2, atol=5e-3)


def test_fused_ffn_backward_matches_xla():
    rng = np.random.default_rng(2)
    b, t, d, f = 2, 48, 64, 256
    mk = lambda *s_: jnp.asarray(rng.normal(size=s_).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    p_ = dict(s=1.0 + mk(d), sb=mk(d), w1=mk(d, f), b1=mk(f),
              w2=mk(f, d), b2=mk(d))
    cot = mk(b, t, d)

    def loss_kernel(x, p_):
        out = fused_ffn_sublayer(x, p_["s"], p_["sb"], p_["w1"], p_["b1"],
                                 p_["w2"], p_["b2"], interpret=True)
        return jnp.sum(out * cot)

    def loss_ref(x, p_):
        out = _ref(x, p_["s"], p_["sb"], p_["w1"], p_["b1"], p_["w2"],
                   p_["b2"])
        return jnp.sum(out * cot)

    gx_k, gp_k = jax.grad(loss_kernel, argnums=(0, 1))(x, p_)
    gx_r, gp_r = jax.grad(loss_ref, argnums=(0, 1))(x, p_)

    def check(a, b_, name):
        scale = max(1e-3, float(jnp.max(jnp.abs(b_))))
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b_) / scale, atol=2e-2,
                                   err_msg=f"grad mismatch: {name}")
    check(gx_k, gx_r, "x")
    for key in gp_k:
        check(gp_k[key], gp_r[key], key)


def test_fused_ffn_dropout_deterministic_and_grads():
    rng = np.random.default_rng(3)
    b, t, d, f = 2, 32, 32, 128
    mk = lambda *s_: jnp.asarray(rng.normal(size=s_).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    args = (1.0 + mk(d), mk(d), mk(d, f), mk(f), mk(f, d), mk(d))
    seed = jnp.asarray([17], jnp.int32)

    run = lambda sd: fused_ffn_sublayer(x, *args, dropout_rate=0.3,
                                        dropout_seed=sd, interpret=True)
    a1, a2, a3 = run(seed), run(seed), run(seed + 1)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert not np.allclose(np.asarray(a1), np.asarray(a3))
    # kept mass rescales: same order of magnitude as the no-dropout output
    base = fused_ffn_sublayer(x, *args, interpret=True)
    ratio = float(jnp.mean(jnp.abs(a1 - x)) / jnp.mean(jnp.abs(base - x)))
    assert 0.4 < ratio < 2.5

    # backward regenerates identical masks: grads are deterministic and the
    # residual component of dx is exact (cotangent passes straight through)
    def loss(x):
        return jnp.sum(jnp.square(run(seed)))
    g1 = jax.grad(lambda x_: jnp.sum(jnp.square(
        fused_ffn_sublayer(x_, *args, dropout_rate=0.3, dropout_seed=seed,
                           interpret=True))))(x)
    g2 = jax.grad(lambda x_: jnp.sum(jnp.square(
        fused_ffn_sublayer(x_, *args, dropout_rate=0.3, dropout_seed=seed,
                           interpret=True))))(x)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    assert np.all(np.isfinite(np.asarray(g1)))


def test_encoder_ffn_pallas_training_grads(monkeypatch):
    """Training path through the fused FFN: dropout active, grads flow
    through the custom VJP, deterministic per rng."""
    import tpu_asr.ops.pallas_ffn as pf
    from tpu_asr.config import EncoderConfig
    from tpu_asr.models.conformer import ConformerEncoder

    orig = pf.fused_ffn_sublayer
    monkeypatch.setattr(
        pf, "fused_ffn_sublayer",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}))

    enc = ConformerEncoder(EncoderConfig(
        feat_in=24, n_layers=2, d_model=32, n_heads=4, conv_kernel_size=7,
        conv_norm_type="layer_norm", dropout=0.2, dropout_pre_encoder=0.0,
        dropout_att=0.0, attention_backend="xla", ffn_backend="pallas"))
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(2, 24, 60)), jnp.float32)
    lengths = jnp.asarray([60, 41], jnp.int32)
    variables = enc.init(jax.random.PRNGKey(0), feats, lengths)

    def loss(params, key):
        out, _, _ = enc.apply({"params": params}, feats, lengths, train=True,
                              rngs={"dropout": key, "layerdrop": key})
        return jnp.sum(jnp.square(out))

    key = jax.random.PRNGKey(3)
    g1 = jax.grad(loss)(variables["params"], key)
    g2 = jax.grad(loss)(variables["params"], key)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert all(np.all(np.isfinite(np.asarray(l)))
               for l in jax.tree.leaves(g1))
    # FFN weights actually receive gradient
    gl = g1["layers"]["feed_forward1"]["linear1"]["kernel"]
    assert float(jnp.max(jnp.abs(gl))) > 0


def test_ffn_vmem_gate_large_dims():
    """Regression (conformer-LARGE training cliff): at d512/d_ff2048 the
    flash-bwd's per-row weight-grad partials exceed scoped VMEM — the fits
    predicate must reject it (auto falls back to XLA) while the small model
    stays on the kernel; explicit kernel use raises an actionable error."""
    import pytest

    from tpu_asr.ops.pallas_ffn import (_pick_rb, ffn_train_kernel_fits,
                                        fused_ffn_sublayer)

    assert ffn_train_kernel_fits(32, 376, 176, 704)       # flagship student
    assert not ffn_train_kernel_fits(32, 376, 512, 2048)  # conformer-LARGE
    # small-dims row chunking unchanged by the recalibrated budget
    assert _pick_rb(32, 384, 176, 704, words=4, bwd=True) == 2
    # fwd at LARGE still fits (the int8 serving line measured on-chip)
    assert _pick_rb(32, 376, 512, 2048, words=2) == 1

    x = jnp.zeros((32, 376, 512), jnp.float32)
    v = jnp.zeros((512,), jnp.float32)
    w1 = jnp.zeros((512, 2048), jnp.float32)
    b1 = jnp.zeros((2048,), jnp.float32)
    w2 = jnp.zeros((2048, 512), jnp.float32)
    with pytest.raises(ValueError, match="scoped VMEM"):
        jax.eval_shape(
            lambda *a: jax.vjp(
                lambda x: fused_ffn_sublayer(x, v, v, w1, b1, w2, v,
                                             dropout_rate=0.0), a[0])[1](a[0]),
            x)
