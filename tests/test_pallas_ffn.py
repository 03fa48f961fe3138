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
