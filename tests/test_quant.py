"""int8 serving-PTQ tests (ops/quant.py + the fused int8 FFN kernel +
model-level wiring): quantization error bounds, kernel/XLA-path agreement,
identical param trees, and a training path that is bitwise untouched."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tpu_asr.ops.quant import int8_dense, quantize_weight


def test_quantize_weight_roundtrip_bound():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 48)).astype(np.float32))
    wq, s = quantize_weight(w)
    assert wq.dtype == jnp.int8 and s.shape == (1, 48)
    err = np.abs(np.asarray(wq, np.float32) * np.asarray(s) - np.asarray(w))
    # symmetric rounding: at most half a quantization step per element
    assert (err <= np.asarray(s) / 2 + 1e-7).all()


def test_int8_dense_close_to_fp():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 37, 96)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(96, 64)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(64,)).astype(np.float32) * 0.1)
    got = np.asarray(int8_dense(x, w, b), np.float32)
    want = np.asarray(x @ w + b, np.float32)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.02, rel
    assert got.shape == (4, 37, 64)


def test_int8_dense_scale_invariance_per_token():
    """Per-token dynamic scales: scaling one row of x scales only that
    row's output (up to quantization noise) — a per-tensor scheme would
    crush the small rows."""
    rng = np.random.default_rng(2)
    x = np.ones((2, 2, 32), np.float32)
    x[0, 0] *= 1e3  # a loud token must not destroy the quiet ones
    x = jnp.asarray(x * rng.normal(size=x.shape).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32))
    got = np.asarray(int8_dense(x, w), np.float32)
    want = np.asarray(x @ w, np.float32)
    rel = np.abs(got - want) / (np.abs(want) + 1e-3 * np.abs(want).max())
    assert np.median(rel) < 0.05


def _xla_int8_ref(x, s, sb, w1, b1, w2, b2):
    """The exact math the fused kernel implements, via ops/quant.py on the
    XLA path: fp32 LN -> int8_dense -> SiLU -> int8_dense -> 0.5 residual."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean(xf * xf, -1, keepdims=True) - mu * mu
    y = (xf - mu) * jax.lax.rsqrt(var + 1e-6) * s + sb
    h = jax.nn.silu(int8_dense(y, w1, b1, out_dtype=jnp.float32))
    o = int8_dense(h, w2, b2, out_dtype=jnp.float32)
    return (xf + 0.5 * o).astype(x.dtype)


def test_fused_int8_kernel_matches_xla_path():
    from tpu_asr.ops.pallas_ffn import fused_ffn_sublayer_int8

    rng = np.random.default_rng(3)
    b, t, d, f = 4, 50, 64, 256
    mk = lambda *s_: jnp.asarray(rng.normal(size=s_).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    s, sb = 1.0 + mk(d), mk(d)
    w1, b1, w2, b2 = mk(d, f), mk(f), mk(f, d), mk(d)
    got = fused_ffn_sublayer_int8(x, s, sb, w1, b1, w2, b2, interpret=True)
    want = _xla_int8_ref(x, s, sb, w1, b1, w2, b2)
    # same quantization decisions, fp32 accumulation both sides: near-exact
    # (only reduction/round ordering differs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    assert got.dtype == x.dtype


def test_fused_int8_kernel_odd_t_bf16():
    from tpu_asr.ops.pallas_ffn import fused_ffn_sublayer_int8

    rng = np.random.default_rng(4)
    b, t, d, f = 2, 37, 88, 352
    mk = lambda *s_: jnp.asarray(rng.normal(size=s_).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.normal(size=(b, t, d)), jnp.bfloat16)
    s, sb = 1.0 + mk(d), mk(d)
    w1, b1, w2, b2 = mk(d, f), mk(f), mk(f, d), mk(d)
    got = fused_ffn_sublayer_int8(x, s, sb, w1, b1, w2, b2, interpret=True)
    want = _xla_int8_ref(x, s, sb, w1, b1, w2, b2)
    assert got.shape == (b, t, d) and got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)


def _small_cfgs():
    from tpu_asr.config import DecoderConfig, EncoderConfig, ModelConfig

    enc = EncoderConfig(n_layers=2, d_model=64, n_heads=4,
                        conv_kernel_size=7, conv_norm_type="layer_norm")
    cfg = ModelConfig(spec_augment=None, encoder=enc,
                      decoder=DecoderConfig(feat_in=64, num_classes=24))
    cfg_q = dataclasses.replace(
        cfg, encoder=dataclasses.replace(enc, quantization="int8"))
    return cfg, cfg_q


def test_model_int8_eval_drift_tree_and_training_untouched():
    from tpu_asr.models.ctc_model import CTCModel

    cfg, cfg_q = _small_cfgs()
    m, mq = CTCModel(cfg), CTCModel(cfg_q)
    rng = np.random.default_rng(5)
    sig = jnp.asarray(rng.normal(size=(2, 16000 * 2)).astype(np.float32) * 0.1)
    sl = jnp.asarray([16000 * 2, 16000 + 777], jnp.int32)
    v = m.init({"params": jax.random.PRNGKey(0)}, sig, sl, train=False)
    vq = mq.init({"params": jax.random.PRNGKey(0)}, sig, sl, train=False)
    # identical param trees: the same checkpoint serves both precisions
    ka = [jax.tree_util.keystr(k)
          for k, _ in jax.tree_util.tree_flatten_with_path(v)[0]]
    kb = [jax.tree_util.keystr(k)
          for k, _ in jax.tree_util.tree_flatten_with_path(vq)[0]]
    assert ka == kb

    out = m.apply(v, sig, sl, train=False)
    outq = mq.apply(v, sig, sl, train=False)
    d = np.abs(np.asarray(out.log_probs, np.float32)
               - np.asarray(outq.log_probs, np.float32))
    assert 0 < d.max() < 0.25, d.max()     # int8 engaged, drift bounded

    # the TRAINING path must not see the quantizer at all: bitwise equal
    rngs = {"dropout": jax.random.PRNGKey(1),
            "layerdrop": jax.random.PRNGKey(2),
            "specaug": jax.random.PRNGKey(3)}
    ot = m.apply(v, sig, sl, train=True, rngs=rngs)
    otq = mq.apply(v, sig, sl, train=True, rngs=rngs)
    np.testing.assert_array_equal(np.asarray(ot.log_probs),
                                  np.asarray(otq.log_probs))
